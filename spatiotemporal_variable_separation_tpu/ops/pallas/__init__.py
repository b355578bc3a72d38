from spatiotemporal_variable_separation_tpu.ops.pallas.rollout import (  # noqa: F401
    mlp_resnet_rollout,
    mlp_resnet_rollout_reference,
)
