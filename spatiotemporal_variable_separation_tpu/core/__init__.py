from spatiotemporal_variable_separation_tpu.core.activations import activation  # noqa: F401
from spatiotemporal_variable_separation_tpu.core.inits import (  # noqa: F401
    bn_scale_init,
    conv_kernel_init,
    conv_transpose_kernel_init,
    dense_kernel_init,
)
from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig  # noqa: F401
