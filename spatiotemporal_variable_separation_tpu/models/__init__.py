from spatiotemporal_variable_separation_tpu.models.factory import (  # noqa: F401
    build_separable_network,
    get_decoder,
    get_encoder,
    get_integrator,
)
from spatiotemporal_variable_separation_tpu.models.separable import SeparableNetwork  # noqa: F401
