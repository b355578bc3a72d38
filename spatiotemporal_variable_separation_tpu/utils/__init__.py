from spatiotemporal_variable_separation_tpu.utils.helper import (  # noqa: F401
    DotDict,
    load_json,
    load_yaml,
)
