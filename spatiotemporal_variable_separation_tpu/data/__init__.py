from spatiotemporal_variable_separation_tpu.data.loader import Batcher, prefetch_to_device  # noqa: F401
