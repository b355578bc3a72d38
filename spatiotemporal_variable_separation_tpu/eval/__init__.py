from spatiotemporal_variable_separation_tpu.eval.common import Evaluator  # noqa: F401
