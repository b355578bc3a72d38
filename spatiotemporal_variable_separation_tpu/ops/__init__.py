from spatiotemporal_variable_separation_tpu.ops.metrics import mse_per_frame, psnr_from_mse  # noqa: F401
from spatiotemporal_variable_separation_tpu.ops.ssim import ssim, ssim_per_frame  # noqa: F401
