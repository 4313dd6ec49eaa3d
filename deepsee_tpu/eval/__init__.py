from deepsee_tpu.eval.metrics import (
    MetricsAccumulator,
    ms_ssim,
    psnr,
    rmse,
    ssim_matlab,
    to_uint8_values,
)
