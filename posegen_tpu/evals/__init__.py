from posegen_tpu.evals.image import psnr, ssim, ms_ssim, evaluate_metric  # noqa: F401
from posegen_tpu.evals.pose import (  # noqa: F401
    mpjpe,
    pa_mpjpe,
    procrustes_align,
    pck,
    auc,
    similarity_transform,
)
