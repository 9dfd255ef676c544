from tpufusion.eval.metrics import (
    input_noise_mse,
    latent_distance,
    mse_per_image,
    rgb_to_gray,
    ssim,
    fused_image_metrics,
)
from tpufusion.eval.partial import (
    benign_fusion,
    partial_adv_fusion,
    partial_latent_variants,
)
from tpufusion.eval.report import ResultsTable
