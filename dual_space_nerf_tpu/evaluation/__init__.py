from .lpips import make_lpips
from .metrics import mse, psnr, ssim, ssim_metric
from .render_image import ImageRenderer, light_state_for_novel_pose

__all__ = [
    "make_lpips",
    "mse",
    "psnr",
    "ssim",
    "ssim_metric",
    "ImageRenderer",
    "light_state_for_novel_pose",
]
