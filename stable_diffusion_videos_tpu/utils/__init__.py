"""Cross-cutting utilities (profiling, parity metrics)."""

from .metrics import compare_frame_dirs, psnr, ssim
from .profiling import StageTimer, trace

__all__ = ["StageTimer", "trace", "compare_frame_dirs", "psnr", "ssim"]
