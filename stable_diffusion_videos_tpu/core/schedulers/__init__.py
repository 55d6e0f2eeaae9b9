"""Scan-compatible diffusion samplers (DDIM, PNDM/PLMS, LMS, Euler,
Euler-Ancestral, DPM-Solver++), matching the reference's sampler suite
(reference ``stable_diffusion_pipeline.py:17-24``), plus UniPC and LCM
beyond it."""

from .base import (Scheduler, SchedulerConfig, get_scheduler,
                   alphas_cumprod_for, betas_for_schedule, spaced_timesteps)
from . import ddim, dpm, euler, lcm, lms, pndm, unipc  # noqa: F401  (register)

SCHEDULER_NAMES = ("ddim", "pndm", "lms", "euler", "euler_ancestral", "dpm",
                   "unipc", "lcm")

__all__ = ["Scheduler", "SchedulerConfig", "get_scheduler", "SCHEDULER_NAMES",
           "alphas_cumprod_for", "betas_for_schedule", "spaced_timesteps"]
