"""Pure functional primitives: interpolation trajectories and samplers."""

from .interp import slerp, lerp, trajectory, DOT_THRESHOLD
from .schedulers import (Scheduler, SchedulerConfig, get_scheduler,
                         SCHEDULER_NAMES)

__all__ = ["slerp", "lerp", "trajectory", "DOT_THRESHOLD", "Scheduler",
           "SchedulerConfig", "get_scheduler", "SCHEDULER_NAMES"]
