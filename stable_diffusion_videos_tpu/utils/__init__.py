"""Cross-cutting utilities (profiling, misc helpers)."""

from .profiling import StageTimer, trace

__all__ = ["StageTimer", "trace"]
