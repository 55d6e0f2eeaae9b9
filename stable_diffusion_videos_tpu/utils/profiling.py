"""Per-stage timing + frames/sec metrics (the reference has none — SURVEY.md
§5.1).  Machine-readable: ``StageTimer.summary()`` returns a dict suitable
for JSON logging; ``trace()`` optionally wraps a block in a jax.profiler
trace when ``SDV_PROFILE_DIR`` is set."""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from collections import defaultdict

logger = logging.getLogger("sdv_tpu")


class StageTimer:
    """Accumulates wall-clock per named stage (embed/denoise/decode/upsample/
    encode) and derived throughput."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.frames = 0

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def add_frames(self, n: int):
        self.frames += n

    def summary(self) -> dict:
        total = sum(self.totals.values())
        out = {
            "stages_s": {k: round(v, 4) for k, v in self.totals.items()},
            "total_s": round(total, 4),
            "frames": self.frames,
        }
        denoise = self.totals.get("denoise", 0.0)
        if self.frames and denoise > 0:
            out["frames_per_s_denoise"] = round(self.frames / denoise, 3)
        if self.frames and total > 0:
            out["frames_per_s_total"] = round(self.frames / total, 3)
        return out

    def log(self, prefix: str = "perf"):
        logger.info("%s %s", prefix, json.dumps(self.summary()))


@contextlib.contextmanager
def trace(name: str = "sdv"):
    """jax.profiler trace if SDV_PROFILE_DIR is set, else no-op."""
    profile_dir = os.environ.get("SDV_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax
    with jax.profiler.trace(os.path.join(profile_dir, name)):
        yield
