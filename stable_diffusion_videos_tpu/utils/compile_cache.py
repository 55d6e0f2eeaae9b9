"""Persistent XLA compilation cache, enabled once per process.

Cold-compiling the fused walk program costs 87-440 s on the TPU tunnel and
model-INIT programs cost minutes on this host's mismatched XLA:CPU AOT
path, so the cache is enabled from BOTH entry surfaces: ``Engine.__init__``
(inference) and ``SDModels`` construction (init/convert paths run before
any engine exists).  Set ``SDV_COMPILE_CACHE=0`` to opt out,
``SDV_COMPILE_CACHE_DIR`` to move it (default
``~/.cache/stable_diffusion_videos_tpu/jax``).  Uses ``jax.config.update``
— env-var config can be frozen by the time we run (the axon sitecustomize
imports jax at interpreter start).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger("sdv_tpu")

_enabled = False


def enable_compile_cache() -> Optional[str]:
    """Idempotently enable the persistent compile cache; returns the cache
    dir, or None when disabled / already user-configured."""
    global _enabled
    if _enabled or os.environ.get("SDV_COMPILE_CACHE") == "0":
        return None
    _enabled = True
    import jax
    try:
        if jax.config.jax_compilation_cache_dir:
            return None  # user already configured a cache — respect it
    except AttributeError:
        return None
    cache_dir = os.environ.get(
        "SDV_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "stable_diffusion_videos_tpu", "jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even fast compiles: the walk program family is many small
        # variants (per batch-bucket/steps/size) and all recur across runs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001 — cache is an optimisation only
        logger.debug("compile cache unavailable: %s", e)
        return None
    logger.info("persistent compile cache at %s", cache_dir)
    return cache_dir
