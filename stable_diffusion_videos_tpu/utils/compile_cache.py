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


def _version_tag() -> str:
    """Toolchain-versioned cache namespace: jax + jaxlib + libtpu.

    A libtpu/jaxlib roll moves the cache to a FRESH subdirectory, so stale
    AOT artifacts compiled by a previous toolchain can never be fed to a
    newer runtime (the r4 client/terminal skew class of failure — a skewed
    roll degrades to a one-time recompile, never an error or a silently
    poisoned cache).  Reads package metadata only; never initialises a
    backend."""
    import jax
    import jaxlib
    parts = [f"jax{jax.__version__}", f"jaxlib{jaxlib.__version__}"]
    try:
        from importlib import metadata
        for dist in ("libtpu", "libtpu-nightly"):
            try:
                parts.append(f"{dist}{metadata.version(dist)}")
                break
            except metadata.PackageNotFoundError:
                continue
    except Exception:  # noqa: BLE001 — tag is best-effort
        pass
    return "-".join(parts)


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
    cache_dir = os.path.join(
        os.environ.get(
            "SDV_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "stable_diffusion_videos_tpu", "jax")),
        _version_tag())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even fast compiles: the walk program family is many small
        # variants (per batch-bucket/steps/size) and all recur across runs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # a corrupt/undeserializable entry must degrade to a recompile,
        # never propagate as an error into the dispatch
        try:
            jax.config.update("jax_raise_persistent_cache_errors", False)
        except AttributeError:
            pass
    except Exception as e:  # noqa: BLE001 — cache is an optimisation only
        logger.debug("compile cache unavailable: %s", e)
        return None
    logger.info("persistent compile cache at %s", cache_dir)
    return cache_dir
