"""Per-seed noise init with a torch-compatible option (parity path).

The reference seeds one ``torch.Generator`` per walk endpoint
(``stable_diffusion_pipeline.py:822-838``); matching its frames per-seed
requires bit-identical initial noise.  torch (CPU build) is available in this
environment, so ``impl='torch'`` draws from ``torch.Generator('cpu')`` —
identical to the reference's CPU/MPS branch — and transposes NCHW->NHWC to
our layout.  ``impl='jax'`` is the torch-free default stream (stable across
this framework's own runs).
"""

from __future__ import annotations

import jax
import numpy as np


def noise_for_seed(seed: int, shape_nhwc: tuple[int, int, int, int],
                   impl: str = "torch") -> np.ndarray:
    """(B,H,W,C) float32 standard normal for a seed.

    impl='torch': bit-compatible with ``torch.randn((B,C,H,W),
    generator=torch.Generator('cpu').manual_seed(seed))`` (reference
    ``stable_diffusion_pipeline.py:826-831``), transposed to NHWC.
    impl='jax': jax.random.normal(PRNGKey(seed)).
    """
    b, h, w, c = shape_nhwc
    if impl == "torch":
        try:
            import torch
        except ImportError:
            impl = "jax"
        else:
            g = torch.Generator(device="cpu").manual_seed(int(seed))
            n = torch.randn((b, c, h, w), generator=g, dtype=torch.float32)
            return np.ascontiguousarray(n.numpy().transpose(0, 2, 3, 1))
    if impl == "jax":
        key = jax.random.PRNGKey(int(seed))
        return np.asarray(jax.random.normal(key, shape_nhwc, np.float32))
    raise ValueError(f"unknown rng impl {impl!r}")
