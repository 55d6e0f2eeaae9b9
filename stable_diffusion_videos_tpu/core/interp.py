"""Interpolation primitives — TPU-native, batched, on-device.

The reference computes spherical interpolation one frame at a time on the host
CPU, round-tripping every latent GPU->numpy->GPU (reference
``stable_diffusion_videos/utils.py:42-66``).  Here the whole trajectory is a
single vectorised device computation: ``t`` is a vector of interpolation
positions and the output is the full ``(T, ...)`` stack of interpolated
tensors, produced by one XLA program (elementwise VPU work, fused by XLA).

Semantics match the reference:

* ``slerp(t, v0, v1)``: spherical interpolation treating the *whole tensor* as
  one flat vector; falls back to lerp when the normalised dot product exceeds
  ``DOT_THRESHOLD`` (reference ``utils.py:53-62``).
* The torch walk path uses **lerp for text embeddings and slerp for noise**
  (reference ``stable_diffusion_pipeline.py:467-468``); the flax path uses
  slerp for both (``flax_stable_diffusion_pipeline.py:472-473``).  Trajectory
  builders expose both choices; the torch behaviour is the default because it
  is the parity target.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

DOT_THRESHOLD = 0.9995


def _slerp_single(t: jax.Array, v0: jax.Array, v1: jax.Array,
                  dot_threshold: float = DOT_THRESHOLD) -> jax.Array:
    """Spherically interpolate between two same-shape arrays at scalar ``t``.

    Treats each array as a single flattened vector (global norm / global dot),
    matching reference ``utils.py:52``.  Uses ``jnp.where`` instead of python
    branching so the function is jit/vmap-safe with no data-dependent control
    flow.
    """
    v0f = v0.astype(jnp.float32)
    v1f = v1.astype(jnp.float32)
    n0 = jnp.linalg.norm(v0f)
    n1 = jnp.linalg.norm(v1f)
    dot = jnp.sum(v0f * v1f) / (n0 * n1)
    dot_c = jnp.clip(dot, -1.0, 1.0)

    theta_0 = jnp.arccos(dot_c)
    sin_theta_0 = jnp.sin(theta_0)
    theta_t = theta_0 * t
    # Guard the sin(theta_0)=0 case (parallel vectors) — the lerp branch is
    # selected there anyway, but the unselected branch must not produce NaNs
    # (jnp.where evaluates both sides).
    safe_sin = jnp.where(jnp.abs(sin_theta_0) < 1e-12, 1.0, sin_theta_0)
    s0 = jnp.sin(theta_0 - theta_t) / safe_sin
    s1 = jnp.sin(theta_t) / safe_sin

    lerped = (1.0 - t) * v0f + t * v1f
    slerped = s0 * v0f + s1 * v1f
    out = jnp.where(jnp.abs(dot) > dot_threshold, lerped, slerped)
    return out.astype(v0.dtype)


@partial(jax.jit, static_argnames=("dot_threshold",))
def slerp(t, v0, v1, dot_threshold: float = DOT_THRESHOLD):
    """Spherical interpolation; ``t`` may be a scalar or a 1-D vector.

    With vector ``t`` of shape ``(T,)`` returns shape ``(T, *v0.shape)`` — the
    whole interpolation trajectory in one fused device computation.
    """
    t = jnp.asarray(t)
    if t.ndim == 0:
        return _slerp_single(t, v0, v1, dot_threshold)
    return jax.vmap(lambda ti: _slerp_single(ti, v0, v1, dot_threshold))(t)


@partial(jax.jit, static_argnames=())
def lerp(t, v0, v1):
    """Linear interpolation; ``t`` scalar or ``(T,)`` (trajectory stack)."""
    t = jnp.asarray(t)
    v0f = v0.astype(jnp.float32)
    v1f = v1.astype(jnp.float32)
    if t.ndim == 0:
        return ((1.0 - t) * v0f + t * v1f).astype(v0.dtype)
    tb = t.reshape((-1,) + (1,) * v0.ndim)
    return ((1.0 - tb) * v0f[None] + tb * v1f[None]).astype(v0.dtype)


def trajectory(t, embeds_a, embeds_b, noise_a, noise_b, *,
               embed_interp: str = "lerp", noise_interp: str = "slerp"):
    """Build the full (T, ...) embedding and noise trajectories on device.

    ``embed_interp='lerp'``/``noise_interp='slerp'`` reproduces the torch walk
    (reference ``stable_diffusion_pipeline.py:467-468``); pass
    ``embed_interp='slerp'`` for the flax reference behaviour
    (``flax_stable_diffusion_pipeline.py:472-473``).

    Returns ``(embeds, noise)`` with leading dim ``T = len(t)``.
    """
    fns = {"lerp": lerp, "slerp": slerp}
    embeds = fns[embed_interp](t, embeds_a, embeds_b)
    noise = fns[noise_interp](t, noise_a, noise_b)
    return embeds, noise
