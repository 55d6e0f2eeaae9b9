"""Pallas TPU flash attention — the UNet's hot kernel at 512^2+.

At 512x512 the UNet's level-0 self-attention runs S=4096 tokens; the naive
S x S score matrix is what forced the reference into xformers CUDA attention
or "attention slicing" (reference ``stable_diffusion_pipeline.py:161-189``).
This kernel streams K/V tiles through VMEM with an online-softmax
accumulator, so HBM traffic stays O(S*D) and the MXU sees back-to-back
(TILE_Q x D) @ (D x TILE_K) matmuls.

Non-causal (diffusion attention has no mask), fp32 accumulators, bf16-in/
bf16-out friendly.  Grid: (batch*heads, Sq/TILE_Q); the K loop is the
innermost grid dimension so the Q tile + accumulators live in VMEM scratch
across K steps (revisiting pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: tuned on v5e (tools/profile_r02.json): tile_q=256 with the largest
#: fitting tile_k consistently won the sweep
DEFAULT_TILE_Q = 256
DEFAULT_TILE_K = 1024


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                  scale: float, tile_k_steps: int):
    """One (q_tile, k_tile) step of online-softmax attention.

    Grid: (BH, num_q_tiles, num_k_tiles); k is innermost.
    Block shapes: q (1, TQ, D), k/v (1, TK, D), o (1, TQ, D).
    Scratch: acc (TQ, D) f32, m/l (TQ, 128) f32 (broadcast lanes).
    """
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (TQ, D)
    k = k_ref[0]  # (TK, D)
    v = v_ref[0]  # (TK, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (TQ, TK)

    m_prev = m_ref[:, :1]                      # (TQ, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)  # (TQ, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)            # rescale factor
    p = jnp.exp(s - m_new)                     # (TQ, TK)

    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
    acc = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    acc_ref[:] = acc
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == tile_k_steps - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "tile_q", "tile_k", "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float | None = None,
                    tile_q: int = DEFAULT_TILE_Q,
                    tile_k: int = DEFAULT_TILE_K,
                    interpret: bool = False) -> jax.Array:
    """q: (B, Sq, H, D); k, v: (B, Sk, H, D) -> (B, Sq, H, D).

    Sequence lengths are padded to tile multiples internally (padded keys are
    masked out by giving them -inf scores via a length guard only when
    padding was added)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale_val = float(scale) if scale is not None else d ** -0.5

    tq = min(tile_q, _round_up(sq, 128))
    tk = min(tile_k, _round_up(sk, 128))
    sq_p, sk_p = _round_up(sq, tq), _round_up(sk, tk)

    if sk_p != sk:
        # ragged key lengths (rare: SD spatial S is 1024/4096, tile-aligned;
        # CLIP's 77-token path stays on the XLA backend anyway) would need
        # masked softmax — fall back to the fused XLA path.
        from .attention import xla_attention
        return xla_attention(q, k, v, scale=scale_val)

    # head_dim (40/80/160 in SD1.x) padded to the 128-lane width; zero
    # feature columns change neither q.k scores nor the used output columns
    d_p = max(_round_up(d, 128), 128)

    # (B, S, H, D) -> (B*H, S, Dp)
    def to_bhsd(x, s):
        x = jnp.moveaxis(x, 2, 1).reshape(b * h, s, d)
        if d_p != d:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, d_p - d)))
        return x

    qb = to_bhsd(q, sq)
    kb = to_bhsd(k, sk)
    vb = to_bhsd(v, sk)
    if sq_p != sq:
        qb = jnp.pad(qb, ((0, 0), (0, sq_p - sq), (0, 0)))

    grid = (b * h, sq_p // tq, sk_p // tk)
    kernel = functools.partial(_flash_kernel, scale=scale_val,
                               tile_k_steps=sk_p // tk)
    extra = {}
    if not interpret:
        # Mosaic hints: batch*head and q-tile axes are parallel; the k axis
        # carries the online-softmax accumulator (sequential revisiting)
        try:
            extra["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"))
        except TypeError:
            pass
        extra["cost_estimate"] = pl.CostEstimate(
            flops=4 * b * h * sq_p * sk_p * d_p,
            bytes_accessed=(b * h * (sq_p + 2 * sk_p + sq_p) * d_p
                            * q.dtype.itemsize),
            transcendentals=b * h * sq_p * sk_p,
        )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, d_p), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, tk, d_p), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, tk, d_p), lambda bh, qi, ki: (bh, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, d_p), lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d_p), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((tq, d_p), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.float32),
        ],
        interpret=interpret,
        **extra,
    )(qb, kb, vb)

    out = out[:, :sq, :d]
    return jnp.moveaxis(out.reshape(b, h, sq, d), 1, 2)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
