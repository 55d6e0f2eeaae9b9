"""Attention op with a switchable backend (XLA einsum / Pallas flash).

The reference relies on xformers CUDA attention or "attention slicing" to fit
memory (reference ``stable_diffusion_pipeline.py:161-189``,
``examples/run_app.py:19-20``).  Neither concept survives on TPU: the Pallas
flash kernel (``ops/flash_attention.py``) streams K/V tiles through VMEM so
the S×S score matrix never materialises in HBM, and the XLA path below is a
single fused softmax(QK^T)V program.  Softmax statistics are always computed
in float32 regardless of the bf16 compute dtype.

Shapes follow the UNet convention: ``q: (B, Sq, H, D)``, ``k/v: (B, Sk, H, D)``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_BACKEND = os.environ.get("SDV_ATTENTION_BACKEND", "auto")


def set_attention_backend(name: str):
    """'auto' | 'xla' | 'flash' (module-level; applies to future traces)."""
    global _BACKEND
    if name not in ("auto", "xla", "flash"):
        raise ValueError(f"unknown attention backend {name!r}")
    _BACKEND = name


#: above this estimated f32 score-tensor size XLA stops materialising the
#: scores and its forced chunked path is competitive (v5e, 16 GB HBM)
_MATERIALIZE_LIMIT_BYTES = 8 << 30


def _resolve_backend(seq_len: int, head_dim: int,
                     batch_heads: int = 0, kv_len: int | None = None) -> str:
    if _BACKEND != "auto":
        return _BACKEND
    # Measured on the v5e (tools/profile_r02.json, round 2): inside the FULL
    # UNet the flash backend is strictly slower at SD1.x's D=40 (CFG
    # B=8/16/32: 176/353/727 ms vs XLA's 132/264/536) — the Pallas kernel
    # pads head_dim to the 128-lane width, wasting 3.2x MXU work — and
    # XLA's fused einsum-softmax-einsum wins at every D=40 shape.  Tiny
    # sequences (CLIP's 77 tokens) always go through XLA fusion.
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        return "xla"
    # Memory wall: from S=8192 (768^2 latents) the XLA path's fp32 score
    # matrix is >=256 MB per (batch, head) slice — at 1024^2 (S=16384, 1 GB
    # each, ~16 GB for one CFG pair) it cannot fit HBM at all.  Flash is
    # slower per-FLOP at D=40 but is the only path that fits, and at these
    # sizes XLA's logits HBM traffic dominates anyway.
    if seq_len >= 8192:
        return "flash"
    if seq_len >= 1024 and head_dim >= 256:
        return "flash"  # VAE mid block (D=512): flash 5.2 vs XLA 7.8 ms
    # SD2/SDXL-class heads (D=64): when the whole f32 score tensor FITS in
    # HBM, XLA materialises it and pays full write+read bandwidth — the
    # root cause of the SD2 batch-8 cliff (r3: tools/sd2_b8_r03.json shows
    # the b8 scan allocating MORE temp, 5.9 GB, than the b16 one, 4.4 GB).
    # Measured at (B*H=80, S=4096, D=64): flash 11.9 ms vs XLA 18.6; at
    # (B*H=160, S=1024): flash 5.0 vs 6.0.  Above the limit XLA is forced
    # into its chunked path and slightly beats flash (18.2 vs 20.8 ms) —
    # keep XLA there.  SD1.x's D=40/80 never routes here: r2's op sweep
    # (tools/profile_r02.json) measured XLA faster than flash at every
    # D=40/80 shape, materialised or not — the rule is exactly D=64,
    # the head size shared by SD2.x and SDXL.
    kv = kv_len if kv_len is not None else seq_len
    if (head_dim == 64 and seq_len >= 1024 and kv >= 1024
            and batch_heads > 0
            and 4 * batch_heads * seq_len * kv <= _MATERIALIZE_LIMIT_BYTES):
        return "flash"
    return "xla"


def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  scale: float | None = None) -> jax.Array:
    """Reference attention: one XLA program, fp32 softmax."""
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              scale: float | None = None) -> jax.Array:
    """Dispatch to the configured backend.  q:(B,Sq,H,D) k,v:(B,Sk,H,D)."""
    backend = _resolve_backend(q.shape[1], q.shape[-1],
                               batch_heads=q.shape[0] * q.shape[2],
                               kv_len=k.shape[1])
    if backend == "flash":
        from .flash_attention import flash_attention
        sq, sk = q.shape[1], k.shape[1]
        if sq >= 8192:
            # high-res tiles: the optimum k tile is ~1536-2048 and bigger
            # is NOT better (probe_r03.json "flash_ktile_big": S=16384
            # k2048 31.7 TF/s > k4096 29.4, k8192+ exceeds VMEM; S=9216
            # k1536 27.6 > k4608 26.5 > the old k1024 fallback 24.7);
            # tk must divide Sk or the kernel falls back to XLA
            tq = 512
            tk = next((t for t in (2048, 1536, 1024, 768, 512)
                       if sk % t == 0), min(sk, 512))
        elif q.shape[-1] == 64:
            # D=64 materialization-route tiles (r3 sweep, probe_r03.json
            # "flash_d64"): the k tile wants the WHOLE sequence — q256/k4096
            # is 24% faster than the q256/k1024 default at S=4096; at
            # S=1024 a single q tile wins for big batch*heads
            if sq >= 2048:
                tq = 256
                tk = next((t for t in (4096, 2048, 1024) if sk % t == 0),
                          min(sk, 1024))
            else:
                big = q.shape[0] * q.shape[2] >= 128
                tq = sq if (big and sq <= 1024) else 256
                tk = min(sk, 1024)
        else:
            tq, tk = 256, min(sk, 1024)
        return flash_attention(q, k, v, scale=scale, tile_q=tq, tile_k=tk)
    return xla_attention(q, k, v, scale=scale)


@functools.partial(jax.jit, static_argnames=("causal",))
def masked_attention(q, k, v, mask=None, causal: bool = False,
                     scale: float | None = None):
    """Attention with an optional additive mask / causal masking (CLIP path)."""
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        s = q.shape[1]
        cm = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(cm[None, None], logits, jnp.finfo(jnp.float32).min)
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
