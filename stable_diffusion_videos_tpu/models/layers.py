"""Shared neural blocks for the SD model family — Flax linen, NHWC.

TPU-native equivalents of the diffusers building blocks the reference
consumes externally (SURVEY.md §2.2): ResnetBlock2D, spatial transformer
(self+cross attention, GEGLU FF), up/down sampling, timestep embeddings.

Conventions:
* NHWC everywhere (XLA:TPU's preferred conv layout; torch OIHW weights are
  transposed by ``models/weights.py``).
* ``dtype`` is the compute dtype (bf16 on TPU); params stay float32; GroupNorm
  statistics and softmax always run in float32.
* ``tiled=True`` switches every conv to circular padding — the explicit,
  idiomatic version of the reference's global ``nn.Conv2d`` monkey-patch
  (reference ``stable_diffusion_pipeline.py:840-858``).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import attention


def conv_padding(tiled: bool, pad: int = 1):
    return "CIRCULAR" if tiled else [(pad, pad), (pad, pad)]


def timestep_embedding(timesteps: jax.Array, dim: int,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       max_period: int = 10000) -> jax.Array:
    """Sinusoidal timestep embedding, diffusers-compatible. t:(B,) -> (B,dim)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], -1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedMLP(nn.Module):
    """Linear -> SiLU -> Linear projection of the sinusoidal embedding."""
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_2")(x)


class _NormAffine(nn.Module):
    """Bare scale/bias params with nn.GroupNorm's names/shapes — lets the
    fused Pallas path share one param tree with the flax path."""
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class GroupNorm32(nn.Module):
    """GroupNorm with float32 statistics regardless of compute dtype.

    ``silu=True`` fuses the following SiLU; with ``SDV_FUSED_GN=1`` on TPU
    the GN+SiLU pair runs as one Pallas kernel (1 HBM read + 1 write vs
    XLA's reduce-pass + normalize-pass — ops/groupnorm.py), probed on-chip
    by tools/tpu_probe_gnsilu.py."""
    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, silu: bool = False):
        import os
        if (silu and x.ndim == 4
                and os.environ.get("SDV_FUSED_GN") == "1"):
            # opt-in, TPU-targeted (non-TPU backends run the kernel
            # interpreted — correct but slow; tests use that path)
            from ..ops.groupnorm import fused_groupnorm_silu
            scale, bias = _NormAffine(x.shape[-1], name="norm")()
            return fused_groupnorm_silu(x, scale, bias,
                                        num_groups=self.num_groups,
                                        eps=self.epsilon, silu=True)
        orig = x.dtype
        out = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon,
                           dtype=jnp.float32, name="norm")(x.astype(jnp.float32))
        out = out.astype(orig)
        return nn.silu(out) if silu else out


class ResnetBlock2D(nn.Module):
    """GN->SiLU->Conv3x3 [+temb] ->GN->SiLU->Conv3x3, residual shortcut.

    ``eps`` follows diffusers: 1e-5 in the UNet, 1e-6 in the VAE
    (validated numerically in tests/test_torch_parity.py)."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    tiled: bool = False
    groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, temb: Optional[jax.Array] = None):
        residual = x
        h = GroupNorm32(self.groups, epsilon=self.eps, dtype=self.dtype,
                        name="norm1")(x, silu=True)
        h = nn.Conv(self.out_channels, (3, 3),
                    padding=conv_padding(self.tiled), dtype=self.dtype,
                    name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = GroupNorm32(self.groups, epsilon=self.eps, dtype=self.dtype,
                        name="norm2")(h, silu=True)
        h = nn.Conv(self.out_channels, (3, 3),
                    padding=conv_padding(self.tiled), dtype=self.dtype,
                    name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="conv_shortcut")(residual)
        return h + residual


class Downsample2D(nn.Module):
    """Stride-2 conv downsampling.

    diffusers semantics: the UNet builds Downsample2D with
    ``downsample_padding=1`` (symmetric), while the VAE encoder builds it
    with ``padding=0`` which triggers an asymmetric (0,1),(0,1) pad.  Both
    give the same output shape but DIFFERENT numerics — set ``asymmetric``
    accordingly (validated in tests/test_torch_parity.py)."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    tiled: bool = False
    asymmetric: bool = False

    @nn.compact
    def __call__(self, x):
        if self.tiled:
            pad = "CIRCULAR"
        elif self.asymmetric:
            pad = [(0, 1), (0, 1)]
        else:
            pad = [(1, 1), (1, 1)]
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=pad,
                       dtype=self.dtype, name="conv")(x)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Pixel-replication 2x upsample via broadcast-reshape.

    Numerically identical to ``jax.image.resize(..., method="nearest")`` but
    25-50x faster on TPU (measured, tools/profile2_r02.json "upsample"):
    the resize lowers to a gather, this to a free layout broadcast that XLA
    fuses into the following conv."""
    b, h, w, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :],
                            (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    tiled: bool = False

    @nn.compact
    def __call__(self, x):
        x = upsample_nearest_2x(x)
        return nn.Conv(self.out_channels, (3, 3),
                       padding=conv_padding(self.tiled), dtype=self.dtype,
                       name="conv")(x)


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when ``context`` is None.

    IP-Adapter (Ye et al. 2023) decoupled cross-attention: ``context`` may
    be a ``(text_context, ip_context, ip_scale)`` tuple — image tokens get
    their OWN key/value projections (``to_k_ip``/``to_v_ip``) and a separate
    softmax, and the scaled image-attention output is summed with the text
    attention before ``to_out`` (the published formulation; the reference
    has no image prompting at all)."""
    num_heads: int
    head_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        ip_context = ip_scale = None
        if isinstance(context, tuple):
            context, ip_context, ip_scale = context
        context = x if context is None else context
        inner = self.num_heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.num_heads, self.head_dim)
        k = k.reshape(b, sk, self.num_heads, self.head_dim)
        v = v.reshape(b, sk, self.num_heads, self.head_dim)
        out = attention(q, k, v)
        if ip_context is not None:
            k_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_k_ip")(ip_context)
            v_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_v_ip")(ip_context)
            st = ip_context.shape[1]
            k_ip = k_ip.reshape(b, st, self.num_heads, self.head_dim)
            v_ip = v_ip.reshape(b, st, self.num_heads, self.head_dim)
            out = out + jnp.asarray(ip_scale, out.dtype) \
                * attention(q, k_ip, v_ip)
        out = out.reshape(b, sq, inner)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        hg = nn.Dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        h, gate = jnp.split(hg, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> GEGLU FF, pre-LN residual blocks.

    ``tome_ratio`` > 0 runs the SELF-attention on a ToMe-merged token set
    (``ops/tome.py``): merge -> attn1 -> unmerge, the tomesd ``merge_attn``
    default; cross-attention and the FF see every token.  ``tokens_hw``
    carries the spatial extent the 2x2 bipartite partition needs."""
    dim: int
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    tome_ratio: float = 0.0
    tokens_hw: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x, context):
        # epsilon=1e-5 matches torch nn.LayerNorm (diffusers default)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        attn1 = CrossAttention(self.num_heads, self.head_dim, self.dim,
                               dtype=self.dtype, name="attn1")
        if self.tome_ratio > 0.0:
            from ..ops.tome import tome_wrap
            th, tw = self.tokens_hw
            x = x + tome_wrap(attn1, h, th, tw, self.tome_ratio)
        else:
            x = x + attn1(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(self.num_heads, self.head_dim, self.dim,
                               dtype=self.dtype, name="attn2")(h, context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class SpatialTransformer(nn.Module):
    """Transformer2DModel: GN -> 1x1 proj_in -> N blocks -> 1x1 proj_out + res."""
    num_heads: int
    head_dim: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32
    tome_ratio: float = 0.0

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        # diffusers Transformer2DModel hardcodes GN eps=1e-6
        out = GroupNorm32(32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(out)
        out = out.reshape(b, h * w, c)
        for i in range(self.depth):
            out = BasicTransformerBlock(c, self.num_heads, self.head_dim,
                                        dtype=self.dtype,
                                        tome_ratio=self.tome_ratio,
                                        tokens_hw=(h, w),
                                        name=f"blocks_{i}")(out, context)
        out = out.reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return out + residual


class VAEAttnBlock(nn.Module):
    """Single-head full self-attention used in the VAE mid block."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        # diffusers VAE attention GN eps=1e-6
        out = GroupNorm32(32, epsilon=1e-6, dtype=self.dtype,
                          name="group_norm")(x)
        out = out.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(out)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(out)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(out)
        attn_out = attention(q[:, :, None, :], k[:, :, None, :],
                             v[:, :, None, :]).reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(attn_out)
        return out.reshape(b, h, w, c) + residual
