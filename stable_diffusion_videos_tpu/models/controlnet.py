"""ControlNet — spatially-conditioned generation (beyond the reference).

The reference has no structural conditioning at all; for a *video* tool the
ability to lock every frame of a walk to one pose/depth/edge map while the
prompt morphs is the single most-requested capability of the surrounding SD
ecosystem, so the rebuild owns it TPU-natively (Zhang et al. 2023, "Adding
Conditional Control to Text-to-Image Diffusion Models").

Architecture: a trainable copy of the UNet's down + mid path, fed
``conv_in(latents) + cond_embedding(control_image)``, whose per-skip outputs
pass through zero-initialised 1x1 convs and are ADDED to the base UNet's
skip connections (``models/unet.py`` ``ctrl_down``/``ctrl_mid``).  The
zero convs make an untrained ControlNet an exact no-op — an invariant the
tests pin.

Module/param names mirror ``models/unet.py`` for the shared trunk, so the
weight converter (``models/weights.py:convert_controlnet``) reuses the UNet
mapping for diffusers ``ControlNetModel`` checkpoints (lllyasviel/sd-controlnet-*,
diffusers controlnet layout).  Everything is NHWC, bf16-compute/f32-param,
one fused program per denoise dispatch (``runtime/engine.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (GroupNorm32, ResnetBlock2D, SpatialTransformer,
                     TimestepEmbedMLP, Downsample2D, conv_padding,
                     timestep_embedding)
from .unet import UNetConfig


class ControlNetCondEmbedding(nn.Module):
    """Pixel-space control image -> latent-resolution feature map.

    conv_in -> [conv3x3, conv3x3 stride 2] pairs -> zero-init conv_out;
    ``len(channels) - 1`` stride-2 convs must equal log2(vae_scale_factor)
    so the output lands at latent resolution (SD1.x: (16, 32, 96, 256))."""
    channels: Tuple[int, ...]
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    tiled: bool = False

    @nn.compact
    def __call__(self, cond: jax.Array) -> jax.Array:
        pad = conv_padding(self.tiled)
        x = nn.Conv(self.channels[0], (3, 3), padding=pad, dtype=self.dtype,
                    name="conv_in")(cond.astype(self.dtype))
        x = nn.silu(x)
        for i in range(len(self.channels) - 1):
            x = nn.silu(nn.Conv(self.channels[i], (3, 3), padding=pad,
                                dtype=self.dtype, name=f"blocks_{2 * i}")(x))
            x = nn.silu(nn.Conv(self.channels[i + 1], (3, 3), strides=(2, 2),
                                padding=pad, dtype=self.dtype,
                                name=f"blocks_{2 * i + 1}")(x))
        return nn.Conv(self.out_channels, (3, 3), padding=pad,
                       dtype=self.dtype, kernel_init=nn.initializers.zeros,
                       name="conv_out")(x)


class ControlNet(nn.Module):
    """Down+mid UNet copy with control injection and zero-conv taps.

    Returns ``(down_residuals, mid_residual)`` shaped exactly like the base
    UNet's skip list — pass them to ``UNet2DCondition(..., ctrl_down=,
    ctrl_mid=)``."""
    config: UNetConfig
    cond_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32
    tiled: bool = False

    @nn.compact
    def __call__(self, sample: jax.Array, timesteps: jax.Array,
                 encoder_hidden_states: jax.Array, cond: jax.Array,
                 conditioning_scale=1.0, text_embeds: jax.Array = None,
                 time_ids: jax.Array = None):
        cfg = self.config
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        n_levels = len(cfg.block_out_channels)

        # time embedding — identical to models/unet.py (same param names)
        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0],
                                   cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = TimestepEmbedMLP(cfg.block_out_channels[0] * 4,
                                dtype=self.dtype,
                                name="time_embedding")(t_emb.astype(self.dtype))
        if cfg.addition_embed_dim is not None:  # SDXL-flavoured controlnets
            if text_embeds is None or time_ids is None:
                raise ValueError("this ControlNet config requires text_embeds"
                                 " and time_ids (text_time conditioning)")
            b = sample.shape[0]
            ids_emb = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_embed_dim,
                cfg.flip_sin_to_cos, cfg.freq_shift).reshape(b, -1)
            add = jnp.concatenate(
                [text_embeds.astype(jnp.float32), ids_emb], axis=-1)
            temb = temb + TimestepEmbedMLP(
                cfg.block_out_channels[0] * 4, dtype=self.dtype,
                name="add_embedding")(add.astype(self.dtype))

        ctx = encoder_hidden_states.astype(self.dtype)
        x = nn.Conv(cfg.block_out_channels[0], (3, 3),
                    padding=conv_padding(self.tiled), dtype=self.dtype,
                    name="conv_in")(sample.astype(self.dtype))
        x = x + ControlNetCondEmbedding(
            self.cond_channels, cfg.block_out_channels[0], dtype=self.dtype,
            tiled=self.tiled, name="cond_embedding")(cond)

        # ---- down path (mirrors models/unet.py, same names) ----
        skips = [x]
        for level in range(n_levels):
            ch = cfg.block_out_channels[level]
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, dtype=self.dtype, tiled=self.tiled,
                                  name=f"down_{level}_res_{j}")(x, temb)
                if cfg.attn_levels[level]:
                    heads = cfg.heads(level)
                    x = SpatialTransformer(
                        heads, ch // heads, depth=cfg.depth(level),
                        dtype=self.dtype,
                        name=f"down_{level}_attn_{j}")(x, ctx)
                skips.append(x)
            if level != n_levels - 1:
                x = Downsample2D(ch, dtype=self.dtype, tiled=self.tiled,
                                 name=f"down_{level}_downsample")(x)
                skips.append(x)

        # ---- mid ----
        mid_ch = cfg.block_out_channels[-1]
        mid_heads = cfg.heads(n_levels - 1)
        x = ResnetBlock2D(mid_ch, dtype=self.dtype, tiled=self.tiled,
                          name="mid_res_0")(x, temb)
        x = SpatialTransformer(mid_heads, mid_ch // mid_heads,
                               depth=cfg.depth(n_levels - 1),
                               dtype=self.dtype, name="mid_attn")(x, ctx)
        x = ResnetBlock2D(mid_ch, dtype=self.dtype, tiled=self.tiled,
                          name="mid_res_1")(x, temb)

        # ---- zero-conv taps (exact no-op at init) ----
        scale = jnp.asarray(conditioning_scale, self.dtype)
        down_res = tuple(
            nn.Conv(s.shape[-1], (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros,
                    name=f"zero_conv_{i}")(s) * scale
            for i, s in enumerate(skips))
        mid_res = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                          kernel_init=nn.initializers.zeros,
                          name="zero_conv_mid")(x) * scale
        return down_res, mid_res


@dataclasses.dataclass
class ControlNetBundle:
    """Config + params value object an Engine attaches to its UNet."""
    config: UNetConfig
    params: Any
    cond_channels: Tuple[int, ...] = (16, 32, 96, 256)

    def module(self, dtype=jnp.float32, tiled: bool = False) -> ControlNet:
        return ControlNet(self.config, cond_channels=self.cond_channels,
                          dtype=dtype, tiled=tiled)

    @property
    def pixel_factor(self) -> int:
        """Control-image side / latent side (must equal vae_scale_factor)."""
        return 2 ** (len(self.cond_channels) - 1)

    @classmethod
    def tiny(cls, seed: int = 0, perturb: bool = False) -> "ControlNetBundle":
        """CPU-runnable bundle matched to ``SDModels.tiny`` (vae factor 2).

        ``perturb=True`` re-draws the zero convs from a normal so the
        residuals are non-zero — tests that need the control image to
        actually change the output."""
        cfg = UNetConfig.tiny()
        cond_channels = (8, 16)
        mod = ControlNet(cfg, cond_channels=cond_channels)
        f = 2 ** (len(cond_channels) - 1)
        lat = jnp.zeros((1, cfg.sample_size, cfg.sample_size,
                         cfg.in_channels))
        cond = jnp.zeros((1, cfg.sample_size * f, cfg.sample_size * f, 3))
        ctx = jnp.zeros((1, 7, cfg.cross_attention_dim))
        params = mod.init(jax.random.PRNGKey(seed), lat, jnp.zeros((1,)),
                          ctx, cond)
        if perturb:
            key = jax.random.PRNGKey(seed + 1)

            def reinit(path, leaf):
                nonlocal key
                names = [getattr(p, "key", "") for p in path]
                # both zero-init layers: the 1x1 taps and the cond
                # embedding's conv_out (else the control image would still
                # have zero influence)
                hit = (any("zero_conv" in n for n in names)
                       or ("cond_embedding" in names and "conv_out" in names))
                if hit:
                    key, sub = jax.random.split(key)
                    return 0.05 * jax.random.normal(sub, leaf.shape,
                                                    leaf.dtype)
                return leaf
            params = jax.tree_util.tree_map_with_path(reinit, params)
        return cls(cfg, params, cond_channels)

    @classmethod
    def tiny_xl(cls, seed: int = 0,
                perturb: bool = False) -> "ControlNetBundle":
        """CPU-runnable SDXL-flavoured bundle matched to
        ``SDModels.tiny_xl`` — exercises the text_time addition embedding
        the XL ControlNet trunk requires (text_embeds + time_ids)."""
        cfg = UNetConfig.tiny_xl()
        cond_channels = (8, 16)
        mod = ControlNet(cfg, cond_channels=cond_channels)
        f = 2 ** (len(cond_channels) - 1)
        lat = jnp.zeros((1, cfg.sample_size, cfg.sample_size,
                         cfg.in_channels))
        cond = jnp.zeros((1, cfg.sample_size * f, cfg.sample_size * f, 3))
        ctx = jnp.zeros((1, 7, cfg.cross_attention_dim))
        params = mod.init(jax.random.PRNGKey(seed), lat, jnp.zeros((1,)),
                          ctx, cond,
                          text_embeds=jnp.zeros((1, cfg.addition_pooled_dim)),
                          time_ids=jnp.zeros((1, cfg.addition_num_ids)))
        if perturb:
            key = jax.random.PRNGKey(seed + 1)

            def reinit(path, leaf):
                nonlocal key
                names = [getattr(p, "key", "") for p in path]
                hit = (any("zero_conv" in n for n in names)
                       or ("cond_embedding" in names
                           and "conv_out" in names))
                if hit:
                    key, sub = jax.random.split(key)
                    return 0.05 * jax.random.normal(sub, leaf.shape,
                                                    leaf.dtype)
                return leaf
            params = jax.tree_util.tree_map_with_path(reinit, params)
        return cls(cfg, params, cond_channels)
