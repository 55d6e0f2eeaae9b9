"""AutoencoderKL (VAE) — latent encoder/decoder, TPU-native Flax/NHWC.

Owns the role the reference delegates to ``diffusers.AutoencoderKL`` /
``FlaxAutoencoderKL`` (reference ``stable_diffusion_pipeline.py:11,433``;
``flax_stable_diffusion_pipeline.py:12,311-313``), including the 0.18215
latent scaling applied at decode time (reference ``:432`` / ``:310``).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from .layers import (Downsample2D, GroupNorm32, ResnetBlock2D, Upsample2D,
                     VAEAttnBlock, conv_padding)

SD_LATENT_SCALE = 0.18215  # reference stable_diffusion_pipeline.py:432


@flax.struct.dataclass
class VAEConfig:
    in_channels: int = flax.struct.field(pytree_node=False, default=3)
    out_channels: int = flax.struct.field(pytree_node=False, default=3)
    latent_channels: int = flax.struct.field(pytree_node=False, default=4)
    block_out_channels: Tuple[int, ...] = flax.struct.field(
        pytree_node=False, default=(128, 256, 512, 512))
    layers_per_block: int = flax.struct.field(pytree_node=False, default=2)
    scaling_factor: float = flax.struct.field(pytree_node=False,
                                              default=SD_LATENT_SCALE)

    @property
    def scale_factor(self) -> int:
        """Spatial down/up-sampling factor (8 for SD1.x), cf. reference
        ``vae_scale_factor`` (``stable_diffusion_pipeline.py:158``)."""
        return 2 ** (len(self.block_out_channels) - 1)

    @classmethod
    def sd_v1(cls):
        return cls()

    @classmethod
    def tiny(cls):
        return cls(block_out_channels=(32, 64), layers_per_block=1)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    tiled: bool = False

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = x.astype(self.dtype)
        x = nn.Conv(cfg.block_out_channels[0], (3, 3),
                    padding=conv_padding(self.tiled), dtype=self.dtype,
                    name="conv_in")(x)
        for level, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, eps=1e-6, dtype=self.dtype, tiled=self.tiled,
                                  name=f"down_{level}_res_{j}")(x)
            if level != len(cfg.block_out_channels) - 1:
                x = Downsample2D(ch, asymmetric=True, dtype=self.dtype,
                                 tiled=self.tiled,
                                 name=f"down_{level}_downsample")(x)
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock2D(ch, eps=1e-6, dtype=self.dtype, tiled=self.tiled,
                          name="mid_res_0")(x)
        x = VAEAttnBlock(dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock2D(ch, eps=1e-6, dtype=self.dtype, tiled=self.tiled,
                          name="mid_res_1")(x)
        x = GroupNorm32(32, epsilon=1e-6, dtype=self.dtype,
                        name="conv_norm_out")(x, silu=True)
        return nn.Conv(2 * cfg.latent_channels, (3, 3),
                       padding=conv_padding(self.tiled), dtype=self.dtype,
                       name="conv_out")(x)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    tiled: bool = False

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        x = z.astype(self.dtype)
        ch = cfg.block_out_channels[-1]
        x = nn.Conv(ch, (3, 3), padding=conv_padding(self.tiled),
                    dtype=self.dtype, name="conv_in")(x)
        x = ResnetBlock2D(ch, eps=1e-6, dtype=self.dtype, tiled=self.tiled,
                          name="mid_res_0")(x)
        x = VAEAttnBlock(dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock2D(ch, eps=1e-6, dtype=self.dtype, tiled=self.tiled,
                          name="mid_res_1")(x)
        for idx, level in enumerate(reversed(range(len(cfg.block_out_channels)))):
            ch = cfg.block_out_channels[level]
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock2D(ch, eps=1e-6, dtype=self.dtype, tiled=self.tiled,
                                  name=f"up_{level}_res_{j}")(x)
            if idx != len(cfg.block_out_channels) - 1:
                x = Upsample2D(ch, dtype=self.dtype, tiled=self.tiled,
                               name=f"up_{level}_upsample")(x)
        x = GroupNorm32(32, epsilon=1e-6, dtype=self.dtype,
                        name="conv_norm_out")(x, silu=True)
        return nn.Conv(cfg.out_channels, (3, 3),
                       padding=conv_padding(self.tiled), dtype=self.dtype,
                       name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """quant/post-quant 1x1 convs around the encoder/decoder pair."""
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    tiled: bool = False

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype, tiled=self.tiled)
        self.decoder = Decoder(self.config, dtype=self.dtype, tiled=self.tiled)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype)

    def encode(self, x):
        """Image (B,H,W,3) in [-1,1] -> (mean, logvar) of the latent posterior."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        """Latents (B,h,w,4) (already divided by scaling_factor) -> image."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, sample_key=None):
        mean, logvar = self.encode(x)
        z = mean
        if sample_key is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                sample_key, mean.shape, mean.dtype)
        return self.decode(z), mean, logvar
