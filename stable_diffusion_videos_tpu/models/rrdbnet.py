"""RRDBNet (Real-ESRGAN generator) — 4x super-resolution, TPU-native Flax.

Owns the role of ``realesrgan``/``basicsr`` RRDBNet in the reference's
upsampling stage (``upsampling.py:13-99``), which is torch/CUDA-only and
silently disabled on the reference's own TPU path
(``flax_stable_diffusion_pipeline.py:603``).  Here it is a first-class
NHWC Flax model: 23 residual-in-residual dense blocks + 2x nearest-conv
upsampling twice.

Weight conversion from the published ``RealESRGAN_x4plus.pth`` lives in
``models/weights.py``.
"""

from __future__ import annotations

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from .layers import upsample_nearest_2x


@flax.struct.dataclass
class RRDBNetConfig:
    in_channels: int = flax.struct.field(pytree_node=False, default=3)
    out_channels: int = flax.struct.field(pytree_node=False, default=3)
    num_feat: int = flax.struct.field(pytree_node=False, default=64)
    num_block: int = flax.struct.field(pytree_node=False, default=23)
    num_grow_ch: int = flax.struct.field(pytree_node=False, default=32)
    scale: int = flax.struct.field(pytree_node=False, default=4)

    @classmethod
    def x4plus(cls):
        """RealESRGAN_x4plus geometry (the weights the reference downloads,
        ``upsampling.py:31-41``)."""
        return cls()

    @classmethod
    def tiny(cls):
        return cls(num_feat=16, num_block=2, num_grow_ch=8)


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC space-to-depth matching ``torch.nn.functional.pixel_unshuffle``
    channel ordering (out channel = c*r² + i*r + j for sub-pixel (i, j)).

    basicsr's RRDBNet feeds scale-2 (scale-1) models a 2x (4x)
    pixel-unshuffled image so the conv trunk always upsamples 4x; the
    x2plus checkpoint's ``conv_first`` therefore has 12 input channels."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, H/r, W/r, C, i, j)
    return x.reshape(b, h // r, w // r, c * r * r)


class ResidualDenseBlock(nn.Module):
    num_feat: int
    num_grow_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.num_grow_ch
        conv = lambda ch, name: nn.Conv(ch, (3, 3), padding="SAME",
                                        dtype=self.dtype, name=name)
        x1 = _lrelu(conv(g, "conv1")(x))
        x2 = _lrelu(conv(g, "conv2")(jnp.concatenate([x, x1], -1)))
        x3 = _lrelu(conv(g, "conv3")(jnp.concatenate([x, x1, x2], -1)))
        x4 = _lrelu(conv(g, "conv4")(jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = conv(self.num_feat, "conv5")(
            jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    num_feat: int
    num_grow_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                 dtype=self.dtype, name="rdb1")(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                 dtype=self.dtype, name="rdb2")(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                 dtype=self.dtype, name="rdb3")(out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    config: RRDBNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """(B, H, W, 3) in [0,1] -> (B, scale*H, scale*W, 3) in [0,1]."""
        cfg = self.config
        x = x.astype(self.dtype)
        # scale<4: pixel-unshuffle the input so the 4x conv trunk nets out
        # to the requested scale (basicsr rrdbnet_arch semantics; the
        # x2plus/x1 checkpoints' conv_first expects 12/48 input channels)
        if cfg.scale == 2:
            x = pixel_unshuffle(x, 2)
        elif cfg.scale == 1:
            x = pixel_unshuffle(x, 4)
        feat = nn.Conv(cfg.num_feat, (3, 3), padding="SAME",
                       dtype=self.dtype, name="conv_first")(x)
        body = feat
        for i in range(cfg.num_block):
            body = RRDB(cfg.num_feat, cfg.num_grow_ch, dtype=self.dtype,
                        name=f"body_{i}")(body)
        body = nn.Conv(cfg.num_feat, (3, 3), padding="SAME",
                       dtype=self.dtype, name="conv_body")(body)
        feat = feat + body

        def up2(h, name):
            h = upsample_nearest_2x(h)  # 25-50x faster than image.resize
            return _lrelu(nn.Conv(cfg.num_feat, (3, 3), padding="SAME",
                                  dtype=self.dtype, name=name)(h))

        # the conv trunk always upsamples 4x (both up convs exist in every
        # official checkpoint); scale<4 is absorbed by the unshuffle above
        feat = up2(feat, "conv_up1")
        feat = up2(feat, "conv_up2")
        feat = _lrelu(nn.Conv(cfg.num_feat, (3, 3), padding="SAME",
                              dtype=self.dtype, name="conv_hr")(feat))
        out = nn.Conv(cfg.out_channels, (3, 3), padding="SAME",
                      dtype=self.dtype, name="conv_last")(feat)
        return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
