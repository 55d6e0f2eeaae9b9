"""TAESD — Tiny AutoEncoder for Stable Diffusion (Bohan 2023,
github.com/madebyollin/taesd; shipped in diffusers as ``AutoencoderTiny``).

A distilled drop-in for the KL-VAE's encode/decode at ~1/70th the decode
FLOPs (0.02 vs 1.4 TFLOP per 512^2 frame): at few-step operating points the
full decoder dominates per-frame cost — at LCM-4 it is ~50% of the FLOPs
(see docs/performance.md), so swapping it roughly doubles throughput there.
The reference has no counterpart (it always pays the full
``AutoencoderKL.decode``, ``stable_diffusion_pipeline.py:433``); this is a
beyond-reference production lever, opt-in via ``Engine(tiny_decoder=True)``
/ ``walk(..., tiny_decoder=True)`` because the tiny decoder is a quality
trade (fine detail softens) the user must choose.

Conventions (matching upstream TAESD / diffusers ``AutoencoderTiny``):

* the decoder consumes the SAMPLER'S latents directly — already multiplied
  by the KL-VAE ``scaling_factor`` (AutoencoderTiny's own scaling_factor is
  1.0) — and emits images in **[0, 1]** (not the KL decoder's [-1, 1]);
* the encoder takes [0, 1] images and emits scaled latents.

TPU-first shape: NHWC, ``upsample_nearest_2x`` broadcast-reshape (measured
25-50x faster than resize-as-gather, tools/profile2_r02.json), every conv a
3x3 SAME MXU op, no normalisation layers at all (TAESD has none) — the
whole decoder is one fused conv chain XLA keeps on-chip.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import flax.struct
import jax.numpy as jnp
import numpy as np

from .layers import upsample_nearest_2x


@flax.struct.dataclass
class TAESDConfig:
    latent_channels: int = flax.struct.field(pytree_node=False, default=4)
    image_channels: int = flax.struct.field(pytree_node=False, default=3)
    #: channel width of every hidden conv (TAESD: 64 throughout)
    width: int = flax.struct.field(pytree_node=False, default=64)
    #: number of 2x up/down stages — the pixel scale factor is
    #: ``2 ** num_stages`` (TAESD: 3 -> the SD VAE's 8x)
    num_stages: int = flax.struct.field(pytree_node=False, default=3)
    #: residual blocks per stage (TAESD: 3)
    blocks_per_stage: int = flax.struct.field(pytree_node=False, default=3)

    @property
    def scale_factor(self) -> int:
        return 2 ** self.num_stages

    @classmethod
    def sd(cls) -> "TAESDConfig":
        """The published TAESD geometry (taesd/taesdxl: 1.2M params/side)."""
        return cls()

    @classmethod
    def tiny(cls) -> "TAESDConfig":
        """CPU-test / structured-bundle geometry: matches
        ``VAEConfig.tiny``'s 2x pixel factor (one stage)."""
        return cls(width=16, num_stages=1, blocks_per_stage=1)


class TAESDBlock(nn.Module):
    """conv-relu-conv-relu-conv with an identity skip, fused by a final
    relu — TAESD's only building block (no norms anywhere)."""
    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(self.width, (3, 3), dtype=self.dtype,
                            name="conv_0")(x))
        h = nn.relu(nn.Conv(self.width, (3, 3), dtype=self.dtype,
                            name="conv_1")(h))
        h = nn.Conv(self.width, (3, 3), dtype=self.dtype, name="conv_2")(h)
        return nn.relu(h + x)


class TAESDDecoder(nn.Module):
    """Scaled latents (B, h, w, 4) -> [0, 1] image (B, h*f, w*f, 3)."""
    config: TAESDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        # TAESD's Clamp: soft-limit latents to (-3, 3) so outlier latent
        # values cannot blow the norm-free conv chain up
        x = jnp.tanh(z.astype(self.dtype) / 3.0) * 3.0
        x = nn.relu(nn.Conv(cfg.width, (3, 3), dtype=self.dtype,
                            name="conv_in")(x))
        for s in range(cfg.num_stages):
            for j in range(cfg.blocks_per_stage):
                x = TAESDBlock(cfg.width, dtype=self.dtype,
                               name=f"up_{s}_block_{j}")(x)
            x = upsample_nearest_2x(x)
            x = nn.Conv(cfg.width, (3, 3), use_bias=False, dtype=self.dtype,
                        name=f"up_{s}_conv")(x)
        x = TAESDBlock(cfg.width, dtype=self.dtype, name="block_out")(x)
        return nn.Conv(cfg.image_channels, (3, 3), dtype=self.dtype,
                       name="conv_out")(x)


class TAESDEncoder(nn.Module):
    """[0, 1] image (B, H, W, 3) -> scaled latents (B, H/f, W/f, 4)."""
    config: TAESDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = nn.Conv(cfg.width, (3, 3), dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        x = TAESDBlock(cfg.width, dtype=self.dtype, name="block_in")(x)
        for s in range(cfg.num_stages):
            # explicit symmetric padding: torch's stride-2 padding=1 window
            # alignment (flax 'SAME' would pad (0, 1) here — different taps)
            x = nn.Conv(cfg.width, (3, 3), strides=(2, 2), use_bias=False,
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name=f"down_{s}_conv")(x)
            for j in range(cfg.blocks_per_stage):
                x = TAESDBlock(cfg.width, dtype=self.dtype,
                               name=f"down_{s}_block_{j}")(x)
        return nn.Conv(cfg.latent_channels, (3, 3), dtype=self.dtype,
                       name="conv_out")(x)


# ----------------------------------------------------------------------
# torch converter: upstream TAESD checkpoints are plain nn.Sequential
# state dicts ("1.weight", "3.conv.0.weight", ...); diffusers
# AutoencoderTiny prefixes "decoder.layers." / "encoder.layers.".
# ----------------------------------------------------------------------
def _decoder_index_map(cfg: TAESDConfig) -> Dict[int, str]:
    """Sequential index -> flax module name, walking the upstream decoder:
    Clamp, conv, ReLU, [Block x bps, Upsample, conv] x stages, Block, conv."""
    names, i = {}, 0
    i += 1                       # 0: Clamp (no params)
    names[i] = "conv_in"; i += 2  # conv, ReLU
    for s in range(cfg.num_stages):
        for j in range(cfg.blocks_per_stage):
            names[i] = f"up_{s}_block_{j}"; i += 1
        i += 1                   # nn.Upsample (no params)
        names[i] = f"up_{s}_conv"; i += 1
    names[i] = "block_out"; i += 1
    names[i] = "conv_out"
    return names


def _encoder_index_map(cfg: TAESDConfig) -> Dict[int, str]:
    """conv, Block, [strided conv, Block x bps] x stages, conv."""
    names, i = {}, 0
    names[i] = "conv_in"; i += 1
    names[i] = "block_in"; i += 1
    for s in range(cfg.num_stages):
        names[i] = f"down_{s}_conv"; i += 1
        for j in range(cfg.blocks_per_stage):
            names[i] = f"down_{s}_block_{j}"; i += 1
    names[i] = "conv_out"
    return names


def _convert_sequential(sd: Dict[str, np.ndarray], index_map: Dict[int, str],
                        ) -> Dict[str, Any]:
    """{idx}.weight / {idx}.conv.{k}.weight entries -> flax param tree.
    torch conv kernels are OIHW; flax wants HWIO."""
    tree: Dict[str, Any] = {}

    def put(mod, leaf, v):
        v = np.asarray(v)
        if v.ndim == 4:
            v = v.transpose(2, 3, 1, 0)
        tree.setdefault(mod, {})[leaf] = v

    for key, v in sd.items():
        parts = key.split(".")
        idx = int(parts[0])
        if idx not in index_map:
            raise ValueError(f"unexpected TAESD layer index {idx} ({key})")
        mod = index_map[idx]
        if parts[1] == "conv":       # Block: conv.0/.2/.4 -> conv_0/1/2
            put(f"{mod}/conv_{int(parts[2]) // 2}", parts[3], v)
        else:                        # bare conv: {idx}.weight/.bias
            put(mod, parts[1], v)

    out: Dict[str, Any] = {}
    for mod, leaves in tree.items():
        node = out
        for p in mod.split("/"):
            node = node.setdefault(p, {})
        node.update({("kernel" if k == "weight" else k): v
                     for k, v in leaves.items()})
    return {"params": out}


def infer_taesd_config(sd: Dict[str, np.ndarray]) -> TAESDConfig:
    """Geometry from a decoder state dict's shapes: width from conv_in's
    out-channels, stage/block counts from the index structure."""
    idxs = sorted({int(k.split(".")[0]) for k in sd})
    width = int(np.asarray(sd["1.weight"]).shape[0])
    latent = int(np.asarray(sd["1.weight"]).shape[1])
    image = int(np.asarray(sd[f"{idxs[-1]}.weight"]).shape[0])
    # bare no-bias convs mark the per-stage upsample joints
    stage_convs = [i for i in idxs
                   if f"{i}.weight" in sd and f"{i}.bias" not in sd
                   and f"{i}.conv.0.weight" not in sd]
    num_stages = len(stage_convs)
    blocks = [i for i in idxs if f"{i}.conv.0.weight" in sd]
    bps = (len(blocks) - 1) // max(num_stages, 1) if num_stages else 0
    return TAESDConfig(latent_channels=latent, image_channels=image,
                       width=width, num_stages=num_stages,
                       blocks_per_stage=bps)


def convert_taesd_decoder(sd: Dict[str, np.ndarray],
                          cfg: TAESDConfig = None
                          ) -> Tuple[TAESDConfig, Dict[str, Any]]:
    sd = {k.removeprefix("decoder.layers."): v for k, v in sd.items()
          if not k.startswith("encoder.")}
    cfg = cfg or infer_taesd_config(sd)
    return cfg, _convert_sequential(sd, _decoder_index_map(cfg))


def convert_taesd_encoder(sd: Dict[str, np.ndarray],
                          cfg: TAESDConfig = None
                          ) -> Tuple[TAESDConfig, Dict[str, Any]]:
    sd = {k.removeprefix("encoder.layers."): v for k, v in sd.items()
          if not k.startswith("decoder.")}
    if cfg is None:
        idxs = sorted({int(k.split(".")[0]) for k in sd})
        width = int(np.asarray(sd["0.weight"]).shape[0])
        latent = int(np.asarray(sd[f"{idxs[-1]}.weight"]).shape[0])
        downs = [i for i in idxs
                 if f"{i}.weight" in sd and f"{i}.bias" not in sd
                 and f"{i}.conv.0.weight" not in sd]
        blocks = [i for i in idxs if f"{i}.conv.0.weight" in sd]
        ns = len(downs)
        cfg = TAESDConfig(latent_channels=latent, width=width,
                          num_stages=ns,
                          blocks_per_stage=(len(blocks) - 1) // max(ns, 1))
    return cfg, _convert_sequential(sd, _encoder_index_map(cfg))


def load_taesd(decoder_path, encoder_path=None):
    """Load upstream TAESD weights (``taesd_decoder.safetensors`` /
    diffusers ``AutoencoderTiny`` layout) -> (config, params dict with
    "taesd_decoder" [+ "taesd_encoder"]) ready for
    ``SDModels.with_taesd``."""
    from pathlib import Path

    from .weights import load_state_dict
    sd = load_state_dict(Path(decoder_path))
    # a combined diffusers AutoencoderTiny file carries both halves
    has_enc = any(k.startswith("encoder.") for k in sd)
    cfg, dec = convert_taesd_decoder(sd)
    params = {"taesd_decoder": dec}
    if encoder_path is not None:
        _, enc = convert_taesd_encoder(
            load_state_dict(Path(encoder_path)), cfg)
        params["taesd_encoder"] = enc
    elif has_enc:
        _, enc = convert_taesd_encoder(sd, cfg)
        params["taesd_encoder"] = enc
    return cfg, params
