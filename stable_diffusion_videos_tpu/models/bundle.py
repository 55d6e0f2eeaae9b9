"""SDModels — the model bundle (configs + params + tokenizer) one pipeline
drives.  Equivalent to what diffusers' ``DiffusionPipeline.from_pretrained``
assembles for the reference (``stable_diffusion_pipeline.py:65-159``), as an
explicit value object: params are a plain pytree (functional, shardable),
never hidden module state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..core.schedulers import SchedulerConfig
from .clip_text import CLIPTextConfig, CLIPTextEncoder
from .safety import SafetyChecker, SafetyConfig
from .tokenizer import BaseTokenizer, HashTokenizer
from .unet import UNet2DCondition, UNetConfig
from .vae import AutoencoderKL, VAEConfig


@dataclasses.dataclass
class SDModels:
    unet_config: UNetConfig
    vae_config: VAEConfig
    text_config: CLIPTextConfig
    params: dict[str, Any]  # {"unet","vae","text_encoder"[,"safety_checker"]}
    tokenizer: BaseTokenizer
    scheduler_config: SchedulerConfig = dataclasses.field(
        default_factory=SchedulerConfig)
    safety_config: Optional[SafetyConfig] = None
    dtype: Any = jnp.bfloat16  # compute dtype; params stay float32
    tiled: bool = False

    # ---- module builders (modules are stateless; params passed at call) ----
    def unet(self) -> UNet2DCondition:
        return UNet2DCondition(self.unet_config, dtype=self.dtype,
                               tiled=self.tiled)

    def vae(self) -> AutoencoderKL:
        return AutoencoderKL(self.vae_config, dtype=self.dtype,
                             tiled=self.tiled)

    def text_encoder(self) -> CLIPTextEncoder:
        return CLIPTextEncoder(self.text_config, dtype=self.dtype)

    def safety_checker(self) -> Optional[SafetyChecker]:
        if self.safety_config is None or "safety_checker" not in self.params:
            return None
        return SafetyChecker(self.safety_config, dtype=self.dtype)

    @property
    def vae_scale_factor(self) -> int:
        return self.vae_config.scale_factor

    @property
    def default_size(self) -> int:
        """Default image side = unet sample size * vae factor (reference
        ``stable_diffusion_pipeline.py:671-673``)."""
        return self.unet_config.sample_size * self.vae_scale_factor

    # ---- constructors ----
    @classmethod
    def tiny(cls, seed: int = 0, dtype=jnp.float32, tiled: bool = False,
             with_safety: bool = False) -> "SDModels":
        """Randomly initialised tiny bundle — every code path CPU-runnable."""
        ucfg, vcfg, tcfg = UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny()
        scfg = SafetyConfig.tiny() if with_safety else None
        keys = jax.random.split(jax.random.PRNGKey(seed), 4)
        lat = jnp.zeros((1, ucfg.sample_size, ucfg.sample_size,
                         ucfg.in_channels))
        ctx = jnp.zeros((1, 7, ucfg.cross_attention_dim))
        img_size = ucfg.sample_size * vcfg.scale_factor
        params = {
            "unet": UNet2DCondition(ucfg).init(
                keys[0], lat, jnp.zeros((1,)), ctx),
            "vae": AutoencoderKL(vcfg).init(
                keys[1], jnp.zeros((1, img_size, img_size, 3))),
            "text_encoder": CLIPTextEncoder(tcfg).init(
                keys[2], jnp.zeros((1, 77), jnp.int32)),
        }
        if with_safety:
            from .safety import preprocess_for_safety
            pix = preprocess_for_safety(jnp.zeros((1, img_size, img_size, 3)),
                                        scfg.vision.image_size)
            params["safety_checker"] = SafetyChecker(scfg).init(keys[3], pix)
        tok = HashTokenizer(vocab_size=tcfg.vocab_size)
        return cls(ucfg, vcfg, tcfg, params, tok, SchedulerConfig(),
                   safety_config=scfg, dtype=dtype, tiled=tiled)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16,
                        tiled: bool = False,
                        with_safety: bool = True) -> "SDModels":
        """Load a diffusers-layout SD v1.x checkpoint directory (safetensors)
        and convert to this framework's pytrees.  See ``models/weights.py``."""
        from .weights import load_sd_checkpoint
        return load_sd_checkpoint(path, dtype=dtype, tiled=tiled,
                                  with_safety=with_safety, cls=cls)

    def save(self, path) -> str:
        """Persist the converted bundle (native format; skips torch
        conversion on subsequent ``SDModels.load``)."""
        from .io import save_bundle
        return save_bundle(self, path)

    @classmethod
    def load(cls, path, dtype=None) -> "SDModels":
        from .io import load_bundle
        return load_bundle(path, dtype=dtype, cls=cls)

    def param_count(self) -> dict[str, int]:
        return {k: sum(x.size for x in jax.tree.leaves(v))
                for k, v in self.params.items()}
