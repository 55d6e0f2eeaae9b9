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
    #: SDXL second text tower (OpenCLIP-bigG); the two towers' hidden states
    #: concatenate to ``unet_config.cross_attention_dim`` and tower 2's
    #: projected pooled output feeds the text_time addition embedding
    text_config_2: Optional[CLIPTextConfig] = None
    #: SDXL tokenizer for tower 2 (same BPE, pads with 0 instead of eos);
    #: None falls back to ``tokenizer``
    tokenizer_2: Optional[BaseTokenizer] = None
    #: FreeU (b1, b2, s1, s2) backbone/skip re-weighting, or None (off) —
    #: see ``UNet2DCondition.freeu`` / ``SDModels.with_freeu``
    freeu: Optional[tuple] = None
    #: ToMe-SD token merging: (ratio, max_level) or None (off) —
    #: see ``ops/tome.py`` / ``SDModels.with_tome``
    tome: Optional[tuple] = None
    #: TAESD tiny autoencoder geometry (models/taesd.py) — set when
    #: ``params`` carries "taesd_decoder" (+ optional "taesd_encoder");
    #: enables ``Engine(tiny_decoder=True)``
    taesd_config: Optional[Any] = None

    def __post_init__(self):
        # model init/convert compiles run before any Engine exists; on this
        # host a cold XLA:CPU init compile costs minutes (AOT machine
        # mismatch), so the persistent cache must engage here too
        from ..utils.compile_cache import enable_compile_cache
        enable_compile_cache()

    # ---- module builders (modules are stateless; params passed at call) ----
    def unet(self) -> UNet2DCondition:
        return UNet2DCondition(self.unet_config, dtype=self.dtype,
                               tiled=self.tiled, freeu=self.freeu,
                               tome=self.tome)

    def with_tome(self, ratio: float, max_level: int = 0) -> "SDModels":
        """Bundle copy with ToMe-SD token merging (ops/tome.py): merge
        ``ratio`` of the self-attention tokens at resolution levels
        <= ``max_level`` (0 = only the highest resolution, the tomesd
        ``max_downsample=1`` default).  ``ratio=0`` switches it off."""
        if not 0.0 <= ratio < 1.0:
            raise ValueError("tome ratio must be in [0, 1)")
        return dataclasses.replace(
            self, tome=(float(ratio), int(max_level)) if ratio else None)

    def with_freeu(self, freeu) -> "SDModels":
        """Bundle copy with FreeU on: ``freeu=True`` picks the published
        per-family factors (Si et al. 2023 — SD1.x (1.5, 1.6, 0.9, 0.2),
        SD2.x (1.4, 1.6, 0.9, 0.2), SDXL (1.3, 1.4, 0.9, 0.2)); a 4-tuple
        sets (b1, b2, s1, s2) explicitly."""
        if freeu is True:
            if self.is_xl:
                freeu = (1.3, 1.4, 0.9, 0.2)
            elif self.unet_config.cross_attention_dim == 1024:
                freeu = (1.4, 1.6, 0.9, 0.2)
            else:
                freeu = (1.5, 1.6, 0.9, 0.2)
        elif freeu:
            freeu = tuple(float(f) for f in freeu)
            if len(freeu) != 4:
                raise ValueError("freeu must be (b1, b2, s1, s2)")
        return dataclasses.replace(self, freeu=freeu or None)

    def vae(self) -> AutoencoderKL:
        return AutoencoderKL(self.vae_config, dtype=self.dtype,
                             tiled=self.tiled)

    def taesd_decoder(self):
        """TAESD tiny decoder module (models/taesd.py), or None when the
        bundle carries no tiny-autoencoder weights."""
        if self.taesd_config is None or "taesd_decoder" not in self.params:
            return None
        from .taesd import TAESDDecoder
        return TAESDDecoder(self.taesd_config, dtype=self.dtype)

    def with_taesd(self, taesd) -> "SDModels":
        """Bundle copy with TAESD attached.  ``taesd`` is a checkpoint path
        (upstream taesd_decoder.safetensors / diffusers AutoencoderTiny —
        converted via models/taesd.py) or a ``(config, params_dict)`` pair
        (e.g. from tools/distill_taesd.py).  The tiny factor must match the
        KL-VAE's or latents wouldn't decode to the requested size."""
        from .taesd import load_taesd
        if isinstance(taesd, (str,)) or hasattr(taesd, "__fspath__"):
            cfg, extra = load_taesd(taesd)
        else:
            cfg, extra = taesd
            if not isinstance(extra, dict) or "taesd_decoder" not in extra:
                raise ValueError("with_taesd((config, params)): params must "
                                 "be a dict with a 'taesd_decoder' entry")
        if cfg.scale_factor != self.vae_scale_factor:
            raise ValueError(
                f"TAESD pixel factor {cfg.scale_factor}x does not match the "
                f"bundle VAE's {self.vae_scale_factor}x")
        return dataclasses.replace(
            self, taesd_config=cfg, params={**self.params, **extra})

    def text_encoder(self) -> CLIPTextEncoder:
        return CLIPTextEncoder(self.text_config, dtype=self.dtype)

    def text_encoder_2(self) -> Optional[CLIPTextEncoder]:
        if self.text_config_2 is None:
            return None
        return CLIPTextEncoder(self.text_config_2, dtype=self.dtype)

    @property
    def is_xl(self) -> bool:
        """SDXL-family bundle: dual text towers + text_time conditioning."""
        return self.unet_config.addition_embed_dim is not None

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

    @property
    def default_batch_size(self) -> int:
        """Measured production dispatch size per family
        (docs/performance.md batch ladders): 8 for the 512^2-native
        families; 1 for SDXL at its native 1024^2, where batch 2 adds
        nothing and batch 8 exhausts HBM."""
        return 1 if self.default_size >= 1024 else 8

    # ---- constructors ----
    @classmethod
    def tiny(cls, seed: int = 0, dtype=jnp.float32, tiled: bool = False,
             with_safety: bool = False) -> "SDModels":
        """Randomly initialised tiny bundle — every code path CPU-runnable."""
        from ..utils.compile_cache import enable_compile_cache
        enable_compile_cache()  # BEFORE the init compiles below
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
    def small(cls, seed: int = 0, dtype=jnp.float32) -> "SDModels":
        """Randomly initialised SMALL bundle (~32x32 images, ~3M params):
        big enough to overfit the structured gate-weight dataset
        (``training/structured_data.py``) into visibly structured samples,
        small enough to train on CPU in minutes and commit as a checkpoint.
        Same code paths as ``tiny``; used by ``tools/train_structured.py``
        to produce the trained quality-gate weights (VERDICT r4 #3)."""
        from ..utils.compile_cache import enable_compile_cache
        enable_compile_cache()
        ucfg = UNetConfig(sample_size=16, block_out_channels=(64, 128),
                          layers_per_block=1, cross_attention_dim=32,
                          attention_head_dim=4, attn_levels=(True, True))
        vcfg = VAEConfig(block_out_channels=(32, 64), layers_per_block=1)
        tcfg = CLIPTextConfig.tiny()
        keys = jax.random.split(jax.random.PRNGKey(seed), 3)
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
        tok = HashTokenizer(vocab_size=tcfg.vocab_size)
        return cls(ucfg, vcfg, tcfg, params, tok, SchedulerConfig(),
                   dtype=dtype)

    @classmethod
    def tiny_xl(cls, seed: int = 0, dtype=jnp.float32,
                tiled: bool = False) -> "SDModels":
        """Randomly initialised tiny SDXL-flavoured bundle: dual text towers
        (16+16 = the 32-wide cross-attention context), per-level transformer
        depth (0, 2), and text_time micro-conditioning — every SDXL code
        path CPU-runnable."""
        from ..utils.compile_cache import enable_compile_cache
        enable_compile_cache()
        ucfg, vcfg = UNetConfig.tiny_xl(), VAEConfig.tiny()
        tcfg = CLIPTextConfig(vocab_size=1000, hidden_size=16,
                              intermediate_size=32, num_layers=2, num_heads=2,
                              penultimate_hidden=True)
        tcfg2 = CLIPTextConfig(vocab_size=1000, hidden_size=16,
                               intermediate_size=32, num_layers=2,
                               num_heads=2, penultimate_hidden=True,
                               projection_dim=ucfg.addition_pooled_dim)
        keys = jax.random.split(jax.random.PRNGKey(seed), 4)
        lat = jnp.zeros((1, ucfg.sample_size, ucfg.sample_size,
                         ucfg.in_channels))
        ctx = jnp.zeros((1, 7, ucfg.cross_attention_dim))
        te = jnp.zeros((1, ucfg.addition_pooled_dim))
        ti = jnp.zeros((1, 6))
        img_size = ucfg.sample_size * vcfg.scale_factor
        params = {
            "unet": UNet2DCondition(ucfg).init(
                keys[0], lat, jnp.zeros((1,)), ctx, te, ti),
            "vae": AutoencoderKL(vcfg).init(
                keys[1], jnp.zeros((1, img_size, img_size, 3))),
            "text_encoder": CLIPTextEncoder(tcfg).init(
                keys[2], jnp.zeros((1, 77), jnp.int32)),
            "text_encoder_2": CLIPTextEncoder(tcfg2).init(
                keys[3], jnp.zeros((1, 77), jnp.int32)),
        }
        tok = HashTokenizer(vocab_size=tcfg.vocab_size)
        return cls(ucfg, vcfg, tcfg, params, tok, SchedulerConfig(),
                   dtype=dtype, tiled=tiled, text_config_2=tcfg2)

    @classmethod
    def random_bench(cls, family: str = "sd1", dtype=jnp.bfloat16,
                     seed: int = 1, text_config=None) -> "SDModels":
        """Full-geometry bundle with RANDOM bench weights: the real
        SD1.x/SDXL UNet+VAE geometry under a tiny text tower (embedding
        cost is negligible next to the UNet), params drawn N(0, 0.02)
        directly in ``dtype`` via ``eval_shape`` — never materialising an
        fp32 tree first (an 860M-param fp32 tree wastes 3.4 GB of HBM
        next to the compiled program).  The 0.02 scale is load-bearing:
        unit-scale bf16 params overflow the UNet's residual sums within a
        few blocks.  One definition shared by ``bench.py`` and the
        ``tools/`` measurement probes so every timed program runs the
        same geometry."""
        from ..utils.compile_cache import enable_compile_cache
        enable_compile_cache()
        if family == "sdxl":
            ucfg, vcfg, _, _ = cls.sd_xl_configs()
        elif family == "sd1":
            ucfg, vcfg = UNetConfig.sd_v1(), VAEConfig.sd_v1()
        elif family == "tiny":  # bench.py's CPU smoke fallback
            ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
        else:
            raise ValueError(f"unknown bench family {family!r}")
        # tiny text tower by default: embedding cost is negligible in the
        # denoise programs; tools measuring embed/compile latency pass a
        # real-sized text_config instead (tools/tpu_warmup_latency.py)
        tcfg = text_config or CLIPTextConfig.tiny()
        key = [jax.random.PRNGKey(seed)]

        def random_params(model, *args):
            shapes = jax.eval_shape(lambda k: model.init(k, *args),
                                    jax.random.PRNGKey(0))

            def mk(s):
                key[0], sub = jax.random.split(key[0])
                return (jax.random.normal(sub, s.shape, jnp.float32) * 0.02
                        ).astype(dtype if s.dtype == jnp.float32
                                 else s.dtype)
            return jax.tree.map(mk, shapes)

        xl_args = ((jnp.zeros((1, ucfg.addition_pooled_dim)),
                    jnp.zeros((1, ucfg.addition_num_ids)))
                   if family == "sdxl" else ())
        params = {
            "unet": random_params(
                UNet2DCondition(ucfg, dtype=dtype),
                jnp.zeros((1, 8, 8, ucfg.in_channels)), jnp.zeros((1,)),
                jnp.zeros((1, 77, ucfg.cross_attention_dim)), *xl_args),
            "vae": random_params(AutoencoderKL(vcfg, dtype=dtype),
                                 jnp.zeros((1, 64, 64, 3))),
            "text_encoder": random_params(CLIPTextEncoder(tcfg, dtype=dtype),
                                          jnp.zeros((1, 77), jnp.int32)),
        }
        return cls(ucfg, vcfg, tcfg, params,
                   HashTokenizer(vocab_size=tcfg.vocab_size),
                   SchedulerConfig(), dtype=dtype)

    @classmethod
    def sd_xl_configs(cls):
        """The full SDXL-base config tuple (unet, vae, text, text_2) — used
        by the weight converter and by shape-only tooling."""
        vcfg = VAEConfig.sd_v1().replace(scaling_factor=0.13025)  # sdxl-vae
        return (UNetConfig.sd_xl(), vcfg,
                CLIPTextConfig.sd_xl_l(), CLIPTextConfig.sd_xl_g())

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16,
                        tiled: bool = False, with_safety: bool = True,
                        tokenizer_dir=None,
                        prediction_type=None) -> "SDModels":
        """Load a checkpoint and convert to this framework's pytrees.

        ``path`` may be a diffusers-layout directory / hub id
        (``models/weights.py``) OR a single original-layout
        ``.ckpt``/``.safetensors`` file (``models/ldm.py`` — SD1/SD2/SDXL,
        geometry inferred from shapes).  ``tokenizer_dir`` and
        ``prediction_type`` apply to single files only, which carry
        neither a vocab nor a scheduler config."""
        from pathlib import Path
        if Path(path).is_file():
            from .ldm import load_ldm_checkpoint
            return load_ldm_checkpoint(
                path, tokenizer_dir=tokenizer_dir, dtype=dtype, tiled=tiled,
                prediction_type=prediction_type, cls=cls)
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
