"""UNet2DCondition — the noise predictor, TPU-native Flax/NHWC.

Owns the role the reference delegates to ``diffusers.UNet2DConditionModel`` /
``FlaxUNet2DConditionModel`` (reference ``stable_diffusion_pipeline.py:11,418``;
``flax_stable_diffusion_pipeline.py:12,274-279``) — ~860M params, called
2x batch per denoise step under CFG: THE hot kernel (SURVEY.md §2.2).

Architecture = SD 1.x: conv_in, sinusoidal+MLP time embedding, 3 cross-attn
down blocks + 1 plain down block, cross-attn mid block, mirrored up path with
skip concatenation, GN+SiLU+conv_out.  Config-driven so tiny CPU-testable
variants share every code path with the full 860M model.
"""

from __future__ import annotations

from typing import Tuple, Union

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from .layers import (Downsample2D, GroupNorm32, ResnetBlock2D,
                     SpatialTransformer, TimestepEmbedMLP, Upsample2D,
                     conv_padding, timestep_embedding)


@flax.struct.dataclass
class UNetConfig:
    sample_size: int = flax.struct.field(pytree_node=False, default=64)
    in_channels: int = flax.struct.field(pytree_node=False, default=4)
    out_channels: int = flax.struct.field(pytree_node=False, default=4)
    block_out_channels: Tuple[int, ...] = flax.struct.field(
        pytree_node=False, default=(320, 640, 1280, 1280))
    layers_per_block: int = flax.struct.field(pytree_node=False, default=2)
    cross_attention_dim: int = flax.struct.field(pytree_node=False, default=768)
    #: int (all levels) or per-level tuple.  diffusers naming quirk: this
    #: field holds the NUMBER OF HEADS (SD1.x: 8 everywhere; SD2.x:
    #: (5,10,20,20) = 64 channels per head at every level)
    attention_head_dim: Union[int, Tuple[int, ...]] = flax.struct.field(
        pytree_node=False, default=8)
    # which resolution levels carry cross-attention transformers
    # (SD1.x: all but the deepest)
    attn_levels: Tuple[bool, ...] = flax.struct.field(
        pytree_node=False, default=(True, True, True, False))
    #: transformer blocks per spatial transformer: int (all levels) or a
    #: per-level tuple (SDXL: (0, 2, 10); the mid block uses the deepest)
    transformer_depth: Union[int, Tuple[int, ...]] = flax.struct.field(
        pytree_node=False, default=1)
    flip_sin_to_cos: bool = flax.struct.field(pytree_node=False, default=True)
    freq_shift: float = flax.struct.field(pytree_node=False, default=0.0)
    #: SDXL "text_time" micro-conditioning: sinusoidal dim for each of the 6
    #: size/crop scalars (None = no addition embedding, SD1/2 behaviour)
    addition_embed_dim: Union[int, None] = flax.struct.field(
        pytree_node=False, default=None)
    #: width of the pooled text embedding concatenated before the addition
    #: MLP (SDXL: 1280 from the OpenCLIP-bigG tower)
    addition_pooled_dim: Union[int, None] = flax.struct.field(
        pytree_node=False, default=None)
    #: number of micro-conditioning scalars: 6 for SDXL-base
    #: (orig_h, orig_w, crop_t, crop_l, target_h, target_w), 5 for the
    #: refiner (crop + aesthetic score instead of target size)
    addition_num_ids: int = flax.struct.field(pytree_node=False, default=6)

    def heads(self, level: int) -> int:
        h = self.attention_head_dim
        return h if isinstance(h, int) else h[level]

    def depth(self, level: int) -> int:
        d = self.transformer_depth
        return d if isinstance(d, int) else d[level]

    @classmethod
    def sd_v1(cls):
        """SD v1.1-v1.5 geometry (CompVis/stable-diffusion-v1-4 et al.)."""
        return cls()

    @classmethod
    def sd_v2(cls, sample_size: int = 64):
        """SD v2.x geometry (stabilityai/stable-diffusion-2-1-base et al.):
        OpenCLIP-H context (1024) and 64-channel heads per level.  Pass
        ``sample_size=96`` for the 768-v checkpoints (v_prediction comes
        from the scheduler config)."""
        return cls(sample_size=sample_size, cross_attention_dim=1024,
                   attention_head_dim=(5, 10, 20, 20))

    @classmethod
    def sd_xl(cls):
        """SDXL-base geometry (stabilityai/stable-diffusion-xl-base-1.0):
        3 levels, no attention at level 0, transformer depths (0, 2, 10),
        64-channel heads, dual-tower context (768+1280=2048), and the
        "text_time" addition embedding — 6 size/crop micro-conditioning
        scalars sinusoidally embedded at 256 each + the 1280-wide pooled
        text embedding, projected into the time embedding
        (2816 = 1280 + 6x256)."""
        return cls(sample_size=128, block_out_channels=(320, 640, 1280),
                   cross_attention_dim=2048,
                   attention_head_dim=(5, 10, 20),
                   attn_levels=(False, True, True),
                   transformer_depth=(0, 2, 10),
                   addition_embed_dim=256, addition_pooled_dim=1280)

    @classmethod
    def sd_xl_refiner(cls):
        """SDXL-refiner geometry (stabilityai/stable-diffusion-xl-refiner):
        4 levels at (384, 768, 1536, 1536) with attention only on the middle
        two, depth-4 transformers, bigG-only context (1280), and the 5-id
        text_time conditioning (aesthetic score replaces target size;
        2560 = 1280 pooled + 5x256).  Head counts are channels/64 — real
        checkpoints load through ``_unet_config_from_json``, which derives
        the geometry from the shipped config.json rather than this
        constructor."""
        return cls(sample_size=128, block_out_channels=(384, 768, 1536, 1536),
                   cross_attention_dim=1280,
                   attention_head_dim=(6, 12, 24, 24),
                   attn_levels=(False, True, True, False),
                   transformer_depth=(0, 4, 4, 0),
                   addition_embed_dim=256, addition_pooled_dim=1280,
                   addition_num_ids=5)

    @classmethod
    def tiny(cls):
        """CPU-runnable config for tests; same code paths, ~0.5M params."""
        return cls(sample_size=8, block_out_channels=(32, 64),
                   layers_per_block=1, cross_attention_dim=32,
                   attention_head_dim=2, attn_levels=(True, False))

    @classmethod
    def tiny_xl(cls):
        """CPU-runnable SDXL-flavoured config: exercises per-level
        transformer depth and the text_time addition embedding."""
        return cls(sample_size=8, block_out_channels=(32, 64),
                   layers_per_block=1, cross_attention_dim=32,
                   attention_head_dim=2, attn_levels=(False, True),
                   transformer_depth=(0, 2),
                   addition_embed_dim=8, addition_pooled_dim=16)


def fourier_lowpass_scale(x: jax.Array, threshold: int,
                          scale: float) -> jax.Array:
    """Scale the lowest spatial frequencies of (B, H, W, C) by ``scale``.

    FreeU's skip-feature filter (Si et al. 2023 §3.2): FFT over the spatial
    axes, multiply the centred (2*threshold)^2 low-frequency box by
    ``scale``, inverse FFT.  Runs in float32 (XLA:TPU FFTs are f32) at the
    8-32px latent resolutions where FreeU applies — negligible cost."""
    import numpy as _np
    b, h, w, c = x.shape
    freq = jnp.fft.fftshift(jnp.fft.fft2(x.astype(jnp.float32),
                                         axes=(1, 2)), axes=(1, 2))
    mask = _np.ones((1, h, w, 1), _np.float32)
    mask[:, h // 2 - threshold:h // 2 + threshold,
         w // 2 - threshold:w // 2 + threshold] = scale
    freq = freq * mask
    out = jnp.fft.ifft2(jnp.fft.ifftshift(freq, axes=(1, 2)), axes=(1, 2))
    return jnp.real(out).astype(x.dtype)


class UNet2DCondition(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    tiled: bool = False
    #: FreeU (Si et al. 2023) backbone/skip re-weighting — (b1, b2, s1, s2)
    #: applied at the two deepest up blocks, or None (off).  Training-free
    #: quality boost for real checkpoints; static (changing it recompiles).
    freeu: Union[Tuple[float, float, float, float], None] = None
    #: ToMe-SD token merging (ops/tome.py) — (ratio, max_level) applied to
    #: self-attention at resolution levels <= max_level, or None (off).
    #: Static (changing it recompiles); composable with step caching.
    tome: Union[Tuple[float, int], None] = None

    @nn.compact
    def __call__(self, sample: jax.Array, timesteps: jax.Array,
                 encoder_hidden_states: jax.Array,
                 text_embeds: jax.Array = None,
                 time_ids: jax.Array = None, *,
                 cache_split: int = None,
                 deep_feature: jax.Array = None,
                 ctrl_down: tuple = None, ctrl_mid: jax.Array = None,
                 ip_context: jax.Array = None, ip_scale=1.0):
        """sample: (B,H,W,C) latents; timesteps: (B,) or scalar;
        encoder_hidden_states: (B, S, cross_attention_dim). Returns (B,H,W,C).

        SDXL micro-conditioning (``addition_embed_dim`` set): ``text_embeds``
        is the (B, addition_pooled_dim) pooled text embedding and ``time_ids``
        the (B, 6) original-size/crop/target-size scalars.

        DeepCache-style step caching (``cache_split=s``): the return value
        becomes ``(eps, deep)`` where ``deep`` is the trunk activation right
        after ``up_{s}_upsample``.  Passing that tensor back as
        ``deep_feature`` on a later step runs ONLY the shallow levels
        (0..s-1 down + up) and splices the cached trunk in — adjacent
        denoise steps change the deep features slowly, so reusing them
        trades a small approximation for skipping the mid/deep blocks
        (Ma et al. 2023, "DeepCache"; cf. PAPERS.md step-coherence line).

        ControlNet conditioning (``ctrl_down``/``ctrl_mid``): per-skip
        residuals from ``models/controlnet.py`` added to the down-path skip
        connections and the mid-block output.  Incompatible with the
        shallow step-cache pass (the deep skips don't exist there).

        IP-Adapter image prompting (``ip_context``): (B, T, D) projected
        image tokens routed to every cross-attention's decoupled
        ``to_k_ip``/``to_v_ip`` projections, summed at ``ip_scale``
        (models/ip_adapter.py; params spliced at load)."""
        cfg = self.config
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        n_levels = len(cfg.block_out_channels)

        # time embedding
        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0],
                                   cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = TimestepEmbedMLP(cfg.block_out_channels[0] * 4,
                                dtype=self.dtype,
                                name="time_embedding")(t_emb.astype(self.dtype))
        if cfg.addition_embed_dim is not None:
            # SDXL "text_time": each of the 6 conditioning scalars gets its
            # own sinusoidal embedding; concat with the pooled text embedding
            # and project through the same MLP shape as the time embedding
            if text_embeds is None or time_ids is None:
                raise ValueError("this UNet config requires text_embeds and "
                                 "time_ids (SDXL text_time conditioning)")
            b = sample.shape[0]
            ids_emb = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_embed_dim,
                cfg.flip_sin_to_cos, cfg.freq_shift).reshape(b, -1)
            add = jnp.concatenate(
                [text_embeds.astype(jnp.float32), ids_emb], axis=-1)
            temb = temb + TimestepEmbedMLP(
                cfg.block_out_channels[0] * 4, dtype=self.dtype,
                name="add_embedding")(add.astype(self.dtype))

        if cache_split is not None and not 1 <= cache_split <= n_levels - 1:
            raise ValueError(f"cache_split must be in [1, {n_levels - 1}]")
        shallow = deep_feature is not None
        if shallow and cache_split is None:
            raise ValueError("deep_feature requires cache_split")

        ctx = encoder_hidden_states.astype(self.dtype)
        if ip_context is not None:
            # tuple context = decoupled image-token attention in every
            # cross-attn block (layers.CrossAttention unpacks it)
            ctx = (ctx, ip_context.astype(self.dtype),
                   jnp.asarray(ip_scale, self.dtype))
        x = sample.astype(self.dtype)
        x = nn.Conv(cfg.block_out_channels[0], (3, 3),
                    padding=conv_padding(self.tiled), dtype=self.dtype,
                    name="conv_in")(x)

        def tome_ratio(level):
            # ToMe only where tokens are redundant (high resolution); the
            # 8x8-token deep levels would lose real information
            if self.tome is None:
                return 0.0
            r, max_level = self.tome
            return r if level <= max_level else 0.0

        # ---- down path (shallow pass: only levels below the split; the
        # split-1 downsample feeds only the cached deep trunk, so skip it) --
        skips = [x]
        down_levels = cache_split if shallow else n_levels
        for level in range(down_levels):
            ch = cfg.block_out_channels[level]
            is_last = level == n_levels - 1
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, dtype=self.dtype, tiled=self.tiled,
                                  name=f"down_{level}_res_{j}")(x, temb)
                if cfg.attn_levels[level]:
                    heads = cfg.heads(level)
                    x = SpatialTransformer(
                        heads, ch // heads, depth=cfg.depth(level),
                        dtype=self.dtype, tome_ratio=tome_ratio(level),
                        name=f"down_{level}_attn_{j}")(x, ctx)
                skips.append(x)
            if not is_last and not (shallow and level == cache_split - 1):
                x = Downsample2D(ch, dtype=self.dtype, tiled=self.tiled,
                                 name=f"down_{level}_downsample")(x)
                skips.append(x)

        if ctrl_down is not None:
            if shallow:
                raise ValueError("ControlNet residuals cannot combine with "
                                 "the shallow step-cache pass")
            if len(ctrl_down) != len(skips):
                raise ValueError(f"expected {len(skips)} ControlNet down "
                                 f"residuals, got {len(ctrl_down)}")
            skips = [s + r.astype(self.dtype)
                     for s, r in zip(skips, ctrl_down)]

        # ---- mid (deep trunk; skipped when reusing the cache) ----
        if not shallow:
            mid_ch = cfg.block_out_channels[-1]
            mid_heads = cfg.heads(n_levels - 1)
            x = ResnetBlock2D(mid_ch, dtype=self.dtype, tiled=self.tiled,
                              name="mid_res_0")(x, temb)
            x = SpatialTransformer(mid_heads, mid_ch // mid_heads,
                                   depth=cfg.depth(n_levels - 1),
                                   dtype=self.dtype, name="mid_attn")(x, ctx)
            x = ResnetBlock2D(mid_ch, dtype=self.dtype, tiled=self.tiled,
                              name="mid_res_1")(x, temb)
            if ctrl_mid is not None:
                x = x + ctrl_mid.astype(self.dtype)
        else:
            x = deep_feature.astype(self.dtype)

        # ---- up path (mirrored, skip concat) ----
        deep_out = None
        for level in reversed(range(n_levels)):
            if shallow and level >= cache_split:
                continue
            ch = cfg.block_out_channels[level]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                up_idx = n_levels - 1 - level  # 0 = deepest up block
                if self.freeu is not None and up_idx in (0, 1):
                    b1, b2, s1, s2 = self.freeu
                    b, s = (b1, s1) if up_idx == 0 else (b2, s2)
                    # amplify the low-half backbone channels, damp the
                    # skip's low spatial frequencies (FreeU)
                    half = x.shape[-1] // 2
                    x = jnp.concatenate(
                        [x[..., :half] * jnp.asarray(b, x.dtype),
                         x[..., half:]], axis=-1)
                    skip = fourier_lowpass_scale(skip, 1, s)
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlock2D(ch, dtype=self.dtype, tiled=self.tiled,
                                  name=f"up_{level}_res_{j}")(x, temb)
                if cfg.attn_levels[level]:
                    heads = cfg.heads(level)
                    x = SpatialTransformer(
                        heads, ch // heads, depth=cfg.depth(level),
                        dtype=self.dtype, tome_ratio=tome_ratio(level),
                        name=f"up_{level}_attn_{j}")(x, ctx)
            if level != 0:
                x = Upsample2D(ch, dtype=self.dtype, tiled=self.tiled,
                               name=f"up_{level}_upsample")(x)
            if (cache_split is not None and not shallow
                    and level == cache_split):
                deep_out = x  # trunk output entering level split-1

        x = GroupNorm32(32, dtype=self.dtype, name="conv_norm_out")(x,
                                                                     silu=True)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=conv_padding(self.tiled),
                    dtype=self.dtype, name="conv_out")(x)
        eps = x.astype(jnp.float32)
        if cache_split is None:
            return eps
        return eps, (deep_feature.astype(self.dtype) if shallow
                     else deep_out)
