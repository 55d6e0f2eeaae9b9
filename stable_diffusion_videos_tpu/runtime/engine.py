"""The denoise engine — one sharded XLA program per walk dispatch.

The reference's flax path compiles the 50-step CFG loop into one program via
``fori_loop`` under ``pmap`` (``flax_stable_diffusion_pipeline.py:259-316,
898-927``).  This engine keeps that property and extends it TPU-first:

* text-embed -> CFG scan -> scheduler step -> VAE decode is ONE jitted,
  mesh-sharded program (``lax.scan`` over host-precomputed scheduler tables);
  the host only sees finished frames.
* frames shard over the mesh ``data`` axis via ``NamedSharding`` (pjit) — no
  pmap, no host-side shard/unshard reshapes, params replicated by sharding
  spec.
* compiled programs are cached per (scheduler, steps, h, w, batch-bucket);
  guidance scale, eta (through the tables), and PRNG keys are traced — they
  never retrigger compilation.  Batch bucketing bounds recompiles the same
  way the reference's static pmap argnums did (``:898-902``) but without a
  new compile per shape: batches pad up to the bucket.
* ``denoise_frames_async`` returns the device array immediately so video
  encode of batch N overlaps the denoise dispatch of batch N+1.
"""

from __future__ import annotations

import logging
import threading
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.schedulers import get_scheduler
from ..core.schedulers.base import SchedTables
from ..models.bundle import SDModels
from ..models.safety import preprocess_for_safety
from ..models.vae import AutoencoderKL
from ..parallel.mesh import (batch_sharding, data_parallel_size, make_mesh,
                             pad_to_multiple, replicate, replicated)

logger = logging.getLogger("sdv_tpu")

# re-exported for compatibility; lives in utils so model-building paths
# (which run before any Engine exists) enable the cache too
from ..utils.compile_cache import enable_compile_cache  # noqa: E402,F401


def apply_guidance(eps_u: jax.Array, eps_c: jax.Array, guidance,
                   rescale: float = 0.0) -> jax.Array:
    """Classifier-free-guidance combine, optionally std-rescaled.

    ``rescale`` > 0 blends toward the variance-corrected estimate of
    Lin et al. 2024 ("Common Diffusion Noise Schedules and Sample Steps are
    Flawed" §3.4): CFG inflates the noise prediction's std by roughly the
    guidance scale, which over-exposes zero-SNR v-prediction models; the fix
    rescales the combined prediction's per-sample std back to the
    conditional branch's and mixes with weight ``rescale`` (0.7 in the
    paper).  ``rescale`` is a Python float baked into the program."""
    eps = eps_u + guidance * (eps_c - eps_u)
    if rescale > 0.0:
        ax = tuple(range(1, eps.ndim))
        std_c = jnp.std(eps_c, axis=ax, keepdims=True)
        std_cfg = jnp.std(eps, axis=ax, keepdims=True)
        eps = rescale * (eps * std_c / (std_cfg + 1e-8)) \
            + (1.0 - rescale) * eps
    return eps


class Engine:
    def __init__(self, models: SDModels, mesh=None, scheduler: str = "pndm",
                 batch_bucket: Optional[int] = None,
                 debug: Optional[bool] = None,
                 vae_tile: Optional[int] = None, vae_tile_overlap: int = 16,
                 spatial_shard: bool = False,
                 step_cache: Optional[int] = None,
                 step_cache_split: int = 1,
                 step_cache_policy: str = "uniform",
                 guidance_rescale: float = 0.0,
                 guidance_interval: Optional[tuple] = None,
                 frozen_noise: bool = False,
                 tiny_decoder: bool = False,
                 controlnet=None, ip_adapter=None):
        #: IP-Adapter image prompting (models/ip_adapter.py): decoupled K/V
        #: kernels are spliced into the UNet param tree up front, and the
        #: projected image tokens ride into every program as two extra
        #: ``added`` operands (uncond rows = projection of a zero embed)
        enable_compile_cache()
        self.ip = ip_adapter
        if ip_adapter is not None:
            models = ip_adapter.splice(models)
        self.models = models
        self.mesh = mesh if mesh is not None else make_mesh()
        #: debug=True swaps the fused lax.scan for a per-step python loop so
        #: intermediate latents are inspectable (the reference's module-level
        #: DEBUG flag, flax_stable_diffusion_pipeline.py:34-35); also via
        #: SDV_DEBUG=1
        import os as _os
        self.debug = (debug if debug is not None
                      else _os.environ.get("SDV_DEBUG", "") == "1")
        self.scheduler_name = scheduler
        self.sched = get_scheduler(scheduler)
        #: dispatch batches are padded up to a multiple of this (defaults to
        #: the data-parallel size) to bound recompilation
        self.batch_bucket = batch_bucket or data_parallel_size(self.mesh)
        if self.mesh.shape.get("model", 1) > 1:
            # Megatron-style TP over the model axis (parallel/tp.py); XLA
            # SPMD propagation inserts the psum collectives
            from ..parallel.tp import shard_params
            self._params, self._param_shardings = shard_params(
                self.mesh, models.params)
        else:
            self._params = replicate(self.mesh, models.params)
            self._param_shardings = jax.tree.map(
                lambda _: replicated(self.mesh), self._params)
        #: decode in overlapping latent-space tiles of this side length
        #: (enables >512^2 frames within HBM; None = whole-frame decode
        #: fused into the denoise program)
        self.vae_tile = vae_tile
        self.vae_tile_overlap = vae_tile_overlap
        #: decode through the TAESD tiny decoder (models/taesd.py) instead
        #: of the KL decoder — ~70x fewer decode FLOPs, the dominant lever
        #: at few-step operating points (LCM-4: decode is ~50% of frame
        #: cost).  Opt-in quality trade; needs SDModels.with_taesd weights.
        #: The tiny decode always fuses into the program whole-frame
        #: (vae_tile then only governs the ENCODE side of img2img paths —
        #: at 1/70th the FLOPs and no attention, even 2048^2 tiny decodes
        #: fit where the KL decoder needed tiling).
        self.tiny_decoder = bool(tiny_decoder)
        if self.tiny_decoder and models.taesd_decoder() is None:
            raise ValueError(
                "tiny_decoder=True requires TAESD weights on the bundle — "
                "models = models.with_taesd(path_or_(config, params)); see "
                "models/taesd.py")
        #: DeepCache-style step caching: recompute the deep UNet trunk only
        #: every ``step_cache`` steps, splicing the cached trunk into
        #: shallow-only passes in between (opt-in approximation — adjacent
        #: denoise steps change deep features slowly).  ``step_cache_split``
        #: is the resolution level the trunk is cached at.
        if step_cache is not None and step_cache < 1:
            raise ValueError("step_cache must be >= 1 (None = off)")
        self.step_cache = step_cache
        self.step_cache_split = step_cache_split
        #: full-trunk step PLACEMENT: "uniform" recomputes every k-th step;
        #: "ends" keeps the SAME full-trunk budget (ceil(n/k) recomputes per
        #: segment) but concentrates them at the segment boundaries — deep
        #: features change fastest at the high-noise start and the
        #: fine-detail end of the schedule, slowest mid-schedule (the
        #: DeepCache paper's non-uniform 1/sqrt-center sampling, Ma et al.
        #: 2023 §4.2) — so mid-schedule splices stretch further at equal
        #: FLOPs
        if step_cache_policy not in ("uniform", "ends"):
            raise ValueError("step_cache_policy must be 'uniform' or 'ends'")
        self.step_cache_policy = step_cache_policy
        #: std-rescaled CFG (Lin et al. 2024; see ``apply_guidance``) —
        #: 0.0 = plain CFG, 0.7 = the paper's setting for zero-SNR models
        if not 0.0 <= guidance_rescale <= 1.0:
            raise ValueError("guidance_rescale must be in [0, 1]")
        self.guidance_rescale = float(guidance_rescale)
        #: limited-interval CFG (Kynkäänniemi et al. 2024, "Applying
        #: Guidance in a Limited Interval..."): run the CFG pair only for
        #: loop steps with fraction in [lo, hi); outside the interval ONLY
        #: the conditional branch runs — a real FLOP cut (the UNet batch
        #: halves), not an approximation of the combine.  The scan splits
        #: into up to three statically-shaped segments so XLA keeps one
        #: fused program.  (0, 1) or None = plain CFG everywhere.
        if guidance_interval is not None:
            lo, hi = (float(guidance_interval[0]),
                      float(guidance_interval[1]))
            if not 0.0 <= lo <= hi <= 1.0:
                raise ValueError("guidance_interval must satisfy "
                                 "0 <= lo <= hi <= 1")
            guidance_interval = (lo, hi) if (lo, hi) != (0.0, 1.0) else None
        self.guidance_interval = guidance_interval
        #: broadcast ONE stochastic-transition noise field across the batch
        #: (lcm / euler_ancestral / ddim eta>0): a walk dispatch batches
        #: adjacent frames of one trajectory, where per-frame transition
        #: noise reads as temporal flicker (core/schedulers/base.py
        #: ``transition_noise``; vid2vid's frozen re-noising analogue)
        self.frozen_noise = bool(frozen_noise)
        #: sequence/spatial parallelism (SURVEY.md §5.7 stretch): constrain
        #: the latent's W axis onto the mesh `model` axis — XLA SPMD
        #: partitions the convs with halo exchanges and the attention with
        #: all-gathers, scaling a SINGLE frame beyond one chip's HBM
        self.spatial_shard = spatial_shard and self.mesh.shape.get(
            "model", 1) > 1
        #: optional ControlNetBundle (or list of them — multi-ControlNet,
        #: e.g. canny+depth): dispatches that pass ``control=`` run each
        #: net's down+mid trunk per step and inject the summed residuals
        #: into the UNet's skips (spatially-conditioned walks)
        if controlnet is not None and not isinstance(controlnet,
                                                     (list, tuple)):
            controlnet = [controlnet]
        self.controlnet = list(controlnet) if controlnet else None
        if self.controlnet:
            for cn in self.controlnet:
                if cn.pixel_factor != self.models.vae_scale_factor:
                    raise ValueError(
                        f"ControlNet conditioning embedding downsamples "
                        f"{cn.pixel_factor}x but the VAE factor is "
                        f"{self.models.vae_scale_factor}x")
                if (cn.config.cross_attention_dim
                        != self.models.unet_config.cross_attention_dim):
                    raise ValueError("ControlNet cross_attention_dim does "
                                     "not match the bundle's UNet")
            self._params = dict(self._params)
            self._params["controlnet"] = [replicate(self.mesh, cn.params)
                                          for cn in self.controlnet]
            self._param_shardings = dict(self._param_shardings)
            self._param_shardings["controlnet"] = jax.tree.map(
                lambda _: replicated(self.mesh),
                self._params["controlnet"])
        self._tile_decode_fn = None
        self._decode_fn = None
        self._encode_fn = None
        self._compiled: dict[tuple, Any] = {}
        self._tables_cache: dict[tuple, Any] = {}
        self._cache_lock = threading.Lock()  # server threads share an engine
        self._embed_fn = None
        self._safety_fn = None
        self._ip_uncond = None
        from collections import OrderedDict
        self._embed_cache: "OrderedDict[tuple, jax.Array]" = OrderedDict()

    # ------------------------------------------------------------------
    # sampler switching
    # ------------------------------------------------------------------
    def set_scheduler(self, name: str) -> None:
        """Switch the sampler on a live engine (UI dropdowns / server
        requests).  Compiled programs and scheduler tables are keyed by
        sampler name, so previously-compiled programs SURVIVE the switch
        (prewarmed samplers stay hot); concurrent dispatches snapshot
        (name, sched) atomically at entry, so a request started under the
        old sampler completes under it — never a mix of new program + old
        tables (the r4 ADVICE race)."""
        if name == self.scheduler_name:
            return
        sched = get_scheduler(name)  # raises KeyError before any mutation
        with self._cache_lock:
            self.scheduler_name = name
            self.sched = sched

    def _sched_snapshot(self):
        """(name, sched) read atomically — every dispatch uses ONE sampler
        end-to-end even if set_scheduler runs concurrently."""
        with self._cache_lock:
            return self.scheduler_name, self.sched

    # ------------------------------------------------------------------
    # text embedding
    # ------------------------------------------------------------------
    def embed_text(self, text, negative_prompt=None) -> jax.Array:
        """Prompt(s) -> (B, 77, D) hidden states (cf. reference ``embed_text``,
        ``stable_diffusion_pipeline.py:809-820``).  For SDXL bundles D is the
        dual-tower concatenation (768+1280)."""
        return self._embed(text)[0]

    def embed_text_pooled(self, text) -> jax.Array:
        """SDXL: prompt(s) -> (B, Dp) projected pooled embedding (tower 2) —
        the text half of the text_time addition conditioning."""
        pooled = self._embed(text)[1]
        if pooled is None:
            raise ValueError("pooled embeddings require an SDXL bundle "
                             "(text_config_2)")
        return pooled

    def embed_text_weighted(self, text, num_chunks: Optional[int] = None
                            ) -> jax.Array:
        """Prompt(s) with A1111/compel emphasis syntax -> (B, 77*n, D).

        Long prompts span n > 1 CLIP windows (``core/prompt_weighting.py``);
        the per-window hidden states are weight-scaled (mean-preserving) and
        concatenated along the sequence axis.  Pass ``num_chunks`` to force
        a common context length across several calls (cond/uncond of one
        CFG dispatch must agree).  A weight-free short prompt returns
        exactly ``embed_text``'s output."""
        from ..core.prompt_weighting import apply_token_weights, \
            encode_weighted
        texts = [text] if isinstance(text, str) else list(text)
        key = ("__weighted__", num_chunks, *texts)
        with self._cache_lock:
            if key in self._embed_cache:
                self._embed_cache.move_to_end(key)
                return self._embed_cache[key]
        self._embed("")  # ensure self._embed_fn exists (uncond is cached)
        tok = self.models.tokenizer
        enc = [encode_weighted(tok, t, num_chunks=num_chunks)
               for t in texts]
        n = max(ids.shape[0] for ids, _ in enc)
        enc = [(ids, w) if ids.shape[0] == n
               else encode_weighted(tok, t, num_chunks=n)
               for (ids, w), t in zip(enc, texts)]
        ids = jnp.asarray(np.concatenate([i for i, _ in enc]))  # (B*n, 77)
        weights = np.concatenate([w for _, w in enc])
        if self.models.text_config_2 is not None:
            tok2 = self.models.tokenizer_2 or tok
            ids2 = jnp.asarray(np.concatenate(
                [encode_weighted(tok2, t, num_chunks=n)[0] for t in texts]))
            h, _ = self._embed_fn(self._params["text_encoder"],
                                  self._params["text_encoder_2"], ids, ids2)
        else:
            h, _ = self._embed_fn(self._params["text_encoder"], ids)
        h = apply_token_weights(h, weights)            # (B*n, 77, D)
        B = len(texts)
        out = jnp.reshape(h, (B, n * h.shape[1], h.shape[2]))
        with self._cache_lock:
            self._embed_cache[key] = out
            self._embed_cache.move_to_end(key)
            self._evict_embed_cache()
        return out

    def _embed(self, text):
        if self._embed_fn is None:
            enc = self.models.text_encoder()
            enc2 = self.models.text_encoder_2()
            rep = replicated(self.mesh)
            if enc2 is not None:
                # dual-tower concat only when the UNet context is sized for
                # it (SDXL-base: 768+1280=2048); the refiner conditions on
                # the bigG tower alone (cross_attention_dim=1280)
                dual = (self.models.unet_config.cross_attention_dim
                        == self.models.text_config.hidden_size
                        + self.models.text_config_2.hidden_size)

                def fn(p, p2, ids, ids2):
                    h2, pooled = enc2.apply(p2, ids2)
                    if not dual:
                        return h2.astype(jnp.float32), pooled
                    h1, _ = enc.apply(p, ids)
                    return jnp.concatenate(
                        [h1.astype(jnp.float32), h2.astype(jnp.float32)],
                        axis=-1), pooled
                self._embed_fn = jax.jit(fn, out_shardings=(rep, rep))
            else:
                f = jax.jit(lambda p, ids: enc.apply(p, ids)[0],
                            out_shardings=rep)
                self._embed_fn = lambda p, ids: (f(p, ids), None)
        texts = [text] if isinstance(text, str) else list(text)
        key = tuple(texts)
        with self._cache_lock:
            if key in self._embed_cache:
                self._embed_cache.move_to_end(key)  # LRU touch
                return self._embed_cache[key]
        ids = jnp.asarray(self.models.tokenizer(texts)["input_ids"])
        if self.models.text_config_2 is not None:
            tok2 = self.models.tokenizer_2 or self.models.tokenizer
            ids2 = jnp.asarray(tok2(texts)["input_ids"])
            out = self._embed_fn(self._params["text_encoder"],
                                 self._params["text_encoder_2"], ids, ids2)
        else:
            out = self._embed_fn(self._params["text_encoder"], ids)
        with self._cache_lock:
            self._embed_cache[key] = out
            self._embed_cache.move_to_end(key)
            self._evict_embed_cache()
        return self._embed_cache[key]

    def _evict_embed_cache(self):
        """LRU eviction (caller holds the lock), never the hot
        uncond/negative-prompt entry: ("",) is every CFG dispatch's uncond
        key — a clear-all here used to wipe it along with everything else."""
        while len(self._embed_cache) > 256:
            for old in self._embed_cache:
                if old != ("",):
                    del self._embed_cache[old]
                    break
            else:
                break

    # ------------------------------------------------------------------
    # the hot program
    # ------------------------------------------------------------------
    def _tables(self, num_inference_steps: int, eta: float,
                start_index: int = 0, sched_name=None, sched=None):
        if sched_name is None:
            sched_name, sched = self._sched_snapshot()
        key = (sched_name, num_inference_steps, float(eta), start_index,
               self.frozen_noise)
        with self._cache_lock:
            if key not in self._tables_cache:
                kwargs = {}
                if sched_name == "ddim":
                    kwargs["eta"] = float(eta)
                if start_index:
                    # warm-up samplers (pndm/lms/unipc): tables built for
                    # the truncated schedule, multistep warm-up replayed at
                    # the entry point (img2img mid-schedule entry)
                    kwargs["start_index"] = start_index
                entries = dict(sched.make_tables(
                    self.models.scheduler_config, num_inference_steps,
                    **kwargs))
                if self.frozen_noise:
                    # static metadata: stochastic samplers broadcast one
                    # transition-noise field across the batch (the flag
                    # keys the treedef, so each mode owns its program)
                    entries["frozen_noise"] = True
                self._tables_cache[key] = SchedTables(entries)
            return self._tables_cache[key]

    def _interval_segments(self, n_loop: int):
        """[(start, stop, cfg_on)] static loop segments implementing
        ``guidance_interval`` — CFG only where loop-fraction ∈ [lo, hi)."""
        if self.guidance_interval is None:
            return [(0, n_loop, True)]
        lo, hi = self.guidance_interval
        i0, i1 = int(round(lo * n_loop)), int(round(hi * n_loop))
        segs = [(0, i0, False), (i0, i1, True), (i1, n_loop, False)]
        return [(a, b, c) for a, b, c in segs if b > a]

    @staticmethod
    def _full_trunk_mask(segments, n_loop: int, k: int) -> "np.ndarray":
        """Boolean (n_loop,) mask of full-trunk steps for the "ends" policy.

        Budget matches uniform-k exactly — ceil(len/k) recomputes per
        guidance segment — but positions are warped toward the segment
        boundaries with f(u) = u - sin(2*pi*u)/(2*pi): point density is
        proportional to 1/f'(u) = 1/(1 - cos(2*pi*u)), i.e. dense at both
        ends, sparse mid-segment.  The segment's first step is always full
        (f(0) = 0), which the per-segment deep-carry init relies on."""
        import numpy as np
        mask = np.zeros(n_loop, bool)
        for a, b, _cfg in segments:
            ln = b - a
            m = -(-ln // k)
            if m >= ln:
                mask[a:b] = True
                continue
            u = np.linspace(0.0, 1.0, m, endpoint=False)
            warped = u - np.sin(2.0 * np.pi * u) / (2.0 * np.pi)
            idx = set(np.minimum(a + np.floor(warped * ln).astype(int),
                                 b - 1).tolist())
            # rounding collisions: top back up to the budget with the
            # unused indices nearest a segment end (where density belongs)
            spare = sorted((i for i in range(a, b) if i not in idx),
                           key=lambda i: min(i - a, b - 1 - i))
            for i in spare[:m - len(idx)]:
                idx.add(i)
            mask[sorted(idx)] = True
        return mask

    def _make_decode(self, out_u8: bool = False):
        """The latent->frame stage every fused program ends with: the KL
        decoder (reference ``stable_diffusion_pipeline.py:431-433``
        semantics — /scaling_factor, [-1,1]->[0,1]) or, with
        ``tiny_decoder=True``, the TAESD tiny decoder, which takes the
        sampler's SCALED latents directly and emits [0,1] (models/taesd.py
        conventions)."""
        if self.tiny_decoder:
            taesd = self.models.taesd_decoder()

            def decode(params, lat):
                imgs = taesd.apply(params["taesd_decoder"], lat)
                imgs = jnp.clip(imgs.astype(jnp.float32), 0.0, 1.0)
                if out_u8:
                    imgs = jnp.round(imgs * 255.0).astype(jnp.uint8)
                return imgs
            return decode
        vae = self.models.vae()
        scale = self.models.vae_config.scaling_factor

        def decode(params, lat):
            imgs = vae.apply(params["vae"], lat / scale,
                             method=AutoencoderKL.decode)
            imgs = jnp.clip(imgs.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
            if out_u8:
                # quantise ON DEVICE: frames leave the chip as 8-bit (what
                # PNG/video need anyway) — 4x less device->host traffic,
                # which measured as the walk bottleneck through the axon
                # tunnel (tools/demo_walk_r02.json: transfer > denoise)
                imgs = jnp.round(imgs * 255.0).astype(jnp.uint8)
            return imgs
        return decode

    def _build(self, batch: int, h: int, w: int, steps: int, ctx_len: int,
               out_u8: bool = False, with_ctrl: bool = False,
               guess_mode: bool = False, sched=None):
        sched = sched if sched is not None else self.sched
        unet = self.models.unet()
        ctrl_mods = ([cn.module(dtype=self.models.dtype,
                                tiled=self.models.tiled)
                      for cn in self.controlnet] if with_ctrl else None)

        spatial = None
        if self.spatial_shard:
            from jax.sharding import NamedSharding, PartitionSpec as P
            spatial = NamedSharding(self.mesh, P("data", None, "model", None))

        is_xl = self.models.is_xl
        with_ip = self.ip is not None
        cache_k = self.step_cache if not self.debug else None
        cache_split = self.step_cache_split if cache_k else None
        if with_ctrl and cache_k:
            raise ValueError("step_cache and ControlNet cannot combine: the "
                             "shallow cached pass has no deep skips to "
                             "inject residuals into")

        def body(params, context, added, ctrl, guidance, tables, carry, i,
                 cfg=True, seg_start=0, full_mask=None):
            # ``cfg`` is STATIC: False compiles a cond-only step (half the
            # UNet batch) for loop segments outside self.guidance_interval.
            # ``seg_start`` is the segment's first loop index: the step-cache
            # predicate is SEGMENT-relative so each guidance_interval segment
            # opens with a full-trunk pass — its deep carry (2B rows for CFG
            # segments, B rows cond-only) is freshly zero-initialised at the
            # segment boundary and must be recomputed before any splice.
            if cache_k:
                lat, st, deep = carry
            else:
                lat, st = carry
            t = sched.timestep(tables, i)
            inp = sched.scale_model_input(tables, st, i, lat)
            if cfg:
                inp2 = jnp.concatenate([inp, inp], axis=0)  # CFG 2x batch
                ctx = context
            else:
                inp2 = inp
                ctx = context[context.shape[0] // 2:]  # cond rows only
            if spatial is not None:
                inp2 = jax.lax.with_sharding_constraint(inp2, spatial)
            tb = jnp.broadcast_to(t, (inp2.shape[0],))

            def cond_rows(x):
                return x if cfg else x[x.shape[0] // 2:]

            ctrl_kw = {}
            if ctrl_mods is not None:
                # ControlNet trunk(s) per step, summed residuals into the
                # UNet skips; both CFG halves see the same control map(s)
                # (ctrl = ((map, scale), ...) — maps CFG-doubled to 2B rows).
                # guess_mode zeroes the uncond half's residuals so only the
                # conditional branch is steered (stronger structure at low
                # guidance, the published "guess mode" behaviour).
                down_sum, mid_sum = None, None
                for mod, p, (cmap, cscale) in zip(ctrl_mods,
                                                  params["controlnet"],
                                                  ctrl):
                    xl_kw = (dict(text_embeds=cond_rows(added[0]),
                                  time_ids=cond_rows(added[1]))
                             if is_xl and mod.config.addition_embed_dim
                             is not None else {})
                    down_r, mid_r = mod.apply(p, inp2, tb, ctx,
                                              cond_rows(cmap),
                                              conditioning_scale=cscale,
                                              **xl_kw)
                    if down_sum is None:
                        down_sum, mid_sum = list(down_r), mid_r
                    else:
                        down_sum = [a + b for a, b in zip(down_sum, down_r)]
                        mid_sum = mid_sum + mid_r
                if guess_mode and cfg:
                    half = inp2.shape[0] // 2
                    keep = jnp.concatenate([
                        jnp.zeros((half,), self.models.dtype),
                        jnp.ones((inp2.shape[0] - half,),
                                 self.models.dtype)])[:, None, None, None]
                    down_sum = [d * keep for d in down_sum]
                    mid_sum = mid_sum * keep
                ctrl_kw = dict(ctrl_down=tuple(down_sum), ctrl_mid=mid_sum)

            ip_kw = (dict(ip_context=cond_rows(added[-2]),
                          ip_scale=added[-1]) if with_ip else {})

            def call_unet(deep_feat):
                args = ((cond_rows(added[0]), cond_rows(added[1]))
                        if is_xl else ())
                return unet.apply(params["unet"], inp2, tb, ctx, *args,
                                  cache_split=cache_split,
                                  deep_feature=deep_feat, **ctrl_kw,
                                  **ip_kw)

            if cache_k:
                # full trunk on predicate steps; shallow splice in between.
                # uniform: every cache_k-th step of the segment; "ends":
                # the precomputed boundary-dense mask (same budget)
                pred = (full_mask[i] if full_mask is not None
                        else (i - seg_start) % cache_k == 0)
                eps, deep = jax.lax.cond(
                    pred,
                    lambda _: call_unet(None),
                    lambda _: call_unet(deep), None)
            else:
                eps = call_unet(None)
            if cfg:
                eps_u, eps_c = jnp.split(eps, 2, axis=0)
                eps = apply_guidance(eps_u, eps_c, guidance,
                                     self.guidance_rescale)
            st, lat = sched.step(tables, st, i, eps, lat)
            return (lat, st, deep) if cache_k else (lat, st)

        decode = self._make_decode(out_u8)

        tiled_vae = self.vae_tile is not None and not self.tiny_decoder

        def program(params, context, added, ctrl, latents, guidance, tables,
                    key):
            lat = latents * sched.init_noise_sigma(tables)
            state = sched.init_state(tables, latents.shape, key=key)
            n_loop = sched.num_loop_steps(tables)
            segments = self._interval_segments(n_loop)
            full_mask = None
            if cache_k and self.step_cache_policy == "ends":
                import numpy as _np
                full_mask = jnp.asarray(_np.asarray(
                    self._full_trunk_mask(segments, n_loop, cache_k)))
            carry = (lat, state)
            for a, b, cfg_on in segments:
                if cache_k:
                    # per-segment deep carry: 2B rows for CFG segments, B
                    # for cond-only; the segment-relative predicate in
                    # ``body`` guarantees step ``a`` recomputes the full
                    # trunk, so fresh zeros at the boundary are never read
                    ucfg = self.models.unet_config
                    f = 2 ** (cache_split - 1)
                    nb = (2 if cfg_on else 1) * latents.shape[0]
                    deep0 = jnp.zeros(
                        (nb, latents.shape[1] // f, latents.shape[2] // f,
                         ucfg.block_out_channels[cache_split]),
                        self.models.dtype)
                    carry = (carry[0], carry[1], deep0)
                carry, _ = jax.lax.scan(
                    lambda c, i, _cfg=cfg_on, _a=a: (
                        body(params, context, added, ctrl, guidance,
                             tables, c, i, cfg=_cfg, seg_start=_a,
                             full_mask=full_mask),
                        None),
                    carry, jnp.arange(a, b))
                carry = (carry[0], carry[1])
            lat = carry[0]
            if tiled_vae:
                return lat  # host drives tiled decode (decode_latents_tiled)
            return decode(params, lat)

        if self.debug:
            # per-step python loop: each step is its own dispatch and the
            # intermediate latents are observable via self.debug_latents
            import functools
            step_fns = {on: jax.jit(functools.partial(body, cfg=on))
                        for on in (True, False)}
            decode_fn = jax.jit(decode)

            def debug_program(params, context, added, ctrl, latents,
                              guidance, tables, key):
                lat = latents * sched.init_noise_sigma(tables)
                state = sched.init_state(tables, latents.shape, key=key)
                self.debug_latents = []
                for a, b, cfg_on in self._interval_segments(
                        sched.num_loop_steps(tables)):
                    for i in range(a, b):
                        lat, state = step_fns[cfg_on](
                            params, context, added, ctrl, guidance, tables,
                            (lat, state), jnp.int32(i))
                        self.debug_latents.append(lat)
                return decode_fn(params, lat)

            return debug_program

        bs = batch_sharding(self.mesh)
        rep = replicated(self.mesh)
        # shardings are pytree prefixes: one spec per whole subtree (params
        # carry their own full tree — TP-sharded or replicated).  ``added``
        # is () for SD1/2 or the (pooled, time_ids) pair for SDXL, both
        # batch-sharded; ``ctrl`` is () or one (CFG-doubled control map,
        # scale) pair per ControlNet.
        added_spec = ((bs, bs) if is_xl else ()) \
            + ((bs, rep) if with_ip else ())
        ctrl_spec = (tuple((bs, rep) for _ in self.controlnet)
                     if with_ctrl else ())
        return jax.jit(
            program,
            in_shardings=(self._param_shardings, bs, added_spec, ctrl_spec,
                          bs, rep, rep, rep),
            out_shardings=bs,
        )

    def _get_compiled(self, batch, h, w, steps, ctx_len,
                      out_u8: bool = False, with_ctrl: bool = False,
                      guess_mode: bool = False, sched_name=None, sched=None):
        if sched_name is None:
            sched_name, sched = self._sched_snapshot()
        # sampler name is part of the key: programs for different samplers
        # coexist, and a concurrent set_scheduler can never pair a program
        # built from one sampler with another's tables
        key = (sched_name, batch, h, w, steps, ctx_len, out_u8, with_ctrl,
               guess_mode)
        with self._cache_lock:
            if key not in self._compiled:
                logger.info("compiling denoise program %s", key)
                self._compiled[key] = self._build(*key[1:], sched=sched)
            return self._compiled[key]

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def _ip_args(self, pad, ip_tokens, ip_scale, B: int):
        """IP-Adapter operands for one dispatch: the CFG-stacked (2Bp, T, D)
        image tokens (uncond half = projection of a ZERO image embedding,
        the published formulation) and the traced scale.  With an adapter
        loaded but no image this dispatch, scale pins to 0 so the program
        shape stays stable across requests."""
        if self.ip is None:
            if ip_tokens is not None:
                raise ValueError("ip_tokens= passed but this Engine has no "
                                 "IP-Adapter (Engine(ip_adapter=...))")
            return ()
        if self._ip_uncond is None:
            # the zero-embed projection is a per-adapter constant — computed
            # once, not per dispatch (it is a host-side flax apply)
            self._ip_uncond = jnp.asarray(self.ip.uncond_tokens(),
                                          jnp.float32)
        un = self._ip_uncond
        if ip_tokens is None:
            cond, ip_scale = un, 0.0
        else:
            cond = jnp.asarray(ip_tokens, jnp.float32)
            if cond.ndim == 2:
                cond = cond[None]
        if cond.shape[0] == 1 and B > 1:
            cond = jnp.broadcast_to(cond, (B,) + cond.shape[1:])
        un = jnp.broadcast_to(un, cond.shape)
        bs = batch_sharding(self.mesh)
        ctx = jax.device_put(
            jnp.concatenate([pad(un), pad(cond)], axis=0), bs)
        return (ctx, jnp.float32(ip_scale))

    def _added_conds(self, pad, pooled, uncond_pooled, B: int, Bp: int,
                     h: int, w: int, ip_tokens=None, ip_scale=1.0):
        """SDXL text_time conditioning for one dispatch: the CFG-stacked
        pooled embeddings and the size/crop time_ids
        (orig_h, orig_w, 0, 0, target_h, target_w).  When the engine carries
        an IP-Adapter, the (image tokens, scale) pair is appended — indices
        0/1 stay the XL pair, -2/-1 the IP pair."""
        ip = self._ip_args(pad, ip_tokens, ip_scale, B)
        if not self.models.is_xl:
            return () + ip
        if pooled is None:
            raise ValueError("SDXL bundle: pass pooled= (see "
                             "embed_text_pooled)")
        if uncond_pooled is None:
            uncond_pooled = self.embed_text_pooled("")
        pooled = jnp.asarray(pooled)
        uncond_pooled = jnp.asarray(uncond_pooled)
        if uncond_pooled.shape[0] == 1 and B > 1:
            uncond_pooled = jnp.broadcast_to(uncond_pooled,
                                             (B,) + uncond_pooled.shape[1:])
        f = self.models.vae_scale_factor
        uc = self.models.unet_config
        if uc.addition_num_ids == 5:
            # SDXL-refiner: (orig_h, orig_w, crop_t, crop_l, aesthetic
            # score); per CFG half like upstream — 2.5 (negative aesthetic
            # score) for the uncond rows, 6.0 for the cond rows
            neg = jnp.asarray([h * f, w * f, 0, 0, 2.5], jnp.float32)
            pos = jnp.asarray([h * f, w * f, 0, 0, 6.0], jnp.float32)
            tids = jnp.concatenate([
                jnp.broadcast_to(neg, (Bp, 5)),
                jnp.broadcast_to(pos, (Bp, 5))], axis=0)
        else:
            base = [h * f, w * f, 0, 0, h * f, w * f]
            tids = jnp.broadcast_to(jnp.asarray(base, jnp.float32),
                                    (2 * Bp, uc.addition_num_ids))
        bs = batch_sharding(self.mesh)
        added = (jax.device_put(
            jnp.concatenate([pad(uncond_pooled), pad(pooled)], axis=0), bs),
            jax.device_put(tids, bs))
        return added + ip

    def _ctrl_args(self, pad, control, control_scale, B: int, h: int,
                   w: int):
        """ControlNet conditioning for one dispatch: one (CFG-doubled
        (2*Bp, H, W, 3) pixel-space map, residual scale) pair per net.

        ``control``: one map — (H, W, 3) or (B, H, W, 3) — for a single
        ControlNet, or a list of maps matching the engine's ControlNet
        list; ``control_scale``: float or per-net list."""
        if control is None:
            return ()
        if self.controlnet is None:
            raise ValueError("control= passed but this Engine has no "
                             "ControlNet (Engine(controlnet=...))")
        if self.step_cache:
            raise ValueError("control= cannot combine with step_cache "
                             "(no deep skips on the cached pass)")
        n = len(self.controlnet)
        maps = control if isinstance(control, (list, tuple)) else [control]
        if len(maps) != n:
            raise ValueError(f"this engine has {n} ControlNet(s) but got "
                             f"{len(maps)} control map(s)")
        scales = (list(control_scale)
                  if isinstance(control_scale, (list, tuple))
                  else [control_scale] * n)
        if len(scales) != n:
            raise ValueError(f"{len(scales)} control_scale values for "
                             f"{n} ControlNet(s)")
        f = self.models.vae_scale_factor
        bs = batch_sharding(self.mesh)
        out = []
        for cmap, cscale in zip(maps, scales):
            c = jnp.asarray(cmap, jnp.float32)
            if c.ndim == 3:
                c = c[None]
            if c.shape[1:] != (h * f, w * f, 3):
                raise ValueError(
                    f"control map must be (B, {h * f}, {w * f}, 3) at this "
                    f"dispatch's resolution, got {c.shape}")
            if c.shape[0] == 1 and B > 1:
                c = jnp.broadcast_to(c, (B,) + c.shape[1:])
            c = pad(c)
            out.append((jax.device_put(jnp.concatenate([c, c], axis=0), bs),
                        jnp.float32(cscale)))
        return tuple(out)

    def denoise_frames_async(self, cond, uncond, noise, *,
                             num_inference_steps: int = 50,
                             guidance_scale: float = 7.5, eta: float = 0.0,
                             key: Optional[jax.Array] = None,
                             output_dtype: str = "float32",
                             pooled=None, uncond_pooled=None,
                             control=None, control_scale=1.0,
                             guess_mode: bool = False,
                             ip_tokens=None, ip_scale=1.0):
        """Launch one sharded dispatch; returns (device_array, valid_batch).

        cond/uncond: (B, S, D) text embeddings; noise: (B, h, w, 4).
        The batch is padded to the bucket size; callers slice ``[:valid]``
        after transfer.  ``output_dtype="uint8"`` quantises frames on device
        (4x less transfer; ignored for tiled decode, which stays float).
        SDXL bundles additionally take ``pooled``/``uncond_pooled``
        (B, Dp) pooled text embeddings (``embed_text_pooled``).

        ``control``: pixel-space conditioning map(s) for the engine's
        ControlNet — (H, W, 3) or (B, H, W, 3) float in [0, 1] at the output
        resolution (a list of maps for multi-ControlNet engines); both CFG
        halves are conditioned.  ``control_scale`` weights the injected
        residuals per net (traced — no recompile).  ``guess_mode=True``
        steers only the conditional CFG branch (static — compiles its own
        program variant).
        """
        B = noise.shape[0]
        Bp = pad_to_multiple(max(B, self.batch_bucket), self.batch_bucket)
        if uncond.shape[0] == 1 and B > 1:
            uncond = jnp.broadcast_to(uncond, (B,) + uncond.shape[1:])

        def pad(x):
            if x.shape[0] == Bp:
                return jnp.asarray(x)
            padding = [(0, Bp - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(jnp.asarray(x), padding)

        from ..utils.profiling import trace as _trace
        cond_p, uncond_p, noise_p = pad(cond), pad(uncond), pad(noise)
        context = jnp.concatenate([uncond_p, cond_p], axis=0)
        # commit inputs to the batch sharding (embed outputs are replicated;
        # jit requires arg shardings to match its in_shardings exactly)
        bs = batch_sharding(self.mesh)
        context = jax.device_put(context, bs)
        noise_p = jax.device_put(noise_p, bs)
        h, w = noise.shape[1], noise.shape[2]
        added = self._added_conds(pad, pooled, uncond_pooled, B, Bp, h, w,
                                  ip_tokens=ip_tokens, ip_scale=ip_scale)
        ctrl = self._ctrl_args(pad, control, control_scale, B, h, w)
        sched_name, sched = self._sched_snapshot()
        tables = self._tables(num_inference_steps, eta,
                              sched_name=sched_name, sched=sched)
        out_u8 = output_dtype == "uint8" and (self.vae_tile is None
                                              or self.tiny_decoder)
        fn = self._get_compiled(Bp, h, w, num_inference_steps, cond.shape[1],
                                out_u8, with_ctrl=bool(ctrl),
                                guess_mode=guess_mode and bool(ctrl),
                                sched_name=sched_name, sched=sched)
        if key is None:
            key = jax.random.PRNGKey(0)
        with _trace("denoise_dispatch"):
            imgs = fn(self._params, context, added, ctrl, noise_p,
                      jnp.float32(guidance_scale), tables, key)
        if self.vae_tile is not None and not self.tiny_decoder:
            imgs = self.decode_latents_tiled(imgs)
        return imgs, B

    # ------------------------------------------------------------------
    # tiled VAE decode (>512^2 frames within HBM; cf. the reference's
    # reliance on RealESRGANer tiling for its big stage, upsampling.py:14,27)
    # ------------------------------------------------------------------
    def decode_latents(self, latents) -> np.ndarray:
        """(B, h, w, 4) scaled latents -> float32 [0,1] (B, H, W, 3) frames:
        one jitted whole-frame decode, or the overlapping-tile path when
        ``vae_tile`` is configured (standalone counterpart of the decode
        fused into the denoise program)."""
        if self.vae_tile is not None and not self.tiny_decoder:
            return self.decode_latents_tiled(latents)
        if self._decode_fn is None:
            self._decode_fn = jax.jit(self._make_decode())
        return np.asarray(self._decode_fn(self._params,
                                          jnp.asarray(latents)))

    def decode_latents_tiled(self, latents) -> np.ndarray:
        """(B, h, w, 4) raw latents -> (B, 8h, 8w, 3) float [0,1] images,
        decoded in overlapping latent tiles with linear seam blending."""
        tile, ov = self.vae_tile, self.vae_tile_overlap
        if self._tile_decode_fn is None:
            vae = self.models.vae()
            scale = self.models.vae_config.scaling_factor

            def dec(params, z):
                img = vae.apply(params["vae"], z / scale,
                                method=AutoencoderKL.decode)
                return jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0, 1)
            self._tile_decode_fn = jax.jit(dec)

        lat = np.asarray(latents)
        b, h, w, _ = lat.shape
        f = self.models.vae_scale_factor
        if h <= tile and w <= tile:
            return np.asarray(self._tile_decode_fn(self._params, latents))

        stride = tile - ov
        out = np.zeros((b, h * f, w * f, 3), np.float32)
        weight = np.zeros((1, h * f, w * f, 1), np.float32)

        def ramp(n_pix, lo_edge, hi_edge):
            r = np.ones(n_pix, np.float32)
            e = ov * f
            if lo_edge:
                r[:e] = np.linspace(0, 1, e, endpoint=False)
            if hi_edge:
                r[-e:] = np.linspace(1, 0, e)
            return r

        def positions(dim):
            # clamp the final tile back so every tile is exactly `tile` wide
            # -> a single compiled decode shape; sub-tile axes (non-square
            # frames) get one whole-axis tile
            if dim <= tile:
                return [0]
            pos = list(range(0, dim - tile + 1, stride))
            if pos[-1] != dim - tile:
                pos.append(dim - tile)
            return pos

        ty, tx = min(tile, h), min(tile, w)
        for y0 in positions(h):
            for x0 in positions(w):
                y1, x1 = y0 + ty, x0 + tx
                z = latents[:, y0:y1, x0:x1]
                img = np.asarray(self._tile_decode_fn(self._params, z))
                ry = ramp(img.shape[1], y0 > 0, y1 < h)
                rx = ramp(img.shape[2], x0 > 0, x1 < w)
                wmap = (ry[:, None] * rx[None, :])[None, :, :, None]
                out[:, y0 * f:y1 * f, x0 * f:x1 * f] += img * wmap
                weight[:, y0 * f:y1 * f, x0 * f:x1 * f] += wmap
        return out / np.maximum(weight, 1e-8)

    def denoise_frames(self, cond, uncond, noise, **kw) -> np.ndarray:
        """Blocking variant -> float32 numpy (B, H, W, 3) in [0, 1].

        Resilience the reference lacks (SURVEY.md §5.3): on HBM exhaustion
        the batch is split in half and retried, so an over-ambitious
        ``batch_size`` degrades to smaller dispatches instead of dying
        mid-walk."""
        try:
            imgs, valid = self.denoise_frames_async(cond, uncond, noise, **kw)
            return np.asarray(imgs)[:valid]
        except jax.errors.JaxRuntimeError as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or noise.shape[0] <= 1:
                raise
            B = noise.shape[0]
            half = max(1, B // 2)
            logger.warning("HBM exhausted at batch %d; retrying as %d+%d",
                           B, half, B - half)

            def part(x, sl):
                # slice batch-aligned arrays (pooled/uncond_pooled for SDXL,
                # per-frame control maps, ip_tokens); recurse into lists/
                # tuples (multi-ControlNet ``control=[...]`` — a per-net
                # float ``control_scale`` list passes through untouched);
                # leave scalars, keys and broadcast (1, ...) rows alone
                if isinstance(x, (list, tuple)):
                    return type(x)(part(e, sl) for e in x)
                if hasattr(x, "shape") and x.ndim >= 2 and x.shape[0] == B:
                    return x[sl]
                return x

            kw_lo = {k: part(v, slice(None, half)) for k, v in kw.items()}
            kw_hi = {k: part(v, slice(half, None)) for k, v in kw.items()}
            lo = self.denoise_frames(cond[:half], part(uncond, slice(None, half)),
                                     noise[:half], **kw_lo)
            hi = self.denoise_frames(cond[half:], part(uncond, slice(half, None)),
                                     noise[half:], **kw_hi)
            return np.concatenate([lo, hi])

    def warmup(self, *, num_inference_steps: int = 50,
               height: Optional[int] = None, width: Optional[int] = None,
               batches=(None,), output_dtype: str = "float32") -> float:
        """Precompile the denoise program(s) for the given shapes (serving
        cold-start elimination).  Returns seconds spent compiling.  Pass
        ``output_dtype="uint8"`` to prewarm the walk path's quantised
        program instead of the float one."""
        import time as _time
        height = height or self.models.default_size
        width = width or self.models.default_size
        f = self.models.vae_scale_factor
        c = self.models.unet_config.in_channels
        d = self.models.unet_config.cross_attention_dim
        t0 = _time.perf_counter()
        for b in batches:
            b = b or self.batch_bucket
            cond = jnp.zeros((b, 77, d))
            noise = jnp.zeros((b, height // f, width // f, c))
            kw = {}
            if self.models.is_xl:
                dp = self.models.unet_config.addition_pooled_dim
                kw = dict(pooled=jnp.zeros((b, dp)),
                          uncond_pooled=jnp.zeros((1, dp)))
            imgs, _ = self.denoise_frames_async(
                cond, cond[:1], noise,
                num_inference_steps=num_inference_steps,
                output_dtype=output_dtype, **kw)
            jax.block_until_ready(imgs)
        return _time.perf_counter() - t0

    # ------------------------------------------------------------------
    # img2img (beyond the reference's scope; natural engine extension)
    # ------------------------------------------------------------------
    #: samplers whose tables carry multistep warm-up history: mid-schedule
    #: entry REBUILDS their tables for the truncated schedule (warm-up
    #: replayed at the entry point) instead of slicing
    _WARMUP_SAMPLERS = ("pndm", "lms", "unipc")
    #: samplers whose noise parameterisation is the Karras sigma space
    #: (lat + sigma * noise) rather than sqrt-alpha epsilon space
    _SIGMA_SAMPLERS = ("euler", "euler_ancestral", "lms")

    def _sliced_tables(self, tables: SchedTables, k0: int,
                       sched_name=None, sched=None) -> SchedTables:
        """Drop the first ``k0`` loop steps (img2img starts mid-schedule).
        Valid for index-aligned-table samplers (ddim/euler/euler_ancestral/
        dpm/lcm); warm-up samplers go through ``_tables(start_index=)``
        instead (their history coefficients must be rebuilt, not sliced)."""
        if sched_name is None:
            sched_name, sched = self._sched_snapshot()
        if sched_name in self._WARMUP_SAMPLERS:
            raise AssertionError(
                f"{sched_name} tables must be rebuilt via "
                f"_tables(start_index=), not sliced")
        d = {}
        n_loop = sched.num_loop_steps(tables)
        for k, v in tables.items():
            if (hasattr(v, "shape") and v.ndim >= 1
                    and v.shape[0] in (n_loop, n_loop + 1)):
                d[k] = v[k0:]
            else:
                d[k] = v
        if sched_name == "dpm":
            # the first sliced step has no model-output history
            d["first_order"] = d["first_order"].at[0].set(True)
            d["h0"] = d["h0"].at[0].set(1.0)
        # the caller supplies an already-noised latent at the k0 noise level
        d["init_noise_sigma"] = jnp.float32(1.0)
        return SchedTables(d)

    def img2img(self, cond, uncond, init_latents, *, strength: float = 0.75,
                num_inference_steps: int = 50, guidance_scale: float = 7.5,
                eta: float = 0.0, key=None, pooled=None,
                uncond_pooled=None, control=None,
                control_scale=1.0, guess_mode: bool = False,
                noise=None, ip_tokens=None, ip_scale=1.0) -> np.ndarray:
        """Denoise from a noised version of ``init_latents`` (scaled VAE
        means, (B, h, w, 4)): ``strength`` in (0, 1] controls how much of the
        schedule runs (1.0 == full txt2img from noise).

        ``noise``: optional (1-or-B, h, w, 4) re-noising sample.  vid2vid
        passes ONE shared sample for every frame of a video so the noise
        field is temporally frozen — the dominant cheap lever for frame
        coherence in diffusion video stylisation."""
        if not 0.0 < strength <= 1.0:
            raise ValueError("strength must be in (0, 1]")
        sched_name, sched = self._sched_snapshot()
        tables = self._tables(num_inference_steps, eta,
                              sched_name=sched_name, sched=sched)
        if sched_name in self._WARMUP_SAMPLERS:
            # rebuild tables for the truncated schedule: the multistep
            # warm-up (PLMS re-eval / AB order ramp / UniPC corrector gate)
            # replays at the entry index, which is the correct mid-schedule
            # semantics — slicing would gather history that never ran.
            # k0 maps strength onto the PLAIN schedule (pndm's loop has a
            # +1 duplicated warm-up entry that strength must not count).
            k0 = min(num_inference_steps - 1,
                     int(round(num_inference_steps * (1.0 - strength))))
            sliced = dict(self._tables(num_inference_steps, eta,
                                       start_index=k0, sched_name=sched_name,
                                       sched=sched).items())
            # the caller supplies an already-noised latent at the k0 level
            sliced["init_noise_sigma"] = jnp.float32(1.0)
            sliced = SchedTables(sliced)
        else:
            n_loop = sched.num_loop_steps(tables)
            k0 = min(n_loop - 1, int(round(n_loop * (1.0 - strength))))
            sliced = self._sliced_tables(tables, k0, sched_name=sched_name,
                                         sched=sched)

        if key is None:
            key = jax.random.PRNGKey(0)
        key, knoise = jax.random.split(key)
        if noise is None:
            noise = jax.random.normal(knoise, init_latents.shape,
                                      jnp.float32)
        else:
            noise = jnp.broadcast_to(
                jnp.asarray(noise, jnp.float32),
                init_latents.shape)
        lat = jnp.asarray(init_latents, jnp.float32)
        if sched_name in self._SIGMA_SAMPLERS:
            sigma0 = sliced["sigmas"][0]
            noisy = lat + sigma0 * noise
        else:
            t0 = sliced["timesteps"][0].astype(jnp.int32)
            noisy = sched.add_noise(tables, lat, noise, t0)

        B = noisy.shape[0]
        Bp = pad_to_multiple(max(B, self.batch_bucket), self.batch_bucket)
        if uncond.shape[0] == 1 and B > 1:
            uncond = jnp.broadcast_to(uncond, (B,) + uncond.shape[1:])

        def pad(x):
            if x.shape[0] == Bp:
                return jnp.asarray(x)
            widths = [(0, Bp - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(jnp.asarray(x), widths)

        bs = batch_sharding(self.mesh)
        context = jax.device_put(
            jnp.concatenate([pad(uncond), pad(cond)], axis=0), bs)
        noisy_p = jax.device_put(pad(noisy), bs)
        h, w = noisy.shape[1], noisy.shape[2]
        added = self._added_conds(pad, pooled, uncond_pooled, B, Bp, h, w,
                                  ip_tokens=ip_tokens, ip_scale=ip_scale)
        ctrl = self._ctrl_args(pad, control, control_scale, B, h, w)
        fn = self._get_compiled(Bp, h, w,
                                ("img2img", num_inference_steps, k0),
                                cond.shape[1], with_ctrl=bool(ctrl),
                                guess_mode=guess_mode and bool(ctrl),
                                sched_name=sched_name, sched=sched)
        imgs = fn(self._params, context, added, ctrl, noisy_p,
                  jnp.float32(guidance_scale), sliced, key)
        if self.vae_tile is not None and not self.tiny_decoder:
            imgs = self.decode_latents_tiled(imgs)
        return np.asarray(imgs)[:B]

    def inpaint(self, cond, uncond, init_latents, mask, *,
                num_inference_steps: int = 50, guidance_scale: float = 7.5,
                eta: float = 0.0, key=None, pooled=None,
                uncond_pooled=None, ip_tokens=None,
                ip_scale=1.0) -> np.ndarray:
        """Masked generation: regenerate where ``mask``==1, keep the init
        image elsewhere by re-injecting the correctly-noised known region
        after every scheduler step (RePaint-style projection).

        init_latents: (B, h, w, 4) scaled VAE means; mask: (B, h, w, 1)
        float in [0, 1] at latent resolution.

        All 8 samplers are supported: the known-region projection reads
        per-index noise levels from the sigma grid (euler-family/lms) or
        ``timesteps[i+1]``+alphas_cumprod (the rest; pndm's duplicated
        warm-up entry makes that exactly the post-step level there too).
        With unipc the projection slightly lags the corrector (it refines
        the previous sample pre-projection) — standard RePaint-style
        approximation."""
        sched_name, sched = self._sched_snapshot()
        tables = self._tables(num_inference_steps, eta,
                              sched_name=sched_name, sched=sched)
        if key is None:
            key = jax.random.PRNGKey(0)

        B = init_latents.shape[0]
        Bp = pad_to_multiple(max(B, self.batch_bucket), self.batch_bucket)
        if uncond.shape[0] == 1 and B > 1:
            uncond = jnp.broadcast_to(uncond, (B,) + uncond.shape[1:])

        def pad(x):
            if x.shape[0] == Bp:
                return jnp.asarray(x)
            widths = [(0, Bp - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(jnp.asarray(x), widths)

        bs = batch_sharding(self.mesh)
        context = jax.device_put(
            jnp.concatenate([pad(uncond), pad(cond)], axis=0), bs)
        init_p = jax.device_put(pad(jnp.asarray(init_latents, jnp.float32)),
                                bs)
        mask_p = jax.device_put(pad(jnp.asarray(mask, jnp.float32)), bs)

        h, w = init_latents.shape[1], init_latents.shape[2]
        added = self._added_conds(pad, pooled, uncond_pooled, B, Bp, h, w,
                                  ip_tokens=ip_tokens, ip_scale=ip_scale)
        ckey = (sched_name, Bp, h, w, ("inpaint", num_inference_steps),
                cond.shape[1])
        with self._cache_lock:
            if ckey not in self._compiled:
                self._compiled[ckey] = self._build_inpaint(
                    Bp, h, w, sched_name=sched_name, sched=sched)
        fn = self._compiled[ckey]
        imgs = fn(self._params, context, added, init_p, mask_p,
                  jnp.float32(guidance_scale), tables, key)
        if self.vae_tile is not None and not self.tiny_decoder:
            imgs = self.decode_latents_tiled(imgs)
        return np.asarray(imgs)[:B]

    def _build_inpaint(self, batch: int, h: int, w: int,
                       sched_name=None, sched=None):
        if sched_name is None:
            sched_name, sched = self._sched_snapshot()
        unet = self.models.unet()
        # euler_ancestral's marginal level after step i is also sigmas[i+1]
        # (sqrt(sigma_down^2 + sigma_up^2) == sigma_next)
        sigma_space = sched_name in self._SIGMA_SAMPLERS

        def noised_known(tables, init, noise0, i):
            """The known region at loop-index i's POST-step noise level."""
            n_loop = sched.num_loop_steps(tables)
            last = i >= n_loop - 1
            if sigma_space:
                sigma_next = tables["sigmas"][i + 1]
                return init + sigma_next * noise0
            t_next = jnp.where(last, 0,
                               tables["timesteps"][jnp.minimum(i + 1,
                                                               n_loop - 1)])
            acp = tables["alphas_cumprod"][t_next.astype(jnp.int32)]
            noised = jnp.sqrt(acp) * init + jnp.sqrt(1 - acp) * noise0
            return jnp.where(last, init, noised)

        is_xl = self.models.is_xl
        with_ip = self.ip is not None
        decode = self._make_decode()

        def program(params, context, added, init, mask, guidance, tables,
                    key):
            key, kn, ks = jax.random.split(key, 3)
            noise0 = jax.random.normal(kn, init.shape, jnp.float32)
            lat = noise0 * sched.init_noise_sigma(tables)
            state = sched.init_state(tables, init.shape, key=ks)
            n_loop = sched.num_loop_steps(tables)

            def body(carry, i):
                lat, st = carry
                t = sched.timestep(tables, i)
                inp = sched.scale_model_input(tables, st, i, lat)
                inp2 = jnp.concatenate([inp, inp], axis=0)
                tb = jnp.broadcast_to(t, (inp2.shape[0],))
                ip_kw = (dict(ip_context=added[-2], ip_scale=added[-1])
                         if with_ip else {})
                if is_xl:
                    eps = unet.apply(params["unet"], inp2, tb, context,
                                     added[0], added[1], **ip_kw)
                else:
                    eps = unet.apply(params["unet"], inp2, tb, context,
                                     **ip_kw)
                eps_u, eps_c = jnp.split(eps, 2, axis=0)
                eps = apply_guidance(eps_u, eps_c, guidance,
                                     self.guidance_rescale)
                st, lat = sched.step(tables, st, i, eps, lat)
                known = noised_known(tables, init, noise0, i)
                lat = mask * lat + (1.0 - mask) * known
                return (lat, st), None

            (lat, _), _ = jax.lax.scan(body, (lat, state),
                                       jnp.arange(n_loop))
            return decode(params, lat)

        bs = batch_sharding(self.mesh)
        rep = replicated(self.mesh)
        added_spec = ((bs, bs) if is_xl else ()) \
            + ((bs, rep) if with_ip else ())
        return jax.jit(program,
                       in_shardings=(self._param_shardings, bs, added_spec,
                                     bs, bs, rep, rep, rep),
                       out_shardings=bs)

    def encode_image(self, images) -> jax.Array:
        """(B,H,W,3) in [-1,1] -> scaled latents for img2img.

        With ``vae_tile`` set and an image larger than one tile, encoding
        runs in the same overlapping tiles as the decode path (mirror of
        ``decode_latents_tiled``), with linear seam blending in latent
        space — so img2img/inpaint at >512² stay within HBM end to end."""
        images = jnp.asarray(images, jnp.float32)
        f = self.models.vae_scale_factor
        tile = self.vae_tile
        if tile is None or (images.shape[1] <= tile * f
                            and images.shape[2] <= tile * f):
            return self._encode_whole(images)

        ov = self.vae_tile_overlap
        b, H, W, _ = images.shape
        h, w = H // f, W // f
        stride = tile - ov
        out = np.zeros((b, h, w, self.models.unet_config.in_channels),
                       np.float32)
        weight = np.zeros((1, h, w, 1), np.float32)

        def ramp(n, lo, hi):
            r = np.ones(n, np.float32)
            if lo:
                r[:ov] = np.linspace(0, 1, ov, endpoint=False)
            if hi:
                r[-ov:] = np.linspace(1, 0, ov)
            return r

        def positions(dim):
            # one whole-axis tile when the axis fits (non-square images can
            # be sub-tile along one axis only)
            if dim <= tile:
                return [0]
            pos = list(range(0, dim - tile + 1, stride))
            if pos[-1] != dim - tile:
                pos.append(dim - tile)
            return pos

        ty, tx = min(tile, h), min(tile, w)
        for y0 in positions(h):
            for x0 in positions(w):
                y1, x1 = y0 + ty, x0 + tx
                px = images[:, y0 * f:y1 * f, x0 * f:x1 * f]
                z = np.asarray(self._encode_whole(px))
                ry = ramp(ty, y0 > 0, y1 < h)
                rx = ramp(tx, x0 > 0, x1 < w)
                wmap = (ry[:, None] * rx[None, :])[None, :, :, None]
                out[:, y0:y1, x0:x1] += z * wmap
                weight[:, y0:y1, x0:x1] += wmap
        return jnp.asarray(out / np.maximum(weight, 1e-8))

    def _encode_whole(self, images) -> jax.Array:
        if self._encode_fn is None:
            vae = self.models.vae()
            scale = self.models.vae_config.scaling_factor

            def enc(params, img):
                mean, _ = vae.apply(params["vae"], img,
                                    method=AutoencoderKL.encode)
                return mean * scale
            self._encode_fn = jax.jit(enc)
        return self._encode_fn(self._params, images)

    # ------------------------------------------------------------------
    # safety checker
    # ------------------------------------------------------------------
    def check_safety(self, images: np.ndarray) -> np.ndarray:
        """(B,H,W,3) [0,1] frames -> bool flags; black out in the caller (cf.
        reference ``flax_stable_diffusion_pipeline.py:420-441``).

        The dispatch is batch-sharded over the mesh ``data`` axis like the
        denoise program (the reference pmaps its checker,
        ``flax_stable_diffusion_pipeline.py:930-932``); the batch pads up to
        the data-parallel size so the shards stay even."""
        checker = self.models.safety_checker()
        if checker is None:
            return np.zeros(images.shape[0], bool)
        pix = preprocess_for_safety(jnp.asarray(images),
                                    self.models.safety_config.vision.image_size)
        if self._safety_fn is None:
            self._safety_fn = jax.jit(
                checker.apply,
                in_shardings=(self._param_shardings["safety_checker"],
                              batch_sharding(self.mesh)),
                out_shardings=batch_sharding(self.mesh))
        n = pix.shape[0]
        m = pad_to_multiple(n, data_parallel_size(self.mesh))
        if m != n:
            pix = jnp.pad(pix, ((0, m - n), (0, 0), (0, 0), (0, 0)))
        flags = self._safety_fn(self._params["safety_checker"], pix)
        return np.asarray(flags)[:n]
