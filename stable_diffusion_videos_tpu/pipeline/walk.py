"""StableDiffusionWalkPipeline — the product: latent-space-walk videos.

TPU-native re-design of the reference pipeline pair
(``stable_diffusion_pipeline.py:38-858`` torch,
``flax_stable_diffusion_pipeline.py:42-939`` flax) with the reference's exact
``walk()`` API surface (prompts, seeds, int-or-list num_interpolation_steps,
audio_filepath, margin, smooth, resume, upsample, negative_prompt,
batch_size, make_video — ``stable_diffusion_pipeline.py:556-579``).

Division of labour (SURVEY.md §7): the device runs ONE jitted sharded program
per dispatch (trajectory interp -> CFG denoise scan -> VAE decode, via
``runtime.Engine``); python handles audio analysis, file IO, resume
bookkeeping, and streams finished frames into the video encoder while the
next dispatch runs.

Parity notes vs the torch reference:
* embeddings LERP / noise SLERP (``stable_diffusion_pipeline.py:467-468``) —
  the flax reference slerps both (``flax...py:472-473``); configurable via
  ``embed_interp``.
* per-seed noise defaults to the torch-CPU-compatible stream
  (``core/rng.py``).
* resume fixes the reference's final-frame edge case (``skip + 1 >=
  num_step`` guard, ``stable_diffusion_pipeline.py:750``).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import List, Optional, Union

import jax
import numpy as np
from PIL import Image

from ..audio.analysis import get_timesteps_arr
from ..core.interp import lerp, slerp
from ..core.rng import noise_for_seed
from ..media.video import make_video
from ..models.bundle import SDModels
from ..runtime.engine import Engine
from ..utils.profiling import StageTimer

logger = logging.getLogger("sdv_tpu")


def load_control_image(image, height: int, width: int) -> np.ndarray:
    """Path / PIL / array -> (1, height, width, 3) float32 in [0, 1] for
    ControlNet conditioning (canny/depth/pose maps are plain images)."""
    if isinstance(image, (str, Path)):
        image = Image.open(image)
    if isinstance(image, Image.Image):
        image = np.asarray(image.convert("RGB").resize(
            (width, height), Image.BILINEAR))
    image = np.asarray(image, np.float32)
    if image.max() > 1.5:  # uint8-range input
        image = image / 255.0
    if image.ndim == 3:
        image = image[None]
    if image.shape[1:3] != (height, width):
        raise ValueError(f"control image is {image.shape[1:3]}, expected "
                         f"({height}, {width}) — pass a path/PIL image to "
                         "auto-resize")
    return image


def load_control_source(source, height: int, width: int) -> np.ndarray:
    """Control conditioning source -> (N, height, width, 3) float32.

    N == 1: one map locks every frame of the clip (``load_control_image``
    inputs).  N > 1: a PER-FRAME control sequence — a directory of image
    files (sorted by name; e.g. an extracted pose/depth video) or an
    (N, H, W, 3) array — animating the structure under the prompt walk."""
    if isinstance(source, (str, Path)) and Path(source).is_dir():
        files = sorted(p for p in Path(source).iterdir()
                       if p.suffix.lower() in (".png", ".jpg", ".jpeg",
                                               ".bmp", ".webp"))
        if not files:
            raise ValueError(f"control directory {source} has no images")
        return np.concatenate([load_control_image(f, height, width)
                               for f in files])
    arr = source
    if (hasattr(arr, "ndim") and getattr(arr, "ndim", 0) == 4
            and arr.shape[0] > 1):
        return np.concatenate([load_control_image(a, height, width)
                               for a in np.asarray(arr)])
    return load_control_image(source, height, width)


class StableDiffusionWalkPipeline:
    def __init__(self, models: SDModels, scheduler: str = "pndm", mesh=None,
                 batch_bucket: Optional[int] = None,
                 embed_interp: str = "lerp", noise_interp: str = "slerp",
                 rng_impl: str = "torch", safety: Optional[bool] = None,
                 fast: bool = False,
                 step_cache: Optional[int] = None,
                 step_cache_split: int = 1,
                 step_cache_policy: str = "uniform",
                 guidance_rescale: float = 0.0,
                 guidance_interval=None,
                 frozen_noise: bool = False,
                 prompt_weighting: bool = False,
                 controlnet=None, freeu=None, ip_adapter=None, tome=None):
        if freeu:
            # training-free detail/quality boost (Si et al. 2023): True =
            # published per-family factors, or an explicit (b1, b2, s1, s2)
            models = models.with_freeu(freeu)
        if tome:
            # ToMe-SD token merging (ops/tome.py): a float ratio, or
            # (ratio, max_level) to also merge at deeper resolution levels
            if isinstance(tome, (int, float)):
                tome = (float(tome), 0)
            models = models.with_tome(*tome)
        if fast:
            # the bench-proven quality-gated composite (bench.py,
            # tools/probe_r04.json; gates rel_err<1e-4 / SSIM 1.000 vs
            # exact): SD1/2 — step_cache=3 x guidance_interval (0.1,0.85)
            # at dispatch batch 16 (cond-only segments run `batch` UNet
            # rows; below ~16 rows the chip is latency-bound and the
            # interval LOSES time); SDXL at 1024^2 — step_cache=2 only
            # (batch 1-2 is always latency-bound).  Explicit kwargs win
            # over the preset.
            if step_cache is None:
                if controlnet is not None:
                    # step_cache x ControlNet is rejected at dispatch (the
                    # cached shallow pass has no deep skips to inject
                    # residuals into) — the preset degrades to the interval
                    # lever HERE instead of trapping the user with a
                    # mid-walk ValueError after run-dir creation
                    logger.info(
                        "fast=True with a ControlNet: step_cache skipped "
                        "(incompatible with residual injection); keeping "
                        "guidance_interval")
                else:
                    step_cache = 2 if models.is_xl else 3
            if guidance_interval is None and not models.is_xl:
                guidance_interval = (0.1, 0.85)
        self.fast = bool(fast)
        self.models = models
        if controlnet is not None:
            from ..models.weights import load_controlnet
            if isinstance(controlnet, (str, Path)):
                controlnet = load_controlnet(controlnet)
            elif isinstance(controlnet, (list, tuple)):
                controlnet = [load_controlnet(c)
                              if isinstance(c, (str, Path)) else c
                              for c in controlnet]
        if isinstance(ip_adapter, (str, Path, tuple)):
            # path, or (checkpoint, CLIP-image-encoder dir) for on-the-fly
            # image embedding
            from ..models.ip_adapter import load_ip_adapter
            if isinstance(ip_adapter, tuple):
                ip_adapter = load_ip_adapter(ip_adapter[0], models,
                                             image_encoder=ip_adapter[1])
            else:
                ip_adapter = load_ip_adapter(ip_adapter, models)
        self.engine = Engine(models, mesh=mesh, scheduler=scheduler,
                             batch_bucket=batch_bucket,
                             step_cache=step_cache,
                             step_cache_split=step_cache_split,
                             step_cache_policy=step_cache_policy,
                             guidance_rescale=guidance_rescale,
                             guidance_interval=guidance_interval,
                             frozen_noise=frozen_noise,
                             controlnet=controlnet, ip_adapter=ip_adapter)
        #: opt-in A1111/compel emphasis syntax + >77-token prompt chunking
        #: (core/prompt_weighting.py); off by default so literal parentheses
        #: in prompts keep the reference's verbatim semantics
        self.prompt_weighting = prompt_weighting
        self.embed_interp = embed_interp
        self.noise_interp = noise_interp
        self.rng_impl = rng_impl
        #: safety-checker default matches the reference (ON when the bundle
        #: carries a checker, loud warning otherwise —
        #: ``stable_diffusion_pipeline.py:112-120``); ``safety=None`` = auto.
        #: Pass ``safety=False`` for the reference's explicit opt-out.
        if safety is None:
            safety = models.safety_checker() is not None
            if not safety:
                logger.warning(
                    "This bundle has no safety checker — NSFW filtering is "
                    "DISABLED.  Load a bundle with safety_checker params (or "
                    "pass safety=False to silence this warning); see the "
                    "Stable Diffusion license conditions of use.")
        self.safety = bool(safety)
        self.upsampler = None
        self.timer = StageTimer()
        #: optional callable(dict) — receives {clip, clips_total,
        #: frames_done, frames_total} as walk() progresses (the server's
        #: /jobs/<id> streams it)
        self.on_progress = None
        self._progress = None

    def set_scheduler(self, name: str) -> None:
        """Switch the sampler on the live engine (see Engine.set_scheduler);
        the diffusers idiom ``pipe.scheduler = X`` maps to this."""
        self.engine.set_scheduler(name)

    # ------------------------------------------------------------------
    # constructors
    # ------------------------------------------------------------------
    @classmethod
    def tiny(cls, **kw) -> "StableDiffusionWalkPipeline":
        """Random tiny-model pipeline — every code path, no weights."""
        return cls(SDModels.tiny(), **kw)

    @classmethod
    def tiny_xl(cls, **kw) -> "StableDiffusionWalkPipeline":
        """Random tiny SDXL-flavoured pipeline (dual text towers +
        text_time micro-conditioning)."""
        return cls(SDModels.tiny_xl(), **kw)

    @classmethod
    def from_pretrained(cls, path: str, scheduler: str = "pndm",
                        tiled: bool = False, dtype=None,
                        tokenizer_dir=None, prediction_type=None,
                        lora=None, lora_scale: float = 1.0,
                        textual_inversion=None,
                        **kw) -> "StableDiffusionWalkPipeline":
        """Load a diffusers-layout checkpoint directory / hub id, or a
        single original-layout ``.ckpt``/``.safetensors`` file (pass
        ``tokenizer_dir`` — single files carry no vocab).  ``tiled``
        replaces the reference's conv monkey-patch
        (``stable_diffusion_pipeline.py:840-858``) with explicit circular
        convs.  ``lora``: one or a list of kohya/diffusers LoRA
        ``.safetensors`` (or trainer ``.npz``) adapters, merged host-side
        before compile (``models/lora_file.py``); list items may be
        ``(path, scale)`` pairs, ``lora_scale`` is the shared default.
        ``textual_inversion``: one or a list of textual-inversion embedding
        files (``models/textual_inversion.py``); list items may be
        ``(path, trigger_token)`` pairs.  ``controlnet``: a diffusers-layout
        ControlNetModel dir/file or a ``ControlNetBundle`` — enables
        ``walk(control_image=...)`` spatially-conditioned generation."""
        import jax.numpy as jnp
        models = SDModels.from_pretrained(
            path, dtype=dtype or jnp.bfloat16, tiled=tiled,
            tokenizer_dir=tokenizer_dir, prediction_type=prediction_type)
        if lora is not None:
            from ..models.lora_file import apply_loras
            if isinstance(lora, (str, Path)):
                lora = [lora]
            models = apply_loras(models, lora, scale=lora_scale)
        if textual_inversion is not None:
            from ..models.textual_inversion import apply_textual_inversions
            if isinstance(textual_inversion, (str, Path)):
                textual_inversion = [textual_inversion]
            models = apply_textual_inversions(models, textual_inversion)
        return cls(models, scheduler=scheduler, **kw)

    # ------------------------------------------------------------------
    # reference drop-in shims
    # ------------------------------------------------------------------
    def enable_attention_slicing(self, slice_size="auto"):
        """No-op shim: the reference slices attention to fit CUDA memory
        (``stable_diffusion_pipeline.py:161-189``); here long sequences run
        through the Pallas flash kernel, which never materialises the S x S
        score matrix, so there is nothing to slice."""
        logger.info("attention slicing not needed on TPU (flash attention); "
                    "ignoring enable_attention_slicing(%r)", slice_size)

    def disable_attention_slicing(self):
        pass

    # ------------------------------------------------------------------
    # building blocks (reference helper API)
    # ------------------------------------------------------------------
    def embed_text(self, text, negative_prompt=None):
        """Prompt -> (1, 77, D) embedding (reference ``embed_text``,
        ``stable_diffusion_pipeline.py:809-820``)."""
        with self.timer.stage("embed"):
            return np.asarray(self.engine.embed_text(text))

    def _embed_cond_uncond(self, prompt: str, negative_prompt):
        """(cond, uncond) embeddings for one prompt — routes through the
        weighted chunked path (harmonised window counts) when
        ``prompt_weighting`` is on."""
        neg = negative_prompt or ""
        if self.prompt_weighting:
            from ..core.prompt_weighting import chunks_needed
            tok = self.models.tokenizer
            n = max(chunks_needed(tok, t) for t in (prompt, neg))
            return (self.engine.embed_text_weighted(prompt, n),
                    self.engine.embed_text_weighted(neg, n))
        return self.engine.embed_text(prompt), self.engine.embed_text(neg)

    def _xl_pooled_kwargs(self, prompt, negative_prompt, batch: int):
        """Pooled-embedding kwargs for SDXL bundles ({} for SD1/2)."""
        if not self.models.is_xl:
            return {}
        if self.prompt_weighting:
            from ..core.prompt_weighting import strip_prompt_weights
            prompt = strip_prompt_weights(prompt)
            negative_prompt = strip_prompt_weights(negative_prompt or "")
        pooled = self.engine.embed_text_pooled(prompt)
        if batch > 1 and pooled.shape[0] == 1:
            pooled = jax.numpy.broadcast_to(pooled,
                                            (batch,) + pooled.shape[1:])
        return dict(pooled=pooled,
                    uncond_pooled=self.engine.embed_text_pooled(
                        negative_prompt or ""))

    def _ip_kwargs(self, ip_image, ip_scale: float = 1.0) -> dict:
        """One image prompt -> the engine's (ip_tokens, ip_scale) kwargs.
        Computed ONCE per call site and reused for every dispatch (the
        tokens are a per-request constant, not per-step work)."""
        if ip_image is None:
            return {}
        if self.engine.ip is None:
            raise ValueError("ip_image= requires a pipeline built with "
                             "ip_adapter= (see models/ip_adapter.py)")
        return dict(ip_tokens=self.engine.ip.image_tokens(ip_image),
                    ip_scale=float(ip_scale))

    def init_noise(self, seed: int, noise_shape, dtype=np.float32):
        """Seeded latent noise, torch-stream-compatible by default
        (reference ``init_noise``, ``stable_diffusion_pipeline.py:822-838``).
        ``noise_shape`` is NHWC."""
        return noise_for_seed(seed, tuple(noise_shape),
                              impl=self.rng_impl).astype(dtype)

    def _latent_shape(self, height: int, width: int):
        f = self.models.vae_scale_factor
        c = self.models.unet_config.in_channels
        return (1, height // f, width // f, c)

    def generate_inputs(self, prompt_a: str, prompt_b: str, seed_a, seed_b,
                        noise_shape, T, batch_size: int,
                        num_chunks: Optional[int] = None):
        """Interpolated (embeds, noise) batches for one clip (reference
        ``generate_inputs``, ``stable_diffusion_pipeline.py:457-479``) — but
        the whole trajectory is built on device in two fused interpolation
        programs instead of a per-frame host loop.  With
        ``self.prompt_weighting`` the endpoints embed through the weighted
        chunked path at a common ``num_chunks`` context length."""
        if self.prompt_weighting:
            embeds_a = self.engine.embed_text_weighted(prompt_a, num_chunks)
            embeds_b = self.engine.embed_text_weighted(prompt_b, num_chunks)
        else:
            embeds_a = self.engine.embed_text(prompt_a)
            embeds_b = self.engine.embed_text(prompt_b)
        noise_a = jax.numpy.asarray(self.init_noise(seed_a, noise_shape))
        noise_b = jax.numpy.asarray(self.init_noise(seed_b, noise_shape))

        T = np.asarray(T, np.float32)
        interp = {"lerp": lerp, "slerp": slerp}
        embeds = interp[self.embed_interp](T, embeds_a[0], embeds_b[0])
        noise = interp[self.noise_interp](T, noise_a[0], noise_b[0])
        pooled = None
        if self.models.is_xl:
            # SDXL: the pooled text embedding walks the same trajectory.
            # Weighted mode pools the syntax-stripped prompt (weights act on
            # the sequence states; the pooled vector has no token axis).
            pa, pb = prompt_a, prompt_b
            if self.prompt_weighting:
                from ..core.prompt_weighting import strip_prompt_weights
                pa, pb = strip_prompt_weights(pa), strip_prompt_weights(pb)
            pa = self.engine.embed_text_pooled(pa)
            pb = self.engine.embed_text_pooled(pb)
            pooled = interp[self.embed_interp](T, pa[0], pb[0])
        for i in range(0, len(T), batch_size):
            yield (embeds[i:i + batch_size], noise[i:i + batch_size],
                   None if pooled is None else pooled[i:i + batch_size])

    # ------------------------------------------------------------------
    # frame generation
    # ------------------------------------------------------------------
    def _postprocess(self, images: np.ndarray) -> List[Image.Image]:
        """float [0,1] or uint8 (B,H,W,3) -> PIL, with safety blackout +
        upsampling.  The engine quantises walk frames to uint8 ON DEVICE
        (4x less device->host transfer); float inputs are quantised here."""
        if images.dtype != np.uint8:
            images = (np.clip(images, 0.0, 1.0) * 255).round()                 .astype(np.uint8)
        if self.safety:
            flags = self.engine.check_safety(
                images.astype(np.float32) / 255.0)
            if flags.any():
                logger.warning("safety checker flagged %d frame(s); "
                               "blacking out", int(flags.sum()))
                images = np.where(flags[:, None, None, None],
                                  np.uint8(0), images)
        if self.upsampler is not None:
            with self.timer.stage("upsample"):
                # one batched jitted dispatch for the whole frame batch
                # (the reference upsamples frame-by-frame through PIL/cv2,
                # upsampling.py:42-55)
                out = self.upsampler(images.astype(np.float32) / 255.0)
                images = (np.clip(out, 0.0, 1.0) * 255).round()                     .astype(np.uint8)
        return [Image.fromarray(f) for f in images]

    def make_clip_frames(self, prompt_a: str, prompt_b: str, seed_a: int,
                         seed_b: int, num_interpolation_steps: int = 5,
                         save_path: Union[str, Path] = "outputs/images",
                         num_inference_steps: int = 50,
                         guidance_scale: float = 7.5, eta: float = 0.0,
                         height: Optional[int] = None,
                         width: Optional[int] = None,
                         upsample: bool = False, batch_size: int = 1,
                         image_file_ext: str = ".png",
                         T=None, skip: int = 0,
                         negative_prompt: Optional[str] = None,
                         step: Optional[tuple] = None, frame_sink=None,
                         upsample_weights: Optional[str] = None,
                         control_image=None, controlnet_scale: float = 1.0,
                         ip_image=None, ip_scale: float = 1.0,
                         noise_key=None):
        """Generate frames for one prompt-pair clip (reference
        ``make_clip_frames``, ``stable_diffusion_pipeline.py:481-554``).

        ``noise_key``: override the stochastic-transition PRNG key for
        EVERY dispatch of the clip (``walk()`` passes one video-level key
        under ``frozen_noise=True`` so the frozen field is constant across
        batch AND clip boundaries — per-batch keys would reintroduce a
        texture seam every ``batch_size`` frames).

        ``control_image``: ControlNet conditioning (requires the pipeline's
        ``controlnet=``) — a path/PIL/array map that locks every frame of
        the clip, a DIRECTORY of per-frame maps (a control video: the
        structure animates under the prompt walk; must hold exactly
        ``num_interpolation_steps`` images), or a list of either for
        multi-ControlNet."""
        if upsample:
            self._ensure_upsampler(upsample_weights)
        height = height or self.models.default_size
        width = width or self.models.default_size
        control = None
        if control_image is not None:
            if self.engine.controlnet is None:
                raise ValueError("control_image= requires a pipeline built "
                                 "with controlnet= (from_pretrained("
                                 "controlnet=...) or Engine(controlnet=...))")
            srcs = (list(control_image)
                    if isinstance(control_image, (list, tuple))
                    else [control_image])
            control = [load_control_source(c, height, width) for c in srcs]
            for c in control:
                if c.shape[0] not in (1, num_interpolation_steps):
                    raise ValueError(
                        f"control sequence has {c.shape[0]} frames; the "
                        f"clip has {num_interpolation_steps}")
        save_path = Path(save_path)
        save_path.mkdir(parents=True, exist_ok=True)

        T = np.asarray(T if T is not None
                       else np.linspace(0.0, 1.0, num_interpolation_steps))
        if T.shape[0] != num_interpolation_steps:
            raise ValueError(
                f"len(T) ({T.shape[0]}) != num_interpolation_steps "
                f"({num_interpolation_steps})")
        T = T[skip:]

        noise_shape = self._latent_shape(height, width)
        num_chunks = None
        neg = negative_prompt or ""
        if self.prompt_weighting:
            from ..core.prompt_weighting import (chunks_needed,
                                                 strip_prompt_weights)
            tok = self.models.tokenizer
            # cond and uncond concatenate into one CFG batch — all three
            # prompts must agree on the chunked context length
            num_chunks = max(chunks_needed(tok, t)
                             for t in (prompt_a, prompt_b, neg))
            uncond = self.engine.embed_text_weighted(neg, num_chunks)
            neg_stripped = strip_prompt_weights(neg)
            uncond_pooled = (self.engine.embed_text_pooled(neg_stripped)
                             if self.models.is_xl else None)
        else:
            uncond = self.engine.embed_text(neg)
            uncond_pooled = (self.engine.embed_text_pooled(neg)
                             if self.models.is_xl else None)
        ip_kw = self._ip_kwargs(ip_image, ip_scale)
        from concurrent.futures import ThreadPoolExecutor
        save_pool = ThreadPoolExecutor(max_workers=4,
                                       thread_name_prefix="frame-save")
        save_futures = []

        batch_gen = self.generate_inputs(prompt_a, prompt_b, seed_a, seed_b,
                                         noise_shape, T, batch_size,
                                         num_chunks=num_chunks)
        frame_index = skip
        total = len(T)
        pending = None  # (device_future, valid, start_frame_index)

        def drain(p):
            imgs_dev, valid, start = p
            with self.timer.stage("transfer"):
                imgs = np.asarray(imgs_dev)[:valid]
            with self.timer.stage("save"):
                for j, pil in enumerate(self._postprocess(imgs)):
                    # PNG encode on worker threads; sink feed stays in-order
                    save_futures.append(save_pool.submit(
                        pil.save,
                        save_path / f"frame{start + j:06d}{image_file_ext}"))
                    if frame_sink is not None:
                        frame_sink.add_frame(np.asarray(pil))
            self.timer.add_frames(valid)
            self._advance_progress(valid)

        for batch_idx, (embeds, noise, pooled) in enumerate(batch_gen):
            prefix = f"[{step[0]}/{step[1]}]" if step else ""
            logger.info("%s[%d] generating frames %d-%d / %d", prefix,
                        batch_idx, frame_index, frame_index + len(noise) - 1,
                        skip + total)
            with self.timer.stage("denoise"):
                fut, valid = self.engine.denoise_frames_async(
                    embeds, uncond, noise,
                    num_inference_steps=num_inference_steps,
                    guidance_scale=guidance_scale, eta=eta,
                    # ancestral-sampler noise stream: fold BOTH clip seeds in
                    # so clips sharing seed_a draw decoupled stochastic noise
                    # (a seed_a-only derivation coupled them — VERDICT r2);
                    # under frozen_noise the key must NOT vary per dispatch
                    # (same key -> same per-step field -> no batch seams),
                    # and walk() passes a video-level noise_key so clip
                    # boundaries don't reset the field either
                    key=(noise_key if noise_key is not None
                         else jax.random.fold_in(jax.random.fold_in(
                             jax.random.PRNGKey(int(seed_a)),
                             int(seed_b) & (2**31 - 1)),
                             0 if self.engine.frozen_noise else batch_idx)),
                    output_dtype="uint8",
                    pooled=pooled, uncond_pooled=uncond_pooled,
                    control=(None if control is None else [
                        # per-frame sequences track the absolute frame
                        # index; single maps broadcast over the batch
                        c if c.shape[0] == 1
                        else c[frame_index:frame_index + len(noise)]
                        for c in control]),
                    control_scale=controlnet_scale, **ip_kw)
            # overlap: save the previous batch while this one computes
            if pending is not None:
                drain(pending)
            pending = (fut, valid, frame_index)
            frame_index += valid
        if pending is not None:
            drain(pending)
        with self.timer.stage("save"):
            for f in save_futures:
                f.result()  # surface any save error; ensure files complete
        save_pool.shutdown(wait=True)

    def _advance_progress(self, frames: int):
        if self._progress is not None:
            self._progress["frames_done"] += int(frames)
            if self.on_progress is not None:
                self.on_progress(dict(self._progress))

    # ------------------------------------------------------------------
    # the product: walk()
    # ------------------------------------------------------------------
    def walk(self, prompts: Optional[List[str]] = None,
             seeds: Optional[List[int]] = None,
             num_interpolation_steps: Optional[Union[int, List[int]]] = 5,
             output_dir: str = "./dreams", name: Optional[str] = None,
             image_file_ext: str = ".png", fps: int = 30,
             num_inference_steps: int = 50, guidance_scale: float = 7.5,
             eta: float = 0.0, height: Optional[int] = None,
             width: Optional[int] = None, upsample: bool = False,
             batch_size: Optional[int] = None, resume: bool = False,
             audio_filepath: Optional[str] = None,
             audio_start_sec: Optional[float] = None, margin: float = 1.0,
             smooth: float = 0.0, negative_prompt: Optional[str] = None,
             make_video: bool = True, params=None,
             jit: Optional[bool] = None,
             upsample_weights: Optional[str] = None,
             control_image=None,
             controlnet_scale: float = 1.0,
             ip_image=None, ip_scale: float = 1.0) -> Optional[str]:
        """Generate a video walking through prompt/seed pairs — reference
        ``walk()`` (``stable_diffusion_pipeline.py:556-807``), same API and
        output directory layout (clip subdirs + per-clip mp4 + final mp4 +
        ``prompt_config.json``).  Returns the final video path (or the run
        directory when ``make_video=False``)."""
        from ..media.video import make_video as assemble

        if params is not None or jit is not None:
            # reference flax signature compatibility
            # (flax_stable_diffusion_pipeline.py:607-620): params live in the
            # engine here, and everything is jitted always
            logger.info("walk(params=..., jit=...) are managed by the engine "
                        "in this framework; arguments ignored")

        height = height or self.models.default_size
        width = width or self.models.default_size
        # DEFAULT = the family's measured-best dispatch size
        # (docs/performance.md batch ladders: b8 is ~1.7x b1 on the 512^2
        # families) — a deliberate deviation from the reference's
        # ``batch_size=1`` (``stable_diffusion_pipeline.py:564-566``); pass
        # batch_size=1 explicitly for reference-identical dispatch grouping.
        # For DETERMINISTIC samplers (the reference's six at eta=0) frames
        # are identical at any batch size — batching only groups
        # dispatches.  Stochastic samplers (lcm, euler_ancestral, ddim
        # eta>0) draw transition noise per dispatch, so their pixels DO
        # depend on the grouping; pin batch_size for bit-reproducibility
        # there, or better, use frozen_noise=True (one video-level field,
        # grouping-invariant by construction).  fast mode's interval
        # composite needs >=16 cond-only rows to clear the latency-bound
        # region.
        if batch_size is None:
            batch_size = (16 if self.fast and not self.models.is_xl
                          else self.models.default_batch_size)
            logger.info(
                "walk(): batch_size defaulting to the measured-best %d for "
                "this model family (the reference defaults to 1; pass "
                "batch_size= to override)", batch_size)
        elif batch_size == 1 and self.models.default_batch_size > 1:
            logger.warning(
                "walk(batch_size=1): dispatching one frame at a time is "
                "~%dx slower than the measured-best batch_size=%d on this "
                "family (docs/performance.md)", 2,
                self.models.default_batch_size)
        output_path = Path(output_dir)
        name = name or time.strftime("%Y%m%d-%H%M%S")
        save_path_root = output_path / name

        # validate BEFORE touching the filesystem (the reference mkdirs
        # first, littering empty run dirs on bad args)
        if not resume:
            if prompts is None or seeds is None:
                raise ValueError("prompts and seeds are required")
            if len(prompts) != len(seeds):
                raise ValueError("#prompts must equal #seeds")
            if len(prompts) < 2:
                raise ValueError("need at least 2 prompts to walk between")
            if (not isinstance(num_interpolation_steps, int)
                    and len(num_interpolation_steps) != len(prompts) - 1):
                raise ValueError("len(num_interpolation_steps) must be "
                                 "len(prompts) - 1")
        # provision the upsampler BEFORE any filesystem/frame work so a
        # missing weights file fails in milliseconds, not after a long walk
        if upsample:
            self._ensure_upsampler(upsample_weights)
        # same fail-fast for ControlNet conditioning
        if control_image is not None and self.engine.controlnet is None:
            raise ValueError("control_image= requires a pipeline built with "
                             "controlnet= (from_pretrained(controlnet=...))")
        save_path_root.mkdir(parents=True, exist_ok=True)

        config_path = save_path_root / "prompt_config.json"
        if resume:
            if not config_path.exists():
                raise FileNotFoundError(
                    f"resume=True but {config_path} does not exist; provide "
                    "the `name` of a previous run")
            data = json.loads(config_path.read_text())
            prompts = data["prompts"]
            seeds = data["seeds"]
            num_interpolation_steps = data["num_interpolation_steps"]
            fps = data["fps"]
            num_inference_steps = data["num_inference_steps"]
            guidance_scale = data["guidance_scale"]
            eta = data["eta"]
            upsample = data["upsample"]
            if upsample:
                self._ensure_upsampler(upsample_weights
                                       or data.get("upsample_weights"))
            height = data["height"]
            width = data["width"]
            audio_filepath = data["audio_filepath"]
            audio_start_sec = data["audio_start_sec"]
            margin = data.get("margin", 1.0)
            smooth = data.get("smooth", 0.0)
            negative_prompt = data.get("negative_prompt")
            if control_image is None and data.get("control_image"):
                control_image = data["control_image"]
            controlnet_scale = data.get("controlnet_scale", controlnet_scale)
            logger.info("resuming %s", save_path_root)

        if isinstance(num_interpolation_steps, int):
            num_interpolation_steps = [num_interpolation_steps] * (
                len(prompts) - 1)
        if len(num_interpolation_steps) != len(prompts) - 1:
            raise ValueError("len(num_interpolation_steps) must be "
                             "len(prompts) - 1")

        if not resume:
            config_path.write_text(json.dumps(dict(
                prompts=prompts, seeds=seeds,
                num_interpolation_steps=num_interpolation_steps, fps=fps,
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale, eta=eta, upsample=upsample,
                upsample_weights=upsample_weights,
                height=height, width=width, audio_filepath=audio_filepath,
                audio_start_sec=audio_start_sec, margin=margin, smooth=smooth,
                negative_prompt=negative_prompt,
                # only resumable path(s) are persisted (arrays aren't JSON)
                control_image=(
                    str(control_image)
                    if isinstance(control_image, (str, Path))
                    else [str(c) for c in control_image]
                    if (isinstance(control_image, (list, tuple))
                        and all(isinstance(c, (str, Path))
                                for c in control_image))
                    else None),
                controlnet_scale=controlnet_scale,
                scheduler=self.engine.scheduler_name,
                tiled=self.models.tiled,
                framework="stable_diffusion_videos_tpu",
            ), indent=4, sort_keys=True))

        audio_start_sec = audio_start_sec or 0.0
        # frozen_noise: ONE transition-noise key for the entire video —
        # per-clip/per-batch keys would reset the frozen field at every
        # boundary, reintroducing the texture seams the mode exists to
        # remove (derived from the first seed so reruns stay reproducible)
        walk_noise_key = (jax.random.PRNGKey(int(seeds[0]) & (2**31 - 1))
                          if self.engine.frozen_noise else None)
        clip_pairs = list(zip(prompts, prompts[1:], seeds, seeds[1:],
                              num_interpolation_steps))
        self._progress = {"clip": 0, "clips_total": len(clip_pairs),
                          "frames_done": 0,
                          "frames_total": int(sum(num_interpolation_steps))}
        for i, (prompt_a, prompt_b, seed_a, seed_b, num_step) in enumerate(
                clip_pairs):
            self._progress["clip"] = i
            clip_name = f"{name}_{i:06d}"
            clip_dir = save_path_root / clip_name
            clip_mp4 = clip_dir / f"{clip_name}.mp4"

            skip = 0
            if resume:
                # the assembler may emit .mp4 (ffmpeg/cv2) or .avi (native
                # muxer) — a completed clip is one with any video container
                if not clip_mp4.exists():
                    hits = list(clip_dir.glob(f"{clip_name}.*")) \
                        if clip_dir.exists() else []
                    vids = [p for p in hits if p.suffix in (".mp4", ".avi")]
                    if vids:
                        clip_mp4 = vids[0]
                if clip_mp4.exists():
                    logger.info("skipping completed clip %s", clip_name)
                    self._advance_progress(num_step)
                    continue
                if clip_dir.exists():
                    existing = sorted(clip_dir.glob(f"frame*{image_file_ext}"))
                    if existing:
                        skip = int(existing[-1].stem.lstrip("frame")) + 1
                        logger.info("resuming clip %s from frame %d",
                                    clip_name, skip)
                        self._advance_progress(min(skip, num_step))
                # NOTE: reference uses `skip + 1 >= num_step` here, silently
                # dropping regeneration of the final frame
                # (stable_diffusion_pipeline.py:750); we regenerate until all
                # frames exist.
                if skip >= num_step:
                    logger.info("clip %s frames complete; encoding only",
                                clip_name)

            audio_offset = audio_start_sec + sum(
                num_interpolation_steps[:i]) / fps
            audio_duration = num_step / fps

            if skip < num_step:
                T = None
                if audio_filepath:
                    with self.timer.stage("audio"):
                        T = get_timesteps_arr(audio_filepath,
                                              offset=audio_offset,
                                              duration=audio_duration,
                                              fps=fps, margin=margin,
                                              smooth=smooth)
                # stream frames straight into the clip encoder as they are
                # generated (PNGs are still written for resume); a partial
                # resume replays the existing frames into the sink first
                frame_sink = None
                if make_video:
                    from ..media.video import FrameWriter, iter_frames
                    audio_slice = None
                    if audio_filepath:
                        from ..audio.analysis import load_audio
                        audio_slice, a_sr = load_audio(
                            audio_filepath, offset=audio_offset,
                            duration=audio_duration)
                    frame_sink = FrameWriter(
                        str(clip_mp4), fps=fps, audio=audio_slice,
                        audio_sr=a_sr if audio_filepath else 22050)
                    if skip > 0:
                        for f in iter_frames(clip_dir,
                                             f"frame*{image_file_ext}"):
                            frame_sink.add_frame(f)
                try:
                    self.make_clip_frames(
                        prompt_a, prompt_b, seed_a, seed_b,
                        num_interpolation_steps=num_step, save_path=clip_dir,
                        num_inference_steps=num_inference_steps,
                        guidance_scale=guidance_scale, eta=eta, height=height,
                        width=width, upsample=upsample, batch_size=batch_size,
                        image_file_ext=image_file_ext, T=T, skip=skip,
                        negative_prompt=negative_prompt,
                        step=(i, len(clip_pairs)), frame_sink=frame_sink,
                        control_image=control_image,
                        controlnet_scale=controlnet_scale,
                        ip_image=ip_image, ip_scale=ip_scale,
                        noise_key=walk_noise_key)
                    if frame_sink is not None:
                        with self.timer.stage("encode"):
                            frame_sink.close()
                except BaseException:
                    # don't leave a half-written container claiming the clip
                    # is complete (resume treats an existing video as done)
                    if frame_sink is not None:
                        try:
                            frame_sink.close()
                        except Exception:
                            pass
                        Path(frame_sink.output_filepath).unlink(
                            missing_ok=True)
                    raise
            elif make_video and not clip_mp4.exists():
                with self.timer.stage("encode"):
                    assemble(clip_dir,
                             audio_filepath=audio_filepath,
                             fps=fps, output_filepath=str(clip_mp4),
                             audio_offset=audio_offset,
                             audio_duration=audio_duration,
                             glob_pattern=f"*{image_file_ext}")

        self.timer.log("walk")
        if make_video:
            with self.timer.stage("encode"):
                return assemble(
                    save_path_root, audio_filepath=audio_filepath, fps=fps,
                    output_filepath=str(save_path_root / f"{name}.mp4"),
                    audio_offset=audio_start_sec,
                    audio_duration=sum(num_interpolation_steps) / fps,
                    glob_pattern=f"**/frame*{image_file_ext}")
        return str(save_path_root)

    def img2img(self, image, prompt: str, strength: float = 0.75,
                num_inference_steps: int = 50, guidance_scale: float = 7.5,
                eta: float = 0.0, negative_prompt: Optional[str] = None,
                seed: int = 0, output_type: str = "pil",
                control_image=None, controlnet_scale: float = 1.0,
                ip_image=None, ip_scale: float = 1.0):
        """Image-to-image: re-noise an input image partway and denoise toward
        ``prompt`` (beyond the reference's feature set; ddim/euler/dpm).

        ``image``: PIL.Image or (H,W,3)/(B,H,W,3) array (uint8 or [0,1])."""
        if isinstance(image, Image.Image):
            arr = np.asarray(image.convert("RGB"), np.float32) / 255.0
        else:
            arr = np.asarray(image, np.float32)
            if arr.dtype == np.uint8 or arr.max() > 1.5:
                arr = arr / 255.0
        if arr.ndim == 3:
            arr = arr[None]
        latents = self.engine.encode_image(arr * 2.0 - 1.0)
        cond, uncond = self._embed_cond_uncond(prompt, negative_prompt)
        if latents.shape[0] > 1 and cond.shape[0] == 1:
            cond = jax.numpy.broadcast_to(cond,
                                          (latents.shape[0],) + cond.shape[1:])
        xl_kw = self._xl_pooled_kwargs(prompt, negative_prompt,
                                       latents.shape[0])
        ctrl_kw = {}
        if control_image is not None:
            f = self.models.vae_scale_factor
            ctrl_kw = dict(control=load_control_image(
                control_image, latents.shape[1] * f, latents.shape[2] * f),
                control_scale=controlnet_scale)
        ip_kw = self._ip_kwargs(ip_image, ip_scale)
        with self.timer.stage("denoise"):
            images = self.engine.img2img(
                cond, uncond, latents, strength=strength,
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale, eta=eta,
                key=jax.random.PRNGKey(int(seed)), **xl_kw, **ctrl_kw,
                **ip_kw)
        self.timer.add_frames(len(images))
        if output_type == "pil":
            return self._postprocess(images)
        return images

    def inpaint(self, image, mask, prompt: str,
                num_inference_steps: int = 50, guidance_scale: float = 7.5,
                negative_prompt: Optional[str] = None, seed: int = 0,
                output_type: str = "pil"):
        """Masked regeneration: ``mask`` white (1) = regenerate from
        ``prompt``, black (0) = keep ``image``.  mask: PIL (L/RGB) or (H,W)
        array; any of the 8 samplers (see Engine.inpaint)."""
        if isinstance(image, Image.Image):
            arr = np.asarray(image.convert("RGB"), np.float32) / 255.0
        else:
            arr = np.asarray(image, np.float32)
            if arr.dtype == np.uint8 or arr.max() > 1.5:
                arr = arr / 255.0
        if arr.ndim == 3:
            arr = arr[None]
        if isinstance(mask, Image.Image):
            m = np.asarray(mask.convert("L"), np.float32) / 255.0
        else:
            m = np.asarray(mask, np.float32)
            if m.max() > 1.5:
                m = m / 255.0
        latents = self.engine.encode_image(arr * 2.0 - 1.0)
        f = self.models.vae_scale_factor
        lh, lw = arr.shape[1] // f, arr.shape[2] // f
        import jax.image as jimage
        m_lat = np.asarray(jimage.resize(jax.numpy.asarray(m), (lh, lw),
                                         "nearest"))
        m_lat = np.broadcast_to(m_lat[None, :, :, None],
                                (latents.shape[0], lh, lw, 1))
        cond, uncond = self._embed_cond_uncond(prompt, negative_prompt)
        if latents.shape[0] > 1 and cond.shape[0] == 1:
            cond = jax.numpy.broadcast_to(
                cond, (latents.shape[0],) + cond.shape[1:])
        xl_kw = self._xl_pooled_kwargs(prompt, negative_prompt,
                                       latents.shape[0])
        with self.timer.stage("denoise"):
            images = self.engine.inpaint(
                cond, uncond, latents, m_lat,
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale,
                key=jax.random.PRNGKey(int(seed)), **xl_kw)
        self.timer.add_frames(len(images))
        if output_type == "pil":
            return self._postprocess(images)
        return images

    def vid2vid(self, video, prompt: str, *, strength: float = 0.5,
                num_inference_steps: int = 50, guidance_scale: float = 7.5,
                negative_prompt: Optional[str] = None, seed: int = 0,
                height: Optional[int] = None, width: Optional[int] = None,
                fps: Optional[float] = None,
                batch_size: Optional[int] = None,
                frame_skip: int = 1, max_frames: Optional[int] = None,
                output_filepath: str = "vid2vid.mp4",
                audio_filepath: Optional[str] = None,
                control_video=None, controlnet_scale: float = 1.0,
                control_from_source: Optional[str] = None,
                canny_thresholds=(100, 200),
                ip_image=None, ip_scale: float = 1.0,
                shared_noise: bool = True, latent_ema: float = 0.0,
                output_type: str = "video"):
        """Video-to-video restyling: re-noise every frame of an input video
        partway (``strength``) and denoise it toward ``prompt`` — batched
        img2img dispatches with a TEMPORALLY FROZEN re-noising sample
        (``shared_noise``), so the stochastic field does not flicker
        frame-to-frame (beyond the reference's scope; the natural video
        extension of its walk, built from the same engine programs).

        ``video``: a video file path (decoded via ``media.read_video_frames``
        — cv2 / ffmpeg / our native MJPEG-AVI reader), a directory of frames,
        or a (T, H, W, 3) array / list of frames.
        ``control_video``: optional ControlNet conditioning per frame — a
        video file, a directory of maps, one image, or an (N, H, W, 3)
        array (requires ``Engine(controlnet=...)``); N == 1 locks one map
        for all frames, otherwise map i conditions output frame i (clamped
        to the last map when the control sequence is shorter).
        ``control_from_source``: derive the ControlNet map from each SOURCE
        frame on the fly — "canny" (cv2 edges, ``canny_thresholds``) or
        "identity" (the frame itself, for tile/ip2p-style nets); no
        offline preprocessing pass needed.
        ``latent_ema``: opt-in second coherence lever beyond the frozen
        noise — a causal exponential blend of each frame's SOURCE latents
        toward the running EMA (``z~_i = (1-a) z_i + a z~_{i-1}``) before
        re-noising.  It low-passes temporal noise in the input (sensor
        grain, compression shimmer) that ``strength`` would otherwise
        amplify into style flicker; 0.0 = off, 0.3-0.6 typical.  Measured
        with ``utils.metrics.temporal_flicker`` (see tests/test_vid2vid.py).
        ``output_type``: "video" (writes ``output_filepath``, returns its
        path) or "frames" (returns a list of PIL images).
        """
        from ..media.video import (FrameWriter, iter_frames, probe_video,
                                   read_video_frames)
        batch_size = batch_size or self.models.default_batch_size
        f = self.models.vae_scale_factor
        grain = f * 8  # keep every UNet level's spatial dims integral

        def snap(n):
            return max(grain, (int(n) // grain) * grain)

        src_fps = None
        frames_total = None
        if isinstance(video, (str, Path)) and Path(video).is_file():
            info = probe_video(video)
            src_fps = info.get("fps") or None
            if info.get("n_frames"):
                frames_total = -(-info["n_frames"] // frame_skip)
                if max_frames is not None:
                    frames_total = min(frames_total, max_frames)
            if height is None or width is None:
                height = height or snap(info["height"])
                width = width or snap(info["width"])
        elif hasattr(video, "__len__"):
            frames_total = -(-len(video) // frame_skip)
            if max_frames is not None:
                frames_total = min(frames_total, max_frames)
        self._progress = {"clip": 0, "clips_total": 1, "frames_done": 0,
                          "frames_total": frames_total}
        if isinstance(video, (str, Path)) and Path(video).is_file():
            frames = read_video_frames(video, size=(height, width),
                                       frame_skip=frame_skip,
                                       max_frames=max_frames)
        else:
            base = iter_frames(video) if not isinstance(video, list) \
                else iter(video)

            def prepared():
                n = 0
                for i, fr in enumerate(base):
                    if i % frame_skip:
                        continue
                    if isinstance(fr, Image.Image):
                        fr = np.asarray(fr.convert("RGB"))
                    yield fr
                    n += 1
                    if max_frames is not None and n >= max_frames:
                        return
            frames = prepared()
        fps = fps or src_fps or 30.0

        if control_from_source is not None:
            if control_video is not None:
                raise ValueError("control_video and control_from_source "
                                 "are mutually exclusive")
            if control_from_source not in ("canny", "identity"):
                raise ValueError(f"control_from_source must be 'canny' or "
                                 f"'identity', got {control_from_source!r}")

        def source_map(fr_u8: np.ndarray) -> np.ndarray:
            if control_from_source == "canny":
                import cv2
                lo, hi = canny_thresholds
                edges = cv2.Canny(fr_u8, int(lo), int(hi))
                return np.repeat(edges[..., None], 3,
                                 axis=2).astype(np.float32) / 255.0
            return fr_u8.astype(np.float32) / 255.0

        ctrl_maps = None
        if control_video is not None:
            if (isinstance(control_video, (str, Path))
                    and Path(control_video).is_file()):
                # control sizing needs the target dims; video-file sources
                # resolve them lazily below once the first frame arrives
                ctrl_maps = ("video", control_video)
            else:
                if height is None or width is None:
                    raise ValueError("pass height/width explicitly when "
                                     "control_video is used with an "
                                     "array/list video source")
                ctrl_maps = load_control_source(control_video, height, width)

        audio, sr = None, 22050
        if audio_filepath:
            from ..audio.analysis import load_audio
            audio, sr = load_audio(audio_filepath, sr=sr)

        if not 0.0 <= latent_ema < 1.0:
            raise ValueError("latent_ema must be in [0, 1)")
        cond = uncond = None
        xl_kw = {}
        ip_kw = self._ip_kwargs(ip_image, ip_scale)
        noise = None
        writer = None
        out_frames: List[Image.Image] = []
        frame_idx = 0
        ema_lat = None  # causal EMA carry across batches (latent_ema)

        def flush(batch):
            nonlocal cond, uncond, xl_kw, noise, writer, frame_idx, ema_lat
            arr = np.stack(batch).astype(np.float32) / 255.0
            B = arr.shape[0]
            if cond is None:
                cond, uncond = self._embed_cond_uncond(prompt,
                                                       negative_prompt)
            c = cond if B == 1 else jax.numpy.broadcast_to(
                cond, (B,) + cond.shape[1:])
            if self.models.is_xl:
                xl_kw = self._xl_pooled_kwargs(prompt, negative_prompt, B)
            latents = self.engine.encode_image(arr * 2.0 - 1.0)
            if latent_ema > 0.0:
                # causal EMA over SOURCE latents (host-side: one tiny
                # sequential pass per batch; the carry spans batches so
                # coherence is unbroken at batch boundaries)
                lat = np.array(latents, np.float32)  # writable copy
                for j in range(B):
                    ema_lat = lat[j] if ema_lat is None else (
                        (1.0 - latent_ema) * lat[j] + latent_ema * ema_lat)
                    lat[j] = ema_lat
                latents = lat
            if shared_noise and noise is None:
                noise = self.init_noise(
                    seed, (1,) + latents.shape[1:3]
                    + (self.models.unet_config.in_channels,))
            batch_noise = noise
            if batch_noise is None and self.engine.frozen_noise:
                # frozen mode holds the per-dispatch key constant (so the
                # TRANSITION field never reseams) — but the initial
                # re-noising draw must stay per-frame, or every batch
                # reuses one (B,h,w,4) field: period-B texture recurrence
                # and output dependent on the batch partitioning.  Draw it
                # explicitly, keyed by ABSOLUTE frame index (partition-
                # invariant), instead of letting img2img split the frozen
                # key.
                base = jax.random.PRNGKey((int(seed) * 9973 + 1)
                                          & (2**31 - 1))
                batch_noise = jax.numpy.stack([
                    jax.random.normal(jax.random.fold_in(base,
                                                         frame_idx + j),
                                      latents.shape[1:], "float32")
                    for j in range(B)])
            ctrl_kw = {}
            if control_from_source is not None:
                ctrl_kw = dict(control=np.stack([source_map(f)
                                                 for f in batch]),
                               control_scale=controlnet_scale)
            elif ctrl_maps is not None:
                idx = np.minimum(np.arange(frame_idx, frame_idx + B),
                                 len(ctrl_maps) - 1)
                ctrl_kw = dict(control=ctrl_maps[idx],
                               control_scale=controlnet_scale)
            with self.timer.stage("denoise"):
                images = self.engine.img2img(
                    c, uncond, latents, strength=strength,
                    num_inference_steps=num_inference_steps,
                    guidance_scale=guidance_scale,
                    # frozen_noise: a frame_idx-dependent key would freeze a
                    # DIFFERENT transition field per dispatch — a texture
                    # seam every batch_size frames (same reasoning as the
                    # walk's video-level noise_key)
                    key=jax.random.PRNGKey(
                        int(seed) * 9973
                        + (0 if self.engine.frozen_noise else frame_idx)),
                    noise=batch_noise, **xl_kw, **ctrl_kw, **ip_kw)
            self.timer.add_frames(len(images))
            for img in self._postprocess(images):
                if output_type == "frames":
                    out_frames.append(img)
                else:
                    if writer is None:
                        # float fps preserved: truncating 29.97 -> 29 drifts
                        # ~0.1% and desyncs a muxed audio track on long videos
                        writer = FrameWriter(output_filepath, fps=float(fps),
                                             audio=audio, audio_sr=sr)
                    writer.add_frame(np.asarray(img))
            frame_idx += B
            self._advance_progress(B)

        batch: List[np.ndarray] = []
        first = True
        try:
            for fr in frames:
                if first:
                    if height is None or width is None:
                        height = height or snap(fr.shape[0])
                        width = width or snap(fr.shape[1])
                    if isinstance(ctrl_maps, tuple):
                        # video-file control source: decode at the (now
                        # known) target size, aligned with the output cadence
                        ctrl_maps = np.stack([
                            m.astype(np.float32) / 255.0
                            for m in read_video_frames(
                                ctrl_maps[1], size=(height, width),
                                frame_skip=frame_skip,
                                max_frames=max_frames)])
                first = False
                fr = np.asarray(fr)
                if fr.dtype != np.uint8:
                    fr = ((np.clip(fr, 0.0, 1.0) * 255).round()
                          .astype(np.uint8)
                          if fr.max() <= 1.5 else fr.astype(np.uint8))
                if fr.shape[2] != 3:
                    fr = fr[..., :3]
                if fr.shape[:2] != (height, width):
                    fr = np.asarray(Image.fromarray(
                        np.ascontiguousarray(fr)).resize((width, height),
                                                         Image.BILINEAR))
                batch.append(fr)
                if len(batch) == batch_size:
                    flush(batch)
                    batch = []
            if batch:
                flush(batch)
        except BaseException:
            # abort (incl. server-side job cancellation): don't leak the
            # encoder process and don't leave a half-written container
            if writer is not None:
                try:
                    writer.close()
                except Exception:
                    pass
                Path(writer.output_filepath).unlink(missing_ok=True)
            raise
        if frame_idx == 0:
            raise ValueError("video source yielded no frames")
        if output_type == "frames":
            return out_frames
        return writer.close()

    # ------------------------------------------------------------------
    def _ensure_upsampler(self, weights: Optional[str] = None):
        """Provision the Real-ESRGAN upsampler BEFORE frame generation
        starts (fail fast — the reference self-serves weights from the hub,
        ``upsampling.py:31-41``; this environment has no egress, so weights
        come from, in order: the ``upsample_weights=`` argument, the
        ``SDV_REALESRGAN`` env var, or a previously assigned
        ``pipeline.upsampler``)."""
        if self.upsampler is not None:
            return
        import os
        weights = weights or os.environ.get("SDV_REALESRGAN")
        if weights is not None and not Path(weights).exists():
            raise FileNotFoundError(
                f"upsample weights not found: {weights!r} (from "
                "upsample_weights=/--upsample-weights/SDV_REALESRGAN)")
        from .upsampling import RealESRGANModel
        if weights is None:
            raise FileNotFoundError(
                "upsample=True needs RealESRGAN_x4plus weights: pass "
                "upsample_weights=/path/to/RealESRGAN_x4plus.pth (CLI: "
                "--upsample-weights), set SDV_REALESRGAN, or assign "
                "pipeline.upsampler yourself. (The reference downloads "
                "them from the hub; no network egress here.)")
        self.upsampler = RealESRGANModel.from_pretrained(weights)

    def __call__(self, *args, **kwargs):
        """Single txt2img dispatch with precomputed embeddings/latents — the
        reference's extended ``__call__`` (``stable_diffusion_pipeline.py:
        191-455``).  See ``generate()``."""
        return self.generate(*args, **kwargs)

    def generate(self, prompt: Optional[Union[str, List[str]]] = None,
                 height: Optional[int] = None, width: Optional[int] = None,
                 num_inference_steps: int = 50, guidance_scale: float = 7.5,
                 eta: float = 0.0, latents: Optional[np.ndarray] = None,
                 text_embeddings: Optional[np.ndarray] = None,
                 negative_prompt: Optional[str] = None,
                 seed: Optional[int] = None,
                 output_type: str = "pil", return_dict: bool = False,
                 pooled_embeddings: Optional[np.ndarray] = None):
        """txt2img accepting precomputed ``text_embeddings`` and ``latents``
        (the key reference extension enabling walks).  ``return_dict=True``
        returns the reference ``__call__``'s dict shape
        (``stable_diffusion_pipeline.py:449-455``).  SDXL bundles take
        ``pooled_embeddings`` alongside precomputed ``text_embeddings``
        (derived from ``prompt`` otherwise)."""
        height = height or self.models.default_size
        width = width or self.models.default_size
        if text_embeddings is None:
            if prompt is None:
                raise ValueError("provide `prompt` or `text_embeddings`")
            prompts = [prompt] if isinstance(prompt, str) else list(prompt)
            text_embeddings = self.engine.embed_text(prompts)
            if self.models.is_xl and pooled_embeddings is None:
                pooled_embeddings = self.engine.embed_text_pooled(prompts)
        if self.models.is_xl and pooled_embeddings is None:
            raise ValueError("SDXL bundle: precomputed text_embeddings also "
                             "need pooled_embeddings")
        batch = text_embeddings.shape[0]
        if latents is None:
            shape = self._latent_shape(height, width)
            latents = np.concatenate([
                self.init_noise((seed or 0) + i, shape)
                for i in range(batch)])
        uncond = self.engine.embed_text(negative_prompt or "")
        xl_kw = {}
        if self.models.is_xl:
            xl_kw = dict(
                pooled=jax.numpy.asarray(pooled_embeddings),
                uncond_pooled=self.engine.embed_text_pooled(
                    negative_prompt or ""))
        with self.timer.stage("denoise"):
            images = self.engine.denoise_frames(
                jax.numpy.asarray(text_embeddings), uncond,
                jax.numpy.asarray(latents),
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale, eta=eta, **xl_kw)
        self.timer.add_frames(len(images))
        if return_dict:
            flags = (self.engine.check_safety(images) if self.safety
                     else np.zeros(len(images), bool))
            return {"images": self._postprocess(images),
                    "nsfw_content_detected": flags.tolist()}
        if output_type == "pil":
            return self._postprocess(images)
        return images
