"""One-shot checkpoint validation: ``sdv-tpu validate CKPT``.

The first-hour playbook for when a real SD checkpoint lands in this
(egress-free) environment (VERDICT r3 #5): a single command that runs every
quality stage end-to-end and emits one JSON report —

1. **load** — convert the checkpoint (diffusers dir / single ``.ckpt`` /
   native bundle) and report family + parameter counts;
2. **smoke** — one fixed-seed txt2img frame, finiteness + pixel stats;
3. **vae_roundtrip** — encode→decode PSNR on a synthetic image (real VAE
   weights land > ~20 dB; random weights report garbage, flagged);
4. **walk_parity** — the FIXED parity-gate walk vs a recorded reference
   frame dump, LPIPS/SSIM-gated (``utils/parity_gate.py``; the BASELINE.md
   north-star clause, reference seed semantics
   ``stable_diffusion_pipeline.py:822-838``);
5. **step_cache_curve** — same-seed exact vs ``step_cache=k`` quality
   (SSIM/PSNR + LPIPS when weights are given) so the fast-mode gate is
   re-measured on REAL weights, not just synth goldens;
6. **upsample** — Real-ESRGAN x4 on the smoke frame when weights are given.

Every stage is independent: missing optional inputs mark the stage
``skipped`` with a reason instead of failing the run, so the command works
today on the tiny test bundle and scales to the real thing unchanged:

    sdv-tpu validate /ckpts/sd-v1-4 \
        --reference-frames /dumps/reference_walk \
        --lpips-weights /ckpts/lpips_alex.pth \
        --upsample-weights /ckpts/RealESRGAN_x4plus.pth
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger("sdv_tpu")


def _stage(report: dict, name: str):
    """Context manager recording a stage's status/duration/error."""
    class _Ctx:
        def __enter__(self):
            self.t0 = time.perf_counter()
            self.entry = report["stages"][name] = {"status": "ok"}
            return self.entry

        def __exit__(self, et, ev, tb):
            self.entry["seconds"] = round(time.perf_counter() - self.t0, 2)
            if et is not None:
                self.entry["status"] = "error"
                self.entry["error"] = f"{et.__name__}: {str(ev)[:300]}"
                logger.exception("validate stage %r failed", name)
            # stages are independent — swallow stage Exceptions and keep
            # the run going, but NEVER KeyboardInterrupt/SystemExit (Ctrl-C
            # must abort the whole validation, not log a stage 'error')
            return ev is None or isinstance(ev, Exception)
    return _Ctx()


def _skip(report: dict, name: str, why: str):
    report["stages"][name] = {"status": "skipped", "reason": why}


def run_validation(checkpoint: str, output_dir: str = "./validate_out",
                   reference_frames: Optional[str] = None,
                   lpips_weights: Optional[str] = None,
                   upsample_weights: Optional[str] = None,
                   scheduler: str = "pndm",
                   num_inference_steps: int = 50,
                   height: Optional[int] = None,
                   width: Optional[int] = None,
                   step_cache_ks=(2, 3),
                   tokenizer_dir: Optional[str] = None) -> dict:
    """Run every validation stage against ``checkpoint``; returns (and
    writes ``<output_dir>/validation_report.json``) the combined report."""
    from ..pipeline.walk import StableDiffusionWalkPipeline

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    report: dict = {"checkpoint": str(checkpoint), "stages": {},
                    "config": {"scheduler": scheduler,
                               "num_inference_steps": num_inference_steps}}

    # ---- 1. load ------------------------------------------------------
    pipe = None
    with _stage(report, "load") as st:
        ckpt = Path(checkpoint)
        if ckpt.is_dir() and (ckpt / "bundle.json").exists():
            from ..models.bundle import SDModels
            models = SDModels.load(ckpt)
            pipe = StableDiffusionWalkPipeline(models, scheduler=scheduler)
            st["layout"] = "native bundle"
        else:
            pipe = StableDiffusionWalkPipeline.from_pretrained(
                str(checkpoint), scheduler=scheduler,
                tokenizer_dir=tokenizer_dir)
            st["layout"] = ("single-file" if ckpt.is_file()
                            else "diffusers directory")
        st["family"] = "sdxl" if pipe.models.is_xl else "sd"
        st["param_counts"] = pipe.models.param_count()
        st["default_size"] = pipe.models.default_size
    if pipe is None:
        report["pass"] = False
        _write(report, out)
        return report
    height = height or pipe.models.default_size
    width = width or pipe.models.default_size
    report["config"].update(height=height, width=width)

    # ---- 2. smoke generation -----------------------------------------
    smoke = None
    with _stage(report, "smoke") as st:
        smoke = pipe(prompt="a photograph of an astronaut riding a horse",
                     seed=42, num_inference_steps=num_inference_steps,
                     height=height, width=width, output_type="np")[0]
        st["shape"] = list(smoke.shape)
        st["finite"] = bool(np.isfinite(smoke).all())
        st["pixel_stats"] = {"min": round(float(smoke.min()), 4),
                             "max": round(float(smoke.max()), 4),
                             "mean": round(float(smoke.mean()), 4),
                             "std": round(float(smoke.std()), 4)}
        if not st["finite"]:
            st["status"] = "fail"
        from PIL import Image
        Image.fromarray((np.clip(smoke, 0, 1) * 255).astype(np.uint8)).save(
            out / "smoke_frame.png")

    # ---- 3. VAE round-trip -------------------------------------------
    with _stage(report, "vae_roundtrip") as st:
        from .metrics import psnr
        yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
        img = np.stack([np.sin(yy / 17) * 0.5 + 0.5,
                        np.cos(xx / 23) * 0.5 + 0.5,
                        ((yy + xx) % 97) / 97.0], axis=-1)[None]
        lat = pipe.engine.encode_image(img * 2.0 - 1.0)
        dec = np.asarray(pipe.engine.decode_latents(lat))
        st["psnr_db"] = round(psnr(dec[0], img[0], data_range=1.0), 2)
        # real SD VAEs reconstruct smooth synthetic content well; random
        # test weights do not — informational unless clearly broken
        st["looks_trained"] = bool(st["psnr_db"] > 18.0)

    # ---- 4. walk parity gate -----------------------------------------
    if reference_frames:
        with _stage(report, "walk_parity") as st:
            from .parity_gate import run_parity_gate
            res = run_parity_gate(pipe, reference_frames,
                                  str(out / "parity"),
                                  lpips_weights=lpips_weights,
                                  height=height, width=width)
            st.update(res)
            if not res.get("pass"):
                st["status"] = "fail"
    else:
        _skip(report, "walk_parity",
              "no --reference-frames dump supplied (record one with the "
              "upstream package; see utils/parity_gate.py docstring)")

    # ---- 5. step-cache quality curve ---------------------------------
    with _stage(report, "step_cache_curve") as st:
        from ..runtime.engine import Engine
        from .metrics import quality_vs_exact
        cond, uncond = pipe._embed_cond_uncond(
            "a watercolor painting of a fox in a forest", None)
        shape = pipe._latent_shape(height, width)
        noise = pipe.init_noise(1337, shape)
        kw = dict(num_inference_steps=num_inference_steps,
                  guidance_scale=7.5)
        exact = pipe.engine.denoise_frames(cond, uncond, noise, **kw)
        st["curve"] = {}
        for k in step_cache_ks:
            eng = Engine(pipe.models, mesh=pipe.engine.mesh,
                         scheduler=pipe.engine.scheduler_name, step_cache=k)
            frames = eng.denoise_frames(cond, uncond, noise, **kw)
            st["curve"][f"k{k}"] = quality_vs_exact(
                frames, exact, lpips_weights=lpips_weights)
        # the fast-preset composite (what fast=True actually ships) and its
        # non-uniform variant, gated on THESE weights
        for label, ekw in (
                ("fast_preset", dict(step_cache=3,
                                     guidance_interval=(0.1, 0.85))),
                ("fast_ends", dict(step_cache=3, step_cache_policy="ends",
                                   guidance_interval=(0.1, 0.85)))):
            eng = Engine(pipe.models, mesh=pipe.engine.mesh,
                         scheduler=pipe.engine.scheduler_name, **ekw)
            frames = eng.denoise_frames(cond, uncond, noise, **kw)
            st["curve"][label] = quality_vs_exact(
                frames, exact, lpips_weights=lpips_weights)
        # a saturated curve (every config pinned at the same PSNR) means
        # the gate measured plumbing, not quality — flag it (random-weight
        # caveat, VERDICT r4)
        psnrs = [c.get("psnr_mean") for c in st["curve"].values()
                 if c.get("psnr_mean") is not None]
        if len(psnrs) >= 2:
            st["psnr_spread_db"] = round(max(psnrs) - min(psnrs), 2)
            st["saturated"] = bool(st["psnr_spread_db"] < 3.0)

    # ---- 6. Real-ESRGAN upsample demo --------------------------------
    if upsample_weights:
        with _stage(report, "upsample") as st:
            from ..pipeline.upsampling import RealESRGANModel
            ups = RealESRGANModel.from_pretrained(upsample_weights)
            src = (smoke[None] if smoke is not None
                   else np.zeros((1, height, width, 3), np.float32))
            up = ups(np.asarray(src, np.float32))
            st["scale"] = int(up.shape[1] // src.shape[1])
            st["out_shape"] = list(np.asarray(up).shape)
            st["finite"] = bool(np.isfinite(up).all())
            from PIL import Image
            Image.fromarray((np.clip(np.asarray(up)[0], 0, 1) * 255)
                            .astype(np.uint8)).save(
                out / "smoke_frame_x4.png")
    else:
        _skip(report, "upsample", "no --upsample-weights supplied "
              "(RealESRGAN_x4plus.pth; converter: models/weights.py "
              "load_realesrgan)")

    # ---- verdict ------------------------------------------------------
    statuses = [s.get("status") for s in report["stages"].values()]
    report["pass"] = ("fail" not in statuses and "error" not in statuses)
    report["summary"] = {k: v.get("status")
                         for k, v in report["stages"].items()}
    _write(report, out)
    return report


def _write(report: dict, out: Path) -> None:
    path = out / "validation_report.json"
    path.write_text(json.dumps(report, indent=2, default=str))
    logger.info("validation report -> %s", path)
