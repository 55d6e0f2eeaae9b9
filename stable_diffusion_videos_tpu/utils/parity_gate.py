"""One-command real-weight parity gate (BASELINE.md north-star clause).

The BASELINE gate — "frames LPIPS-close to the reference pipeline's on the
same prompts/seeds" — cannot run in this environment (zero egress: no SD
weights, no diffusers).  Everything is pre-wired here so it runs the day a
checkpoint and a reference frame dump exist:

    sdv-tpu parity-gate --checkpoint /ckpts/sd-v1-4 \
        --reference-frames /dumps/reference_walk \
        --lpips-weights /ckpts/lpips_alex.pth

does: load checkpoint -> run the FIXED 2-prompt walk below (same config the
reference dump must use) -> frame-by-frame PSNR/SSIM/LPIPS -> PASS/FAIL.

Record the reference side once with the upstream package (GPU box):

    from stable_diffusion_videos import StableDiffusionWalkPipeline
    pipe = StableDiffusionWalkPipeline.from_pretrained(...).to("cuda")
    pipe.walk(prompts=list(GATE_PROMPTS), seeds=list(GATE_SEEDS),
              num_interpolation_steps=GATE_CONFIG["num_interpolation_steps"],
              num_inference_steps=GATE_CONFIG["num_inference_steps"],
              guidance_scale=GATE_CONFIG["guidance_scale"],
              height=512, width=512, output_dir="dumps",
              name="reference_walk", fps=5)

cf. reference ``stable_diffusion_pipeline.py:556-807`` (walk),
``tests/test_parity_gate.py`` (plumbing dry-run with tiny goldens).
"""

from __future__ import annotations

import logging
from pathlib import Path

logger = logging.getLogger("sdv_tpu")

#: the gate's FIXED walk config — both sides must generate exactly this
GATE_PROMPTS = ("a photograph of an astronaut riding a horse",
                "a watercolor painting of a fox in a forest")
GATE_SEEDS = (42, 1337)
GATE_CONFIG = dict(num_interpolation_steps=4, num_inference_steps=50,
                   guidance_scale=7.5, fps=5)

#: LPIPS below this = "same image modulo fp/scheduler noise" (the customary
#: bound; reference frames re-generated on different CUDA kernels land
#: around 0.02-0.05 against themselves)
LPIPS_PASS = 0.1
SSIM_PASS = 0.85  # fallback gate when no LPIPS weights are supplied


def run_parity_gate(pipeline, reference_frames: str, output_dir: str,
                    lpips_weights: str | None = None,
                    lpips_net: str = "alex",
                    height: int | None = None,
                    width: int | None = None) -> dict:
    """Run the fixed gate walk on ``pipeline`` and compare against
    ``reference_frames`` (a reference-pipeline walk output dir).  Returns
    the compare dict + ``{"pass": bool, "gate": str}``."""
    from .metrics import compare_frame_dirs

    ref = Path(reference_frames)
    if not ref.exists():
        raise FileNotFoundError(f"reference frame dir {ref} does not exist")

    pipeline.walk(prompts=list(GATE_PROMPTS), seeds=list(GATE_SEEDS),
                  output_dir=output_dir, name="parity_gate",
                  make_video=False, height=height, width=width,
                  **GATE_CONFIG)
    ours = Path(output_dir) / "parity_gate"
    res = compare_frame_dirs(ours, ref, lpips_weights=lpips_weights,
                             lpips_net=lpips_net)
    if "lpips_mean" in res:
        res["gate"] = f"lpips_mean < {LPIPS_PASS}"
        res["pass"] = bool(res["lpips_mean"] < LPIPS_PASS)
    else:
        res["gate"] = (f"ssim_mean > {SSIM_PASS} (no LPIPS weights — "
                       "supply --lpips-weights for the real gate)")
        res["pass"] = bool(res["ssim_mean"] > SSIM_PASS)
    res["frames_dir"] = str(ours)
    logger.info("parity gate %s: %s", "PASS" if res["pass"] else "FAIL",
                res["gate"])
    return res
