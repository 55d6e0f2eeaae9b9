"""SDXL walk + refiner polish — the two-stage SDXL video recipe.

Generates walk frames with SDXL-base at 1024^2 (step-cached for ~1.6x
throughput), then optionally re-denoises every frame through the
SDXL-refiner at low strength — the standard base->refiner handoff, applied
per frame so the polish is temporally consistent (same strength/steps).

Run with real checkpoints:
    python examples/sdxl_walk.py --base /ckpts/sdxl-base-1.0 \
        --refiner /ckpts/sdxl-refiner-1.0 --output-dir dreams
Without --base it runs the tiny random-weight SDXL bundle as a smoke test
(any machine, no weights needed).
"""
import argparse
from pathlib import Path


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", default=None,
                    help="SDXL-base checkpoint dir or hub id (omit: tiny "
                         "random-weight smoke run)")
    ap.add_argument("--refiner", default=None,
                    help="SDXL-refiner checkpoint dir (optional)")
    ap.add_argument("--prompts", nargs="+",
                    default=["a cathedral of ice", "a forest of neon"])
    ap.add_argument("--seeds", nargs="+", type=int, default=[42, 1337])
    ap.add_argument("--steps", type=int, default=12,
                    help="interpolation steps per prompt pair")
    ap.add_argument("--num-inference-steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=None,
                    help="frame side (default: the model's native size)")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--step-cache", type=int, default=2)
    ap.add_argument("--refine-strength", type=float, default=0.2)
    ap.add_argument("--output-dir", default="./dreams")
    ap.add_argument("--name", default="sdxl_walk")
    ap.add_argument("--fps", type=int, default=12)
    args = ap.parse_args()

    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline

    if args.base:
        pipe = StableDiffusionWalkPipeline.from_pretrained(
            args.base, step_cache=args.step_cache)
    else:
        print("no --base: tiny random-weight SDXL smoke run")
        pipe = StableDiffusionWalkPipeline.tiny_xl(
            step_cache=args.step_cache)
        args.num_inference_steps = min(args.num_inference_steps, 8)
    assert pipe.models.is_xl, "checkpoint is not an SDXL layout"

    size = args.size or pipe.models.default_size
    video = pipe.walk(
        prompts=args.prompts, seeds=args.seeds,
        num_interpolation_steps=args.steps,
        num_inference_steps=args.num_inference_steps,
        height=size, width=size, batch_size=args.batch_size,
        fps=args.fps, output_dir=args.output_dir, name=args.name)
    print("base walk:", video)

    if args.refiner:
        import numpy as np
        from PIL import Image

        from stable_diffusion_videos_tpu.media.video import make_video
        refiner = StableDiffusionWalkPipeline.from_pretrained(
            args.refiner, scheduler="ddim")
        run_dir = Path(args.output_dir) / args.name
        frames = sorted(run_dir.glob("**/frame*.png"))
        # prompt for each frame follows its clip (consecutive prompt pairs)
        per_clip = args.steps
        refined_dir = run_dir / "refined"
        refined_dir.mkdir(exist_ok=True)
        for i, f in enumerate(frames):
            prompt = args.prompts[min(i // per_clip, len(args.prompts) - 1)]
            out = refiner.img2img(Image.open(f), prompt,
                                  strength=args.refine_strength,
                                  num_inference_steps=args.num_inference_steps,
                                  seed=i)[0]
            out.save(refined_dir / f.name)
        video = make_video(refined_dir, fps=args.fps,
                           output_filepath=str(run_dir / "refined.mp4"))
        print("refined:", video)


if __name__ == "__main__":
    main()
