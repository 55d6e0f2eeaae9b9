"""Video-to-video restyling recipe — the vid2vid product path end-to-end.

Re-noises every frame of an input video partway (``--strength``) and
denoises it toward a prompt, with ONE temporally frozen re-noising sample so
the stochastic field does not flicker frame-to-frame.  Optionally locks the
structure with a ControlNet conditioned on canny edges derived from the
source frames on the fly (no offline preprocessing pass).

Run with a real checkpoint:
    python examples/restyle_video.py --checkpoint /ckpts/sd-v1-4 \
        --video input.mp4 --prompt "oil painting, impasto" --strength 0.45
Add structure locking (needs an edge-conditioned ControlNet):
    python examples/restyle_video.py --checkpoint /ckpts/sd-v1-4 \
        --controlnet /ckpts/control-canny --control-from-source \
        --video input.mp4 --prompt "ink sketch" --strength 0.8
Without --checkpoint it synthesises a source clip and runs the tiny
random-weight bundle as a smoke test (any machine, no weights needed).
"""
import argparse


def synth_source_clip(path: str, n: int = 12, h: int = 96, w: int = 128):
    """A tiny moving-gradient clip for the no-weights smoke path."""
    import numpy as np

    from stable_diffusion_videos_tpu.media.video import FrameWriter
    with FrameWriter(path, fps=8) as fw:
        for i in range(n):
            f = np.zeros((h, w, 3), np.uint8)
            f[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
            f[..., 2] = int(255 * i / (n - 1))
            fw.add_frame(f)
    return fw.output_filepath


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--controlnet", default=None)
    ap.add_argument("--control-from-source", action="store_true",
                    help="condition the ControlNet on canny edges of each "
                         "source frame")
    ap.add_argument("--video", default=None,
                    help="input video (omit to synthesise a smoke clip)")
    ap.add_argument("--prompt", default="an oil painting, impasto")
    ap.add_argument("--strength", type=float, default=0.45)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--output", default="styled.mp4")
    args = ap.parse_args()

    from stable_diffusion_videos_tpu.pipeline import (
        StableDiffusionWalkPipeline)
    if args.checkpoint:
        pipe = StableDiffusionWalkPipeline.from_pretrained(
            args.checkpoint, scheduler="ddim", controlnet=args.controlnet)
    else:
        print("no --checkpoint: tiny random-weight smoke run")
        pipe = StableDiffusionWalkPipeline.tiny(scheduler="ddim")
        args.steps = min(args.steps, 4)

    video = args.video or synth_source_clip("/tmp/restyle_src.mp4")
    out = pipe.vid2vid(
        video, args.prompt, strength=args.strength,
        num_inference_steps=args.steps, batch_size=args.batch_size,
        max_frames=args.max_frames, output_filepath=args.output,
        control_from_source=("canny" if args.control_from_source else None))
    print(out)
    print(pipe.timer.summary())


if __name__ == "__main__":
    main()
