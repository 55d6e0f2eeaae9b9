"""Audio-reactive music video recipe (cf. reference
``examples/make_music_video.py``, which targets a 24 GB A10 with
``batch_size=12`` at ``examples/make_music_video.py:50``).

Interpolation step counts are derived from beat offsets so each clip spans
exactly its audio segment at the target fps; the denoise batch is sized for
one TPU dispatch.

Usage:
    python examples/make_music_video.py --audio song.wav \
        --checkpoint /path/to/sd-v1-4 [--tiny]
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio", required=True, help="WAV file")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--output-dir", default="./dreams")
    ap.add_argument("--offsets", type=float, nargs="+",
                    default=[0.0, 5.0, 10.0, 15.0],
                    help="audio second marks; one prompt per mark")
    ap.add_argument("--prompts", nargs="+", default=[
        "blueberry spaghetti", "strawberry spaghetti",
        "butterfly macro photo", "a galaxy of stars"])
    args = ap.parse_args()

    from stable_diffusion_videos_tpu import StableDiffusionWalkPipeline

    if len(args.prompts) != len(args.offsets):
        raise SystemExit("need one prompt per audio offset")

    if args.tiny or args.checkpoint is None:
        pipeline = StableDiffusionWalkPipeline.tiny()
        args.steps = min(args.steps, 5)
    else:
        pipeline = StableDiffusionWalkPipeline.from_pretrained(args.checkpoint)

    # seconds between marks -> interpolation steps per clip
    num_interpolation_steps = [
        int(round((b - a) * args.fps))
        for a, b in zip(args.offsets, args.offsets[1:])]

    video = pipeline.walk(
        prompts=args.prompts,
        seeds=[42 + i for i in range(len(args.prompts))],
        num_interpolation_steps=num_interpolation_steps,
        audio_filepath=args.audio,
        audio_start_sec=args.offsets[0],
        fps=args.fps,
        batch_size=args.batch_size,
        num_inference_steps=args.steps,
        output_dir=args.output_dir,
        margin=1.0,
        smooth=0.2,
    )
    print(f"music video: {video}")


if __name__ == "__main__":
    main()
