"""Launch the two-tab gradio app (cf. reference ``examples/run_app.py``).

The reference enables xformers memory-efficient attention here
(``examples/run_app.py:19-20``); on TPU the Pallas flash-attention backend is
selected automatically for long sequences, so there is nothing to enable.

Usage:
    python examples/run_app.py --checkpoint /path/to/sd-v1-4 [--tiny]
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None,
                    help="local diffusers-layout SD v1.x directory")
    ap.add_argument("--tiny", action="store_true",
                    help="random tiny model (smoke-test the UI)")
    ap.add_argument("--scheduler", default="pndm")
    ap.add_argument("--share", action="store_true")
    args = ap.parse_args()

    from stable_diffusion_videos_tpu import Interface, StableDiffusionWalkPipeline

    if args.tiny or args.checkpoint is None:
        print("no --checkpoint given: using a random tiny model")
        pipeline = StableDiffusionWalkPipeline.tiny(scheduler=args.scheduler)
    else:
        pipeline = StableDiffusionWalkPipeline.from_pretrained(
            args.checkpoint, scheduler=args.scheduler)

    Interface(pipeline).launch(share=args.share, debug=True)


if __name__ == "__main__":
    main()
