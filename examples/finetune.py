"""Fine-tune the UNet on a folder of images (DreamBooth-style overfit).

Beyond the reference's scope — the walk pipeline generates videos through
whatever concept you teach the UNet here.

Usage:
    python examples/finetune.py --images ./my_concept --prompt "a sks dog" \
        --checkpoint /ckpts/sd-v1-4 --steps 400 --out ./finetuned_bundle
    # smoke: python examples/finetune.py --tiny --images ... --steps 5
"""

import argparse
from pathlib import Path

import numpy as np


def load_images(folder, side):
    from PIL import Image
    paths = sorted(p for p in Path(folder).iterdir()
                   if p.suffix.lower() in (".png", ".jpg", ".jpeg", ".webp"))
    if not paths:
        raise SystemExit(f"no images in {folder}")
    out = []
    for p in paths:
        img = Image.open(p).convert("RGB").resize((side, side))
        out.append(np.asarray(img, np.float32) / 127.5 - 1.0)
    return np.stack(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--out", default="./finetuned_bundle")
    args = ap.parse_args()

    from stable_diffusion_videos_tpu import SDModels, UNetTrainer
    from stable_diffusion_videos_tpu.training import TrainConfig

    if args.tiny or args.checkpoint is None:
        models = SDModels.tiny()
    else:
        models = SDModels.from_pretrained(args.checkpoint)

    side = models.default_size
    images = load_images(args.images, side)
    prompts = [args.prompt] * len(images)

    trainer = UNetTrainer(models, config=TrainConfig(learning_rate=args.lr))
    losses = trainer.finetune(images, prompts, num_steps=args.steps,
                              log_every=max(args.steps // 20, 1))
    print(f"loss {losses[0]:.4f} -> {losses[-1]:.4f}")

    models.params = trainer.export_params()
    out = models.save(args.out)
    print(f"saved fine-tuned bundle: {out}")
    print("use it: StableDiffusionWalkPipeline(SDModels.load("
          f"'{out}')).walk(...)")


if __name__ == "__main__":
    main()
