"""Fine-tune the UNet on a folder of images (DreamBooth-style overfit).

Beyond the reference's scope — the walk pipeline generates videos through
whatever concept you teach the UNet here.

Usage:
    python examples/finetune.py --images ./my_concept --prompt "a sks dog" \
        --checkpoint /ckpts/sd-v1-4 --steps 400 --out ./finetuned_bundle
    # LoRA (a few MB of adapters instead of a full bundle):
    python examples/finetune.py --images ./style --prompt "in sks style" \
        --checkpoint /ckpts/sd-v1-4 --lora-rank 8 --out ./style_lora.npz
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
    ap.add_argument("--lora-rank", type=int, default=0, metavar="R",
                    help="train rank-R LoRA adapters instead of the full "
                         "UNet (saves a small .npz; 0 = full fine-tune)")
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

    if args.lora_rank:
        import jax.numpy as jnp

        from stable_diffusion_videos_tpu.runtime.engine import Engine
        from stable_diffusion_videos_tpu.training import LoRATrainer
        engine = Engine(models)
        vae = models.vae()
        mean, _ = vae.apply(models.params["vae"],
                            jnp.asarray(images, jnp.float32),
                            method=type(vae).encode)
        latents = mean * models.vae_config.scaling_factor
        context = engine.embed_text(prompts)
        trainer = LoRATrainer(models, rank=args.lora_rank,
                              learning_rate=max(args.lr, 1e-4))
        losses = [trainer.step(latents, context) for _ in range(args.steps)]
        print(f"loss {losses[0]:.4f} -> {losses[-1]:.4f}")
        out = args.out if args.out.endswith(".npz") else args.out + ".npz"
        trainer.save_lora(out)
        print(f"saved LoRA adapters: {out}")
        print("use them:  lora, r, a = LoRATrainer.load_lora("
              f"'{out}'); models.params['unet'] = "
              "merge_lora(models.params['unet'], lora, a / r)")
        return

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
