"""Train the committed quality-gate checkpoint (VERDICT r4 #3).

Overfits the SMALL bundle (``SDModels.small``: ~32x32 images) on the
8-pattern structured dataset (``training/structured_data.py``):

  1. VAE — reconstruction + KL until recon PSNR >= target,
  2. UNet — epsilon objective in that VAE's latent space, with
     classifier-free-guidance dropout (10% uncond rows) so CFG sampling
     works, until per-prompt samples IDENTIFY as their training pattern
     (each sample correlates best with its own image) and sample PSNR
     stops improving.

Outputs (committed):
  - tests/goldens/structured_bundle/  — the trained checkpoint
  - tools/train_structured_r05.json  — losses / PSNRs / identification
  - docs/assets/structured_samples.png — training images vs samples grid

Run:  python tools/train_structured.py   (TPU ~5 min; CPU fallback slower —
set SDV_TRAIN_CPU=1 to force CPU)
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("SDV_TRAIN_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
else:
    try:
        jax.devices()
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
    except Exception:  # no TPU grant — CPU fallback
        jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_BUNDLE = os.path.join(REPO, "tests", "goldens", "structured_bundle")
OUT_JSON = os.path.join(REPO, "tools", "train_structured_r05.json")
OUT_PNG = os.path.join(REPO, "docs", "assets", "structured_samples.png")

SIZE = 32
VAE_TARGET_PSNR = 28.0
VAE_MAX_STEPS = 4000
UNET_MAX_STEPS = 20000
CFG_DROPOUT = 0.1
GUIDANCE = 3.0
SAMPLE_STEPS = 50


def identify(samples: np.ndarray, images: np.ndarray):
    """Identification gate (single definition: training/structured_data.py)
    + each sample's PSNR vs its OWN image."""
    from stable_diffusion_videos_tpu.training import identify_patterns
    ids = identify_patterns(samples, images)
    mse = ((samples - images) ** 2).mean((1, 2, 3))
    psnr = 10 * np.log10(4.0 / np.maximum(mse, 1e-12))
    return ids, psnr


def main():
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    from stable_diffusion_videos_tpu.training import (TrainConfig,
                                                      UNetTrainer, VAETrainer,
                                                      make_structured_dataset)

    t_start = time.time()
    images, prompts = make_structured_dataset(SIZE)
    models = SDModels.small(seed=0)
    report = {"size": SIZE, "prompts": prompts,
              "backend": jax.default_backend(),
              "param_count": models.param_count()}
    print("params:", report["param_count"], flush=True)

    # ---- 1. VAE ---------------------------------------------------------
    vt = VAETrainer(models, learning_rate=1e-3)
    vae_log = []
    for i in range(VAE_MAX_STEPS):
        rec = vt.step(images)
        if i % 200 == 0:
            psnr = vt.recon_psnr(images)
            vae_log.append({"step": i, "recon_mse": rec,
                            "recon_psnr_db": round(psnr, 2)})
            print(f"vae step {i} mse {rec:.5f} psnr {psnr:.2f} dB",
                  flush=True)
            if psnr >= VAE_TARGET_PSNR and i >= 600:
                break
    vae_params = vt.export_params()
    report["vae"] = {"steps": vt.step_count,
                     "final_recon_psnr_db": round(vt.recon_psnr(images), 2),
                     "log": vae_log}
    models = dataclasses.replace(
        models, params={**models.params, "vae": vae_params})

    # ---- 2. UNet in the trained latent space ----------------------------
    vae = models.vae()
    mean, _ = vae.apply(models.params["vae"], jnp.asarray(images),
                        method=type(vae).encode)
    latents = np.asarray(mean) * models.vae_config.scaling_factor
    eng0 = Engine(models, scheduler="ddim")
    context = np.asarray(eng0.embed_text(prompts))
    uncond = np.asarray(eng0.embed_text(""))

    ut = UNetTrainer(models, config=TrainConfig(learning_rate=4e-4,
                                                weight_decay=0.0))
    rng = np.random.default_rng(0)
    unet_log, best = [], None
    n = len(images)
    for i in range(UNET_MAX_STEPS):
        ctx = context.copy()
        drop = rng.random(n) < CFG_DROPOUT
        ctx[drop] = uncond[0]
        loss = ut.step(latents, ctx, key=jax.random.PRNGKey(i))
        if (i + 1) % 2000 == 0:
            # sample-check: fresh engine on the CURRENT weights
            m = dataclasses.replace(
                models, params=ut.export_params())  # full dict, unet swapped
            eng = Engine(m, scheduler="ddim", batch_bucket=n)
            noise = jnp.asarray(rng.standard_normal(
                (n, SIZE // 2, SIZE // 2, 4), np.float32))
            frames = eng.denoise_frames(
                eng.embed_text(prompts), eng.embed_text(""), noise,
                num_inference_steps=SAMPLE_STEPS, guidance_scale=GUIDANCE,
                key=jax.random.PRNGKey(0))
            samples = np.asarray(frames) * 2.0 - 1.0
            ids, psnr = identify(samples, images)
            acc = float((ids == np.arange(n)).mean())
            entry = {"step": i + 1, "loss": round(loss, 5),
                     "ident_acc": acc,
                     "sample_psnr_db": [round(float(p), 2) for p in psnr]}
            unet_log.append(entry)
            print(f"unet step {i+1} loss {loss:.5f} ident {acc:.2f} "
                  f"psnr {np.mean(psnr):.2f} dB", flush=True)
            if best is None or (acc, np.mean(psnr)) >= best[:2]:
                best = (acc, float(np.mean(psnr)),
                        ut.export_params()["unet"], samples)
            if acc == 1.0 and i + 1 >= 8000:
                break
    acc, mean_psnr, unet_params, samples = best
    report["unet"] = {"steps": ut.step_count, "ident_acc": acc,
                      "mean_sample_psnr_db": round(mean_psnr, 2),
                      "log": unet_log,
                      "cfg_dropout": CFG_DROPOUT, "guidance": GUIDANCE}

    # ---- 3. persist -----------------------------------------------------
    final = dataclasses.replace(
        models, params={**models.params, "unet": unet_params})
    final.save(OUT_BUNDLE)
    report["bundle"] = OUT_BUNDLE
    report["wall_s"] = round(time.time() - t_start, 1)

    os.makedirs(os.path.dirname(OUT_PNG), exist_ok=True)
    try:
        from PIL import Image
        top = np.concatenate(list((images + 1) / 2), axis=1)
        bot = np.concatenate(list((samples + 1) / 2), axis=1)
        grid = (np.clip(np.concatenate([top, bot], axis=0), 0, 1)
                * 255).astype(np.uint8)
        Image.fromarray(grid).resize((grid.shape[1] * 4, grid.shape[0] * 4),
                                     Image.NEAREST).save(OUT_PNG)
        report["grid"] = OUT_PNG
    except Exception as e:  # noqa: BLE001
        report["grid_error"] = str(e)

    with open(OUT_JSON, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("vae", "unet")}, indent=1))
    print(f"ident_acc={acc} mean_sample_psnr={mean_psnr:.2f} dB")


if __name__ == "__main__":
    main()
