"""SDXL-base few-step probe at native 1024^2 (r5).

The SD1.x few-step study (tools/tpu_fewstep.py + trained gates in
gate_trained_r05.json) picked dpm-solver++ 20-25 steps x non-uniform
DeepCache k=2 "ends" as the production config.  This probe measures what
the same levers deliver on SDXL-base (2.57B UNet, 1024^2, batch 1, tiled
VAE) where the depth-2/10 transformer trunk makes caching far more
valuable (r3: uniform k=2 alone was 1.50x).

Random bf16 weights — FLOP/byte-identical to trained ones; the pixel gate
here proves plumbing (random-weight saturation caveat, docs/performance.md),
the step-count/caching QUALITY ordering evidence is the SD1 trained-weight
study, which is sampler/lever-level rather than family-specific.

Appends to tools/probe_r05.json under "sdxl_fewstep".
Run:  python tools/tpu_sdxl_fewstep.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

try:
    jax.devices("axon")
except Exception:
    print("AXON UNAVAILABLE - aborting", flush=True)
    sys.exit(7)

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r05.json")
SIDE = 1024
UNET_FLOP = 5.1e12   # SDXL-base fwd per 1024^2 sample
VAE_FLOP = 5.6e12


def main():
    from stable_diffusion_videos_tpu.core.schedulers import SchedulerConfig
    from stable_diffusion_videos_tpu.models import (CLIPTextConfig,
                                                    HashTokenizer)
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.models.clip_text import CLIPTextEncoder
    from stable_diffusion_videos_tpu.models.unet import UNet2DCondition
    from stable_diffusion_videos_tpu.models.vae import AutoencoderKL
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    from stable_diffusion_videos_tpu.utils.metrics import quality_vs_exact

    # shared bench scaffold (models/bundle.py random_bench): SDXL-base
    # geometry, 0.02-scale random bf16 params drawn in-dtype
    models = SDModels.random_bench("sdxl")
    ucfg, vcfg = models.unet_config, models.vae_config
    assert models.is_xl

    rng = np.random.default_rng(0)
    batch = 1
    h = w = SIDE // vcfg.scale_factor
    cond = jnp.asarray(rng.standard_normal(
        (batch, 77, ucfg.cross_attention_dim), np.float32))
    pooled = jnp.asarray(rng.standard_normal(
        (batch, ucfg.addition_pooled_dim), np.float32))
    noise = jnp.asarray(rng.standard_normal((batch, h, w, 4), np.float32))

    sweep = {"side": SIDE, "batch": batch, "vae_tile": 64}

    def run_config(name, steps, ref=None, **ekw):
        eng = Engine(models, scheduler="dpm", batch_bucket=batch,
                     vae_tile=64, **ekw)
        t0 = time.perf_counter()
        out = eng.denoise_frames(cond, cond[:1], noise,
                                 num_inference_steps=steps,
                                 pooled=pooled, uncond_pooled=pooled[:1])
        sub = {"compile_plus_first_s": round(time.perf_counter() - t0, 1)}
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = eng.denoise_frames(cond, cond[:1], noise,
                                     num_inference_steps=steps,
                                     pooled=pooled,
                                     uncond_pooled=pooled[:1])
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        sub.update({"s_per_dispatch": round(dt, 2),
                    "frames_per_s_chip": round(batch / dt, 4),
                    "implied_tflops": round(
                        batch / dt * (steps * 2 * UNET_FLOP + VAE_FLOP)
                        / 1e12, 1)})
        if ref is not None:
            sub["quality_vs_dpm50"] = quality_vs_exact(out, ref)
        sweep[name] = sub
        print(name, json.dumps(sub), flush=True)
        allr = {}
        if os.path.exists(OUT):
            with open(OUT) as f:
                allr = json.load(f)
        allr["sdxl_fewstep"] = sweep
        with open(OUT, "w") as f:
            json.dump(allr, f, indent=1)
        return out

    ref50 = run_config("dpm50_exact", 50)
    run_config("dpm25", 25, ref=ref50)
    run_config("dpm25_k2ends", 25, ref=ref50, step_cache=2,
               step_cache_policy="ends")
    run_config("dpm20_k2ends", 20, ref=ref50, step_cache=2,
               step_cache_policy="ends")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
