"""Few-step (dpm-solver++) speed sweep at full SD1.x geometry (r5).

The trained-weight gates (tools/gate_trained_r05.json) rank the few-step
configs by quality:

  dpm25 plain        SSIM 0.978 / 41.1 dB   (best)
  dpm25 + k2 ends    SSIM 0.974 / 40.1 dB   (composite, nearly free)
  dpm25 + k2         SSIM 0.965 / 38.3 dB
  dpm25 + k3         SSIM 0.943 / 33.9 dB   (too aggressive)
  dpm25 + k2 + gi    SSIM 0.949 / 34.1 dB   (gi hurts at 25 steps)

This tool measures what each quality-acceptable config actually DELIVERS
in frames/s/chip at 512^2 bf16 (random weights — FLOP-identical), batch 8
and 16, so bench.py's few-step record ships the measured-best config.
Writes tools/probe_r05.json under "fewstep_sweep".

Run:  python tools/tpu_fewstep.py
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "tools", "probe_r05.json")


def main() -> None:
    import jax
    try:
        jax.devices("axon")
    except Exception:
        print("axon unavailable", file=sys.stderr)
        sys.exit(7)
    import jax.numpy as jnp
    import numpy as np

    from stable_diffusion_videos_tpu.core.schedulers import SchedulerConfig
    from stable_diffusion_videos_tpu.models import (CLIPTextConfig,
                                                    HashTokenizer)
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.models.clip_text import CLIPTextEncoder
    from stable_diffusion_videos_tpu.models.unet import (UNet2DCondition,
                                                         UNetConfig)
    from stable_diffusion_videos_tpu.models.vae import (AutoencoderKL,
                                                        VAEConfig)
    from stable_diffusion_videos_tpu.runtime.engine import Engine

    # shared bench scaffold (models/bundle.py random_bench): SD1.x
    # geometry, 0.02-scale random bf16 params drawn in-dtype
    models = SDModels.random_bench("sd1")
    ucfg = models.unet_config
    rng = np.random.default_rng(0)

    def sync(x):
        np.asarray(jax.device_get(x[(0,) * x.ndim]))

    def measure(batch, steps, n_runs=3, **ekw):
        eng = Engine(models, scheduler="dpm", batch_bucket=batch, **ekw)
        cond = jnp.asarray(rng.standard_normal(
            (batch, 77, ucfg.cross_attention_dim), np.float32))
        noise = jnp.asarray(rng.standard_normal((batch, 64, 64, 4),
                                                np.float32))
        t0 = time.perf_counter()
        imgs, _ = eng.denoise_frames_async(cond, cond[:1], noise,
                                           num_inference_steps=steps)
        sync(imgs)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fut, _ = eng.denoise_frames_async(cond, cond[:1], noise,
                                              num_inference_steps=steps)
            sync(fut)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        return {"s_per_dispatch": round(dt, 3),
                "frames_per_s_chip": round(batch / dt, 4),
                "compile_plus_first_s": round(compile_s, 1),
                "times": [round(t, 3) for t in times]}

    sweep = {}
    configs = [
        ("dpm50_b8_exact", dict(batch=8, steps=50)),
        ("dpm25_b8", dict(batch=8, steps=25)),
        ("dpm25_b16", dict(batch=16, steps=25)),
        ("dpm25_b8_k2ends", dict(batch=8, steps=25, step_cache=2,
                                 step_cache_policy="ends")),
        ("dpm25_b16_k2ends", dict(batch=16, steps=25, step_cache=2,
                                  step_cache_policy="ends")),
        ("dpm20_b8", dict(batch=8, steps=20)),
        ("dpm20_b8_k2ends", dict(batch=8, steps=20, step_cache=2,
                                 step_cache_policy="ends")),
    ]
    for name, kw in configs:
        try:
            sweep[name] = measure(**kw)
            print(name, json.dumps(sweep[name]), flush=True)
        except Exception as e:  # noqa: BLE001
            sweep[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(name, "FAILED", sweep[name]["error"], flush=True)
        allr = {}
        if os.path.exists(OUT):
            with open(OUT) as f:
                allr = json.load(f)
        allr["fewstep_sweep"] = sweep
        with open(OUT, "w") as f:
            json.dump(allr, f, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
