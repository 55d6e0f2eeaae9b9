"""Step-cache (DeepCache) speedup measurement: 512^2/50-step CFG dispatch.

Measures the production engine exact vs step_cache k=2,3 (trunk recomputed
every k steps, shallow splice between) at the bench config, plus the
relative frame error vs the exact path (same seeds/weights, so the error is
purely the caching approximation).  Appends to tools/profile2_r02.json
under "step_cache".
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
                   "profile2_r02.json")
STEPS, SIDE, BATCH = 50, 512, int(sys.argv[1]) if len(sys.argv) > 1 else 8


def sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def main():
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

    ucfg, vcfg, tcfg = UNetConfig.sd_v1(), VAEConfig.sd_v1(), \
        CLIPTextConfig.tiny()
    dtype = jnp.bfloat16

    def init_zeros(model, *args):
        shapes = jax.eval_shape(lambda k: model.init(k, *args),
                                jax.random.PRNGKey(0))
        key = [jax.random.PRNGKey(1)]

        def mk(s):
            key[0], sub = jax.random.split(key[0])
            return (jax.random.normal(sub, s.shape, jnp.float32) * 0.02
                    ).astype(dtype if s.dtype == jnp.float32 else s.dtype)
        return jax.tree.map(mk, shapes)

    unet = UNet2DCondition(ucfg, dtype=dtype)
    vae = AutoencoderKL(vcfg, dtype=dtype)
    enc = CLIPTextEncoder(tcfg, dtype=dtype)
    params = {
        "unet": init_zeros(unet, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                           jnp.zeros((1, 77, ucfg.cross_attention_dim))),
        "vae": init_zeros(vae, jnp.zeros((1, 64, 64, 3))),
        "text_encoder": init_zeros(enc, jnp.zeros((1, 77), jnp.int32)),
    }
    models = SDModels(ucfg, vcfg, tcfg, params,
                      HashTokenizer(vocab_size=tcfg.vocab_size),
                      SchedulerConfig(), dtype=dtype)

    rng = np.random.default_rng(0)
    h = w = SIDE // vcfg.scale_factor
    cond = jnp.asarray(rng.standard_normal(
        (BATCH, 77, ucfg.cross_attention_dim), np.float32))
    noise = jnp.asarray(rng.standard_normal((BATCH, h, w, 4), np.float32))

    results = {}
    exact_frames = None
    for k in (None, 2, 3):
        engine = Engine(models, scheduler="pndm", batch_bucket=BATCH,
                        step_cache=k)
        name = "exact" if k is None else f"k{k}"
        entry = {}
        try:
            t0 = time.perf_counter()
            frames = engine.denoise_frames(cond, cond[:1], noise,
                                           num_inference_steps=STEPS)
            entry["compile_plus_first_s"] = round(time.perf_counter() - t0, 1)
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                frames = engine.denoise_frames(cond, cond[:1], noise,
                                               num_inference_steps=STEPS)
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            entry.update({"s_per_dispatch": round(dt, 2),
                          "frames_per_s_chip": round(BATCH / dt, 4)})
            if k is None:
                exact_frames = frames
            elif exact_frames is not None:
                # quality gate: the speedup is meaningless without it
                # (LPIPS added automatically when SDV_LPIPS_WEIGHTS is set)
                from stable_diffusion_videos_tpu.utils.metrics import \
                    quality_vs_exact
                q = quality_vs_exact(frames, exact_frames)
                entry["quality_vs_exact"] = q
                entry["rel_frame_err_vs_exact"] = q["rel_err"]
        except Exception as e:  # noqa: BLE001
            entry["error"] = f"{type(e).__name__}: {str(e)[:200]}"
        results[name] = entry
        print(json.dumps({name: entry}), flush=True)

    with open(OUT) as f:
        allr = json.load(f)
    allr.setdefault("step_cache_batches", {})[f"b{BATCH}"] = results
    allr["step_cache"] = allr.get("step_cache") or results
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)


if __name__ == "__main__":
    main()
