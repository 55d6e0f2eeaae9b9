"""High-resolution probe: the full denoise engine at 768^2 and 1024^2.

The reference never runs above 512^2 (its TPU notebook caps at batch 3 per
v2 core at 512^2); this measures what one v5e chip sustains at 768^2 and
1024^2 with the production engine — flash attention for the S>=8192
self-attention levels (the XLA path's fp32 score matrix cannot fit HBM at
1024^2) and tiled VAE decode at 1024^2.

Timing: device-to-host fetch per dispatch (axon rule).  Appends results to
tools/profile2_r02.json under "highres" and prints one JSON line each.
Usage: python tools/tpu_highres.py [side ...]   (default: 768 1024)
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

# (batch, vae_tile latent side or None for fused whole-frame decode)
CONFIGS = {768: (2, None), 1024: (1, 64)}
STEPS = 50
UNET_FLOP_512 = 0.34e12
VAE_FLOP_512 = 1.4e12


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

    sides = [int(a) for a in sys.argv[1:]] or list(CONFIGS)
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
        "unet": init_zeros(unet, jnp.zeros((1, 8, 8, ucfg.in_channels)),
                           jnp.zeros((1,)),
                           jnp.zeros((1, 77, ucfg.cross_attention_dim))),
        "vae": init_zeros(vae, jnp.zeros((1, 64, 64, 3))),
        "text_encoder": init_zeros(enc, jnp.zeros((1, 77), jnp.int32)),
    }
    models = SDModels(ucfg, vcfg, tcfg, params,
                      HashTokenizer(vocab_size=tcfg.vocab_size),
                      SchedulerConfig(), dtype=dtype)

    results = {}
    rng = np.random.default_rng(0)
    for side in sides:
        batch, tile = CONFIGS[side]
        engine = Engine(models, scheduler="pndm", batch_bucket=batch,
                        vae_tile=tile)
        h = w = side // vcfg.scale_factor
        cond = jnp.asarray(rng.standard_normal(
            (batch, 77, ucfg.cross_attention_dim), np.float32))
        noise = jnp.asarray(rng.standard_normal((batch, h, w, 4), np.float32))
        entry = {"batch": batch, "steps": STEPS, "vae_tile": tile}
        for attempt in range(3):
            try:
                t0 = time.perf_counter()
                out = engine.denoise_frames(cond, cond[:1], noise,
                                            num_inference_steps=STEPS)
                entry["compile_plus_first_s"] = round(
                    time.perf_counter() - t0, 1)
                ts = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    out = engine.denoise_frames(cond, cond[:1], noise,
                                                num_inference_steps=STEPS)
                    ts.append(time.perf_counter() - t0)
                dt = min(ts)
                s = (side / 512.0) ** 2
                fl = STEPS * 2 * UNET_FLOP_512 * s + VAE_FLOP_512 * s
                entry.update({
                    "s_per_dispatch": round(dt, 2),
                    "frames_per_s_chip": round(batch / dt, 4),
                    "implied_tflops": round(batch / dt * fl / 1e12, 1),
                    "out_shape": list(out.shape),
                })
                break
            except Exception as e:  # noqa: BLE001
                msg = f"{type(e).__name__}: {str(e)[:200]}"
                print(f"# {side}: attempt {attempt}: {msg}",
                      file=sys.stderr, flush=True)
                entry["error"] = msg
                if "RESOURCE_EXHAUSTED" in str(e):
                    break  # OOM is a result, not a transient
                time.sleep(45)
        results[str(side)] = entry
        print(json.dumps({str(side): entry}), flush=True)

    with open(OUT) as f:
        allr = json.load(f)
    allr.setdefault("highres", {}).update(results)
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)


if __name__ == "__main__":
    main()
