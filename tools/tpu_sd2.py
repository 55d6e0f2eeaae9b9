"""SD 2.x on-TPU probe: 512^2/50-step CFG engine dispatch, batch 8.

SD2.x uses 64-channel attention heads at every level (vs SD1.x's 40 at
levels 0/1), which lifts the MXU's 128-lane contraction utilisation from
31% to 50% on the dominant self-attention — this measures what that is
worth end-to-end.  Appends to profile2_r02.json under "sd2".
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
UNET_FLOP_512 = 0.34e12  # SD2-base is within a few % of SD1.x FLOPs
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

    ucfg, vcfg = UNetConfig.sd_v2(), VAEConfig.sd_v1()
    tcfg = CLIPTextConfig.tiny()
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
    engine = Engine(models, scheduler="pndm", batch_bucket=BATCH)

    rng = np.random.default_rng(0)
    h = w = SIDE // vcfg.scale_factor
    cond = jnp.asarray(rng.standard_normal(
        (BATCH, 77, ucfg.cross_attention_dim), np.float32))
    noise = jnp.asarray(rng.standard_normal((BATCH, h, w, 4), np.float32))

    entry = {"steps": STEPS, "side": SIDE, "batch": BATCH,
             "heads": list(ucfg.attention_head_dim)}
    t0 = time.perf_counter()
    out = engine.denoise_frames(cond, cond[:1], noise,
                                num_inference_steps=STEPS)
    entry["compile_plus_first_s"] = round(time.perf_counter() - t0, 1)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        out = engine.denoise_frames(cond, cond[:1], noise,
                                    num_inference_steps=STEPS)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    fl = STEPS * 2 * UNET_FLOP_512 + VAE_FLOP_512
    entry.update({"s_per_dispatch": round(dt, 2),
                  "frames_per_s_chip": round(BATCH / dt, 4),
                  "implied_tflops": round(BATCH / dt * fl / 1e12, 1),
                  "out_shape": list(out.shape)})
    print(json.dumps(entry), flush=True)

    with open(OUT) as f:
        allr = json.load(f)
    allr.setdefault("sd2_batches", {})[f"b{BATCH}"] = entry
    allr["sd2"] = entry
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)


if __name__ == "__main__":
    main()
