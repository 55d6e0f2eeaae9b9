"""SDXL-base + step_cache=2 on-TPU probe at native 1024^2.

Runs the production engine (CFG scan + text_time conditioning + tiled VAE
decode in the dispatch path) with random bf16 weights — FLOP/byte cost is
identical to trained ones.  SDXL's attention geometry is TPU-friendlier
than SD1.x at high res: level 0 carries no attention, levels 1/2 run
S=4096/1024 at head_dim 64.

Appends results to tools/profile2_r02.json under "sdxl" and prints one
JSON line.  Usage: python tools/tpu_sdxl.py [batch ...] (default: 1 2)
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
STEPS = 50
SIDE = 1024
# SDXL-base UNet fwd ~= 5.1 TFLOP per 1024^2 sample; VAE decode ~= 5.6 TFLOP
UNET_FLOP = 5.1e12
VAE_FLOP = 5.6e12


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

    batches = [int(a) for a in sys.argv[1:]] or [1, 2]
    ucfg, vcfg, _, _ = SDModels.sd_xl_configs()
    tcfg = CLIPTextConfig.tiny()  # towers don't matter for the denoise cost
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
                           jnp.zeros((1, 77, ucfg.cross_attention_dim)),
                           jnp.zeros((1, ucfg.addition_pooled_dim)),
                           jnp.zeros((1, 6))),
        "vae": init_zeros(vae, jnp.zeros((1, 64, 64, 3))),
        "text_encoder": init_zeros(enc, jnp.zeros((1, 77), jnp.int32)),
    }
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(params["unet"]))
    print(f"# sdxl unet params: {n_params/1e9:.2f}B", flush=True)
    models = SDModels(ucfg, vcfg, tcfg, params,
                      HashTokenizer(vocab_size=tcfg.vocab_size),
                      SchedulerConfig(), dtype=dtype)
    # tiny_xl-style second tower config marker so models.is_xl paths engage
    assert models.is_xl

    results = {"unet_params_b": round(n_params / 1e9, 2)}
    rng = np.random.default_rng(0)
    h = w = SIDE // vcfg.scale_factor
    for batch in batches:
        cond = jnp.asarray(rng.standard_normal(
            (batch, 77, ucfg.cross_attention_dim), np.float32))
        pooled = jnp.asarray(rng.standard_normal(
            (batch, ucfg.addition_pooled_dim), np.float32))
        noise = jnp.asarray(rng.standard_normal((batch, h, w, 4), np.float32))
        entry = {"steps": STEPS, "side": SIDE, "vae_tile": 64}
        try:
            exact_frames = None
            for k in (None, 2):
                engine = Engine(models, scheduler="pndm", batch_bucket=batch,
                                vae_tile=64, step_cache=k,
                                step_cache_split=1)
                sub = {}
                t0 = time.perf_counter()
                out = engine.denoise_frames(
                    cond, cond[:1], noise, num_inference_steps=STEPS,
                    pooled=pooled, uncond_pooled=pooled[:1])
                sub["compile_plus_first_s"] = round(
                    time.perf_counter() - t0, 1)
                ts = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    out = engine.denoise_frames(
                        cond, cond[:1], noise, num_inference_steps=STEPS,
                        pooled=pooled, uncond_pooled=pooled[:1])
                    ts.append(time.perf_counter() - t0)
                dt = min(ts)
                fl = STEPS * 2 * UNET_FLOP + VAE_FLOP
                sub.update({
                    "s_per_dispatch": round(dt, 2),
                    "frames_per_s_chip": round(batch / dt, 4),
                    "implied_tflops": round(batch / dt * fl / 1e12, 1),
                    "out_shape": list(out.shape),
                })
                if k is None:
                    exact_frames = out
                    entry["exact"] = sub
                else:
                    # quality gate next to the speedup — never quote the
                    # 1.58x without it (SDV_LPIPS_WEIGHTS adds LPIPS)
                    from stable_diffusion_videos_tpu.utils.metrics import \
                        quality_vs_exact
                    sub["quality_vs_exact"] = quality_vs_exact(out,
                                                               exact_frames)
                    sub["speedup_vs_exact"] = round(
                        entry["exact"]["s_per_dispatch"]
                        / sub["s_per_dispatch"], 3)
                    entry[f"k{k}"] = sub
        except Exception as e:  # noqa: BLE001
            entry["error"] = f"{type(e).__name__}: {str(e)[:200]}"
        results[f"b{batch}"] = entry
        print(json.dumps({f"b{batch}": entry}), flush=True)
        if "error" in entry and "RESOURCE_EXHAUSTED" in entry["error"]:
            break

    with open(OUT) as f:
        allr = json.load(f)
    allr["sdxl_stepcache"] = results
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)


if __name__ == "__main__":
    main()
