"""Fast-mode composite sweep: step_cache x guidance_interval at 512^2/50.

Measures the production engine at the bench config (SD1.x, 512^2, 50-step
PNDM, CFG, batch 8, bf16) for each candidate approximate config, with the
SSIM/PSNR quality gate vs the exact path on identical seeds/weights (the
error is purely the approximation).  Picks the headline fast-mode config for
bench.py.  Appends results to tools/probe_r04.json.

Candidates:
  - step_cache=k      (DeepCache: full trunk every k steps, shallow splice)
  - guidance_interval (limited-interval CFG, Kynkaanniemi 2024: cond-only
    UNet batch outside [lo, hi) of the schedule)
  - composites of both (per-segment deep-trunk cache, r4)
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
                   "probe_r04.json")
STEPS = 50
SIDE = int(os.environ.get("SDV_PROBE_SIDE", "512"))
BATCH = int(os.environ.get("SDV_PROBE_BATCH", "8"))
# >512^2 frames need the tiled VAE decode to stay inside HBM
VAE_TILE = 64 if SIDE > 512 else None


def sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def build_models():
    from stable_diffusion_videos_tpu.core.schedulers import SchedulerConfig
    from stable_diffusion_videos_tpu.models import (CLIPTextConfig,
                                                    HashTokenizer)
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.models.clip_text import CLIPTextEncoder
    from stable_diffusion_videos_tpu.models.unet import (UNet2DCondition,
                                                         UNetConfig)
    from stable_diffusion_videos_tpu.models.vae import (AutoencoderKL,
                                                        VAEConfig)

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
    return SDModels(ucfg, vcfg, tcfg, params,
                    HashTokenizer(vocab_size=tcfg.vocab_size),
                    SchedulerConfig(), dtype=dtype), ucfg, vcfg


def main():
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    from stable_diffusion_videos_tpu.utils.metrics import quality_vs_exact

    models, ucfg, vcfg = build_models()
    rng = np.random.default_rng(0)
    h = w = SIDE // vcfg.scale_factor
    cond = jnp.asarray(rng.standard_normal(
        (BATCH, 77, ucfg.cross_attention_dim), np.float32))
    noise = jnp.asarray(rng.standard_normal((BATCH, h, w, 4), np.float32))

    import ast
    configs = [
        ("exact", {}),
        ("sc2", {"step_cache": 2}),
        ("gi_0_80", {"guidance_interval": (0.0, 0.8)}),
        ("sc2_gi_0_80", {"step_cache": 2,
                         "guidance_interval": (0.0, 0.8)}),
        ("sc2_gi_10_85", {"step_cache": 2,
                          "guidance_interval": (0.1, 0.85)}),
        ("sc3_gi_0_80", {"step_cache": 3,
                         "guidance_interval": (0.0, 0.8)}),
    ]
    if len(sys.argv) > 1:
        # round 2 usage: name=kwargs-dict pairs on the CLI, e.g.
        #   tpu_fastmode.py "sc3={'step_cache':3}" "sc4={'step_cache':4}"
        configs = [("exact", {})] + [
            (a.split("=", 1)[0], ast.literal_eval(a.split("=", 1)[1]))
            for a in sys.argv[1:]]

    results = {}
    exact_frames = None
    for name, kw in configs:
        kw = dict(kw)
        tome = kw.pop("tome", None)  # models-level lever (ops/tome.py)
        m = models.with_tome(*tome) if tome else models
        engine = Engine(m, scheduler="pndm", batch_bucket=BATCH,
                        vae_tile=VAE_TILE, **kw)
        entry = dict(kw, **({"tome": list(tome)} if tome else {}))
        if "guidance_interval" in entry:
            entry["guidance_interval"] = list(entry["guidance_interval"])
        try:
            t0 = time.perf_counter()
            frames = engine.denoise_frames(cond, cond[:1], noise,
                                           num_inference_steps=STEPS)
            entry["compile_plus_first_s"] = round(time.perf_counter() - t0, 1)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                frames = engine.denoise_frames(cond, cond[:1], noise,
                                               num_inference_steps=STEPS)
                ts.append(time.perf_counter() - t0)
            ts.sort()
            dt = ts[len(ts) // 2]
            entry.update({"s_per_dispatch": round(dt, 3),
                          "frames_per_s_chip": round(BATCH / dt, 4)})
            if name == "exact":
                exact_frames = frames
                entry["speedup_vs_exact"] = 1.0
            else:
                entry["speedup_vs_exact"] = round(
                    (BATCH / dt) / results["exact"]["frames_per_s_chip"], 3)
                entry["quality_vs_exact"] = quality_vs_exact(
                    np.asarray(frames, np.float32),
                    np.asarray(exact_frames, np.float32))
        except Exception as e:  # noqa: BLE001
            entry["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        results[name] = entry
        print(json.dumps({name: entry}), flush=True)

    allr = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            allr = json.load(f)
    allr.setdefault("fastmode_sweep", {}).update(
        {(f"s{SIDE}_" if SIDE != 512 else "")
         + (f"b{BATCH}_" if BATCH != 8 else "") + k: v
         for k, v in results.items()})
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)
    print("WROTE", OUT, flush=True)


if __name__ == "__main__":
    main()
