"""Root-cause the SD2 batch-8 engine-program pathology (VERDICT r2 item 2).

r2 isolated by elimination: not heads, not attention, not the bare UNet
(equal cost at equal batch) — so the cliff lives in the ENGINE program
(CFG scan + VAE decode fused).  This tool splits the b8 and b16 programs
into components and dumps optimized HLO for a direct diff:

* full        — the production program (scan + VAE), float32 out
* latents     — scan only (vae_tile sentinel makes the program return
                raw latents; called via the compiled fn directly)
* vae         — VAE decode alone on latents
* HLO         — compiled.as_text() of full b8/b16 -> tools/hlo_sd2_b{8,16}.txt
                + op-kind histogram comparison (b8 counts x2 vs b16)

Modes: ``--compile-only`` (populate the persistent cache; safe to run while
the host is busy) then ``--time`` (quiet-host timing; D2H-synced).
Appends "sd2_b8_rca" to tools/sd2_b8_r03.json.
"""
import json
import os
import re
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

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "sd2_b8_r03.json")
STEPS, SIDE = 50, 512
UNET_FLOP_512 = 0.34e12
VAE_FLOP_512 = 1.4e12


def sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def build_models():
    from stable_diffusion_videos_tpu.core.schedulers import SchedulerConfig
    from stable_diffusion_videos_tpu.models import (CLIPTextConfig,
                                                    HashTokenizer)
    from stable_diffusion_videos_tpu.models.clip_text import CLIPTextEncoder
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.models.unet import (UNet2DCondition,
                                                         UNetConfig)
    from stable_diffusion_videos_tpu.models.vae import (AutoencoderKL,
                                                        VAEConfig)

    ucfg, vcfg = UNetConfig.sd_v2(), VAEConfig.sd_v1()
    tcfg = CLIPTextConfig.tiny()
    dtype = jnp.bfloat16

    def init_rand(model, *args):
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
        "unet": init_rand(unet, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                          jnp.zeros((1, 77, ucfg.cross_attention_dim))),
        "vae": init_rand(vae, jnp.zeros((1, 64, 64, 3))),
        "text_encoder": init_rand(enc, jnp.zeros((1, 77), jnp.int32)),
    }
    return SDModels(ucfg, vcfg, tcfg, params,
                    HashTokenizer(vocab_size=tcfg.vocab_size),
                    SchedulerConfig(), dtype=dtype)


def op_histogram(hlo_text: str) -> dict:
    # scheduled-HLO lines: `%name = type{layout} opcode(args)` — the
    # type+layout token has no spaces
    hist = {}
    for m in re.finditer(r"= \S+ ([a-z][\w\-]*)\(", hlo_text):
        hist[m.group(1)] = hist.get(m.group(1), 0) + 1
    return hist


def main():
    from stable_diffusion_videos_tpu.runtime.engine import Engine

    compile_only = "--compile-only" in sys.argv
    models = build_models()
    h = w = SIDE // models.vae_config.scale_factor
    rng = np.random.default_rng(0)
    results = {"steps": STEPS, "side": SIDE}

    for B in (8, 16):
        cond = jnp.asarray(rng.standard_normal(
            (B, 77, models.unet_config.cross_attention_dim), np.float32))
        noise = jnp.asarray(rng.standard_normal((B, h, w, 4), np.float32))
        eng = Engine(models, scheduler="pndm", batch_bucket=B)
        eng_lat = Engine(models, scheduler="pndm", batch_bucket=B,
                         vae_tile=10_000)  # program returns raw latents

        r = {}
        # ---- full program ----
        t0 = time.perf_counter()
        out = eng.denoise_frames(cond, cond[:1], noise,
                                 num_inference_steps=STEPS)
        r["full_compile_plus_first_s"] = round(time.perf_counter() - t0, 1)
        if not compile_only:
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = eng.denoise_frames(cond, cond[:1], noise,
                                         num_inference_steps=STEPS)
                ts.append(time.perf_counter() - t0)
            r["full_s"] = round(min(ts), 3)
            r["full_frames_per_s"] = round(B / min(ts), 4)

        # ---- latents-only program (same scan, no fused VAE) ----
        fn_lat = eng_lat._get_compiled(B, h, w, STEPS, 77, False)
        tables = eng_lat._tables(STEPS, 0.0)
        from stable_diffusion_videos_tpu.parallel.mesh import batch_sharding
        bs = batch_sharding(eng_lat.mesh)
        context = jax.device_put(jnp.concatenate(
            [jnp.broadcast_to(cond[:1], cond.shape), cond], axis=0), bs)
        noise_p = jax.device_put(noise, bs)
        args = (eng_lat._params, context, (), (), noise_p,
                jnp.float32(7.5), tables, jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        lat = fn_lat(*args)
        sync(lat)
        r["latents_compile_plus_first_s"] = round(time.perf_counter() - t0, 1)
        if not compile_only:
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                lat = fn_lat(*args)
                sync(lat)
                ts.append(time.perf_counter() - t0)
            r["latents_s"] = round(min(ts), 3)

        # ---- VAE decode alone ----
        dec = jax.jit(lambda p, z: jnp.clip(
            models.vae().apply(p["vae"],
                               z / models.vae_config.scaling_factor,
                               method=type(models.vae()).decode)
            .astype(jnp.float32) / 2 + 0.5, 0, 1))
        t0 = time.perf_counter()
        img = dec(eng._params, lat)
        sync(img)
        r["vae_compile_plus_first_s"] = round(time.perf_counter() - t0, 1)
        if not compile_only:
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                img = dec(eng._params, lat)
                sync(img)
                ts.append(time.perf_counter() - t0)
            r["vae_s"] = round(min(ts), 3)

        # ---- optimized HLO dump of the full program ----
        try:
            fn_full = eng._get_compiled(B, h, w, STEPS, 77, False)
            lowered = fn_full.lower(*args)
            comp = lowered.compile()
            text = comp.as_text()
            path = os.path.join(HERE, f"hlo_sd2_b{B}.txt")
            with open(path, "w") as f:
                f.write(text)
            r["hlo_ops"] = op_histogram(text)
            r["hlo_lines"] = text.count("\n")
            try:
                mem = comp.memory_analysis()
                r["hlo_temp_bytes"] = int(getattr(
                    mem, "temp_size_in_bytes", -1))
                r["hlo_argument_bytes"] = int(getattr(
                    mem, "argument_size_in_bytes", -1))
            except Exception as e:
                r["hlo_mem_err"] = str(e)[:200]
        except Exception as e:
            r["hlo_err"] = str(e)[:300]

        results[f"b{B}"] = r
        print(json.dumps({f"b{B}": r}), flush=True)

    # ---- histogram diff: b8 ops x2 should match b16 ops ----
    try:
        h8 = results["b8"]["hlo_ops"]
        h16 = results["b16"]["hlo_ops"]
        diff = {}
        for k in sorted(set(h8) | set(h16)):
            a, b = h8.get(k, 0), h16.get(k, 0)
            if a != b:
                diff[k] = [a, b]
        results["op_count_diff_b8_vs_b16"] = diff
        print("op-count diffs (b8 vs b16):", json.dumps(diff), flush=True)
    except KeyError:
        pass

    mode = "compile" if compile_only else "time"
    try:
        with open(OUT) as f:
            allr = json.load(f)
    except FileNotFoundError:
        allr = {}
    allr[f"sd2_b8_rca_{mode}"] = results
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)
    print("DONE", mode, flush=True)


if __name__ == "__main__":
    main()
