"""One-shot comprehensive TPU profile + tuned bench (single process).

Run under nohup and NEVER kill mid-compile (the axon grant is single-client;
a killed process locks the chip out for ~10-30 min).  Exits 7 when the chip
is unavailable so a retry wrapper can sleep + relaunch.

All timing is synced by a device-to-host fetch of one output element
(``sync``) — ``jax.block_until_ready`` proved unreliable on the axon PJRT
plugin (round-1 bench bug: returned at enqueue, reporting 7216 f/s/chip).
Micro-ops are chained through ``lax.fori_loop`` inside one jit so the
per-call cost is amortised over many iterations between syncs.

Writes machine-readable results to tools/profile_r02.json as it goes.
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

try:
    jax.devices("axon")
except Exception:
    print("AXON UNAVAILABLE - aborting (no CPU fallback)", flush=True)
    sys.exit(7)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT_JSON = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "profile_r02.json")
RESULTS: dict = {"meta": {"backend": jax.default_backend(),
                          "chips": jax.device_count(),
                          "started_unix": time.time()}}


def save():
    with open(OUT_JSON, "w") as f:
        json.dump(RESULTS, f, indent=1)


def sync(x):
    """Force completion: D2H fetch of one element (cannot lie)."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def timeit(f, *args, n=5):
    """Median seconds per call of f(*args), each call synced to completion."""
    sync(f(*args))  # warmup/compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(f(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def timeit_chained(op, x0, *rest, iters=16, n=5):
    """Median seconds per op application, where op: (x, *rest) -> x-shaped.
    ``iters`` applications are chained inside ONE jitted fori_loop so the
    sync/dispatch overhead is amortised."""
    @jax.jit
    def g(x, *r):
        return jax.lax.fori_loop(0, iters, lambda i, y: op(y, *r), x)
    dt = timeit(g, x0, *rest, n=n)
    return dt / iters


def section(name):
    print(f"\n===== {name} =====", flush=True)


t_all = time.perf_counter()

# ---------------------------------------------------------------- sync cost
try:
    section("sync/dispatch overhead calibration")
    one = jnp.ones((8, 128), jnp.bfloat16)
    dt = timeit(jax.jit(lambda x: x + 1), one, n=10)
    RESULTS["sync_overhead_s"] = dt
    print(f"trivial dispatch+sync: {dt*1e3:.1f} ms", flush=True)
    save()
except Exception:
    traceback.print_exc()

# ------------------------------------------------------------ speed of light
try:
    section("speed-of-light: matmul + conv3x3 (bf16)")
    RESULTS["sol"] = {}
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    for m in (4096, 8192):
        a = jax.random.normal(k1, (m, m), jnp.bfloat16)
        b = jax.random.normal(k2, (m, m), jnp.bfloat16)
        dt = timeit_chained(lambda x, y: jnp.dot(x, y), a, b, iters=8)
        tf = 2 * m**3 / dt / 1e12
        RESULTS["sol"][f"matmul_{m}"] = {"s": dt, "tflops": tf}
        print(f"matmul {m}^3: {dt*1e3:.2f} ms  {tf:.1f} TFLOP/s", flush=True)

    # conv3x3 at UNet level-0 geometry, CFG batch 32
    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
    # conv reformulations: is XLA's conv emitter leaving MXU on the table?
    def conv_9tap(x, w):
        # 3x3 conv as 9 shifted (BHW,C)@(C,O) matmuls (roll-based borders:
        # numerics differ at edges; this is a PERF probe only)
        out = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                xs = jnp.roll(x, (-dy, -dx), (1, 2))
                t = jnp.einsum("bhwc,co->bhwo", xs, w[dy + 1, dx + 1],
                               preferred_element_type=jnp.bfloat16)
                out = t if out is None else out + t
        return out

    def conv_im2col(x, w):
        b, h, ww, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [xp[:, dy:dy + h, dx:dx + ww] for dy in range(3)
             for dx in range(3)], axis=-1)  # (B,H,W,9C)
        return jnp.einsum("bhwk,ko->bhwo", cols,
                          w.reshape(9 * c, -1),
                          preferred_element_type=jnp.bfloat16)

    for (B, H, C) in [(32, 64, 320), (32, 32, 640), (32, 16, 1280)]:
        x = jax.random.normal(k1, (B, H, H, C), jnp.bfloat16)
        w = jax.random.normal(k2, (3, 3, C, C), jnp.bfloat16) * 0.02
        fl = 2 * B * H * H * 9 * C * C
        line = f"conv3x3 B{B} {H}^2x{C}:"
        for name, fn in (("xla", conv), ("9tap", conv_9tap),
                         ("im2col", conv_im2col)):
            dt = timeit_chained(fn, x, w, iters=8)
            RESULTS["sol"][f"conv3x3_{name}_B{B}_{H}x{H}x{C}"] = {
                "s": dt, "tflops": fl / dt / 1e12}
            line += f" {name} {dt*1e3:.2f}ms ({fl/dt/1e12:.1f}TF/s)"
        print(line, flush=True)
    save()
except Exception:
    traceback.print_exc()

# ------------------------------------------------------------ attention
try:
    section("attention: xla vs flash tile sweep (SD1.x shapes, CFG batch 32)")
    from stable_diffusion_videos_tpu.ops.attention import xla_attention
    from stable_diffusion_videos_tpu.ops.flash_attention import flash_attention
    RESULTS["attention"] = {}

    def attn_flops(B, S, H, D, Sk=None):
        Sk = Sk or S
        return 4 * B * H * S * Sk * D

    shapes = [  # (B, S, H, D, tile sweep?)
        (32, 4096, 8, 40, True),    # level 0 self-attn — the big one
        (32, 1024, 8, 80, False),   # level 1
        (32, 256, 8, 160, False),   # level 2
        (8, 4096, 1, 512, False),   # VAE mid attn (decode batch 8 @512^2)
    ]
    for (B, S, H, D, sweep) in shapes:
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
        q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)
        key = f"B{B}_S{S}_H{H}_D{D}"
        RESULTS["attention"][key] = {}
        fl = attn_flops(B, S, H, D)
        dt = timeit_chained(lambda q, k, v: xla_attention(q, k, v), q, k, v,
                            iters=8)
        RESULTS["attention"][key]["xla"] = {"s": dt, "tflops": fl / dt / 1e12}
        line = f"{key}: xla {dt*1e3:.2f}ms ({fl/dt/1e12:.1f}TF/s)"
        tiles = ([(128, 512), (128, 1024), (128, 2048),
                  (256, 512), (256, 1024), (256, 2048),
                  (512, 512), (512, 1024)] if sweep
                 else [(256, 512), (256, min(S, 1024))])
        for (tq, tk) in tiles:
            if tq > S or tk > S:
                continue
            try:
                dt = timeit_chained(
                    lambda q, k, v, tq=tq, tk=tk: flash_attention(
                        q, k, v, tile_q=tq, tile_k=tk), q, k, v, iters=8)
                RESULTS["attention"][key][f"flash_{tq}x{tk}"] = {
                    "s": dt, "tflops": fl / dt / 1e12}
                line += f" | fl[{tq},{tk}] {dt*1e3:.2f}ms"
            except Exception as e:
                line += f" | fl[{tq},{tk}] ERR:{type(e).__name__}"
        print(line, flush=True)
        save()

    # cross-attention (kv = 77 tokens -> xla fallback path)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(kq, (32, 4096, 8, 40), jnp.bfloat16)
    k = jax.random.normal(kk, (32, 77, 8, 40), jnp.bfloat16)
    v = jax.random.normal(kv, (32, 77, 8, 40), jnp.bfloat16)
    dt = timeit_chained(lambda q, k, v: xla_attention(q, k, v), q, k, v,
                        iters=8)
    RESULTS["attention"]["cross_B32_S4096_K77"] = {"xla": {"s": dt}}
    print(f"cross-attn 4096x77: xla {dt*1e3:.2f}ms", flush=True)
    save()
except Exception:
    traceback.print_exc()

# ------------------------------------------------------------ groupnorm/resnet
try:
    section("GroupNorm fp32-stats vs bf16 + ResnetBlock (level-0 shape)")
    import flax.linen as nn
    from stable_diffusion_videos_tpu.models.layers import (GroupNorm32,
                                                           ResnetBlock2D)
    x = jax.random.normal(jax.random.PRNGKey(3), (32, 64, 64, 320),
                          jnp.bfloat16)
    RESULTS["groupnorm"] = {}
    gn32 = GroupNorm32(32, dtype=jnp.bfloat16)
    p = gn32.init(jax.random.PRNGKey(0), x)
    dt = timeit_chained(lambda y, p: gn32.apply(p, y).astype(y.dtype), x, p,
                        iters=16)
    RESULTS["groupnorm"]["gn32_fp32stats"] = dt
    print(f"GroupNorm32 (fp32 stats): {dt*1e3:.3f} ms", flush=True)
    gnb = nn.GroupNorm(num_groups=32, dtype=jnp.bfloat16)
    p2 = gnb.init(jax.random.PRNGKey(0), x)
    dt = timeit_chained(lambda y, p: gnb.apply(p, y).astype(y.dtype), x, p2,
                        iters=16)
    RESULTS["groupnorm"]["gn_bf16"] = dt
    print(f"GroupNorm bf16: {dt*1e3:.3f} ms", flush=True)

    res = ResnetBlock2D(320, dtype=jnp.bfloat16)
    temb = jax.random.normal(jax.random.PRNGKey(4), (32, 1280), jnp.bfloat16)
    pr = res.init(jax.random.PRNGKey(0), x, temb)
    dt = timeit_chained(lambda y, p, t: res.apply(p, y, t).astype(y.dtype),
                        x, pr, temb, iters=8)
    RESULTS["groupnorm"]["resnet_block_320"] = dt
    # resnet FLOPs: 2 conv3x3 320->320
    tf = 2 * 2 * 32 * 64 * 64 * 9 * 320 * 320 / dt / 1e12
    print(f"ResnetBlock2D 320ch: {dt*1e3:.2f} ms ({tf:.1f} TF/s convs)",
          flush=True)
    save()
except Exception:
    traceback.print_exc()

# ------------------------------------------------------------ unet step
try:
    section("UNet CFG step: backend x batch ladder (SD geometry, bf16)")
    import importlib

    from stable_diffusion_videos_tpu.models import UNet2DCondition, UNetConfig
    from stable_diffusion_videos_tpu.models.vae import AutoencoderKL, VAEConfig
    attn_mod = importlib.import_module(
        "stable_diffusion_videos_tpu.ops.attention")

    ucfg, vcfg = UNetConfig.sd_v1(), VAEConfig.sd_v1()
    unet = UNet2DCondition(ucfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(vcfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda k: unet.init(
        k, jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, 768))), jax.random.PRNGKey(0))
    key = [jax.random.PRNGKey(1)]

    def mk(s):
        key[0], sub = jax.random.split(key[0])
        return (jax.random.normal(sub, s.shape, jnp.float32) * 0.02).astype(
            jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype)
    uparams = jax.tree.map(mk, shapes)
    RESULTS["unet_step"] = {}
    UNET_FLOPS = 0.34e12  # per 512^2 sample fwd

    for backend in ("auto", "xla", "flash"):
        attn_mod.set_attention_backend(backend)
        for B in (8, 16, 32):
            lat = jax.random.normal(jax.random.PRNGKey(3),
                                    (2 * B, 64, 64, 4), jnp.bfloat16)
            ctx = jax.random.normal(jax.random.PRNGKey(4),
                                    (2 * B, 77, 768), jnp.bfloat16)
            tb = jnp.ones((2 * B,))

            def step(l, p, t, c):
                return unet.apply(p, l, t, c).astype(l.dtype)
            try:
                dt = timeit_chained(step, lat, uparams, tb, ctx,
                                    iters=4, n=3)
                tf = UNET_FLOPS * 2 * B / dt / 1e12
                RESULTS["unet_step"][f"{backend}_B{B}"] = {
                    "s": dt, "tflops": tf}
                print(f"unet[{backend}] CFG B={B}: {dt*1e3:.1f}ms "
                      f"({tf:.1f} TFLOP/s)", flush=True)
            except Exception as e:
                msg = str(e).splitlines()[0][:120]
                RESULTS["unet_step"][f"{backend}_B{B}"] = {"err": msg}
                print(f"unet[{backend}] B={B} ERR: {msg}", flush=True)
            save()
    attn_mod.set_attention_backend("auto")

    section("VAE decode (512^2)")
    vshapes = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, 512, 512, 3))),
        jax.random.PRNGKey(2))
    vparams = jax.tree.map(mk, vshapes)
    RESULTS["vae_decode"] = {}
    for B in (8, 16):
        z = jax.random.normal(jax.random.PRNGKey(5), (B, 64, 64, 4),
                              jnp.bfloat16)
        fd = jax.jit(lambda p, z: vae.apply(p, z,
                                            method=AutoencoderKL.decode))
        try:
            dt = timeit(fd, vparams, z, n=3)
            RESULTS["vae_decode"][f"B{B}"] = dt
            print(f"vae decode B={B}: {dt*1e3:.1f}ms "
                  f"({dt/B*1e3:.1f} ms/frame)", flush=True)
        except Exception as e:
            print(f"vae decode B={B} ERR: {str(e)[:120]}", flush=True)
    save()
except Exception:
    traceback.print_exc()

# ------------------------------------------------------------ full dispatch
try:
    section("full engine dispatch (pndm 50 steps + decode, 1 XLA program)")
    from stable_diffusion_videos_tpu.core.schedulers import SchedulerConfig
    from stable_diffusion_videos_tpu.models import (CLIPTextConfig,
                                                    HashTokenizer)
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.models.clip_text import CLIPTextEncoder
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    from stable_diffusion_videos_tpu.ops import attention as attn_mod

    tcfg = CLIPTextConfig.tiny()
    enc = CLIPTextEncoder(tcfg, dtype=jnp.bfloat16)
    eshapes = jax.eval_shape(
        lambda k: enc.init(k, jnp.zeros((1, 77), jnp.int32)),
        jax.random.PRNGKey(6))
    eparams = jax.tree.map(mk, eshapes)
    models = SDModels(ucfg, vcfg, tcfg,
                      {"unet": uparams, "vae": vparams,
                       "text_encoder": eparams},
                      HashTokenizer(vocab_size=tcfg.vocab_size),
                      SchedulerConfig(), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    RESULTS["engine"] = {}
    FLOP_PER_FRAME = 50 * 2 * 0.34e12 + 1.4e12
    best = None
    # best backend from the unet-step section
    import importlib as _il
    attn_mod = _il.import_module("stable_diffusion_videos_tpu.ops.attention")
    cands = {b: RESULTS.get("unet_step", {}).get(f"{b}_B16", {}).get("s")
             for b in ("auto", "xla", "flash")}
    timed = {b: s for b, s in cands.items() if s}
    backend = min(timed, key=timed.get) if timed else "auto"
    print(f"engine attention backend: {backend}", flush=True)
    attn_mod.set_attention_backend(backend)
    for B in (16, 32):
        try:
            eng = Engine(models, scheduler="pndm", batch_bucket=B)
            cond = jnp.asarray(rng.standard_normal((B, 77, 768), np.float32))
            noise = jnp.asarray(rng.standard_normal((B, 64, 64, 4),
                                                    np.float32))
            t0 = time.perf_counter()
            fut, _ = eng.denoise_frames_async(cond, cond[:1], noise,
                                              num_inference_steps=50)
            sync(fut)
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fut, _ = eng.denoise_frames_async(cond, cond[:1], noise,
                                                  num_inference_steps=50)
                sync(fut)
                ts.append(time.perf_counter() - t0)
            ts.sort()
            dt = ts[1]
            fps = B / dt
            RESULTS["engine"][f"B{B}"] = {
                "s_per_dispatch": dt, "times": ts, "fps_chip": fps,
                "compile_s": compile_s, "backend": backend,
                "implied_tflops": fps * FLOP_PER_FRAME / 1e12}
            print(f"B={B}: {dt:.2f}s/dispatch = {fps:.3f} f/s/chip "
                  f"(implied {fps*FLOP_PER_FRAME/1e12:.1f} TF/s, "
                  f"compile {compile_s:.0f}s)", flush=True)
            if fps * FLOP_PER_FRAME < 0.9 * 459e12 and (
                    best is None or fps > best[1]):
                best = (B, fps, dt, compile_s)
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            RESULTS["engine"][f"B{B}"] = {"err": msg}
            print(f"engine B={B} ERR: {msg}", flush=True)
        save()

    if best is not None:
        B, fps, dt, compile_s = best
        record = {
            "metric": f"frames/sec/chip @ 512x512, 50 steps, CFG, "
                      f"batch {B}, tpu",
            "value": round(fps, 4), "unit": "frames/s/chip",
            "vs_baseline": round(fps, 4),
            "detail": {"seconds_per_dispatch": round(dt, 3),
                       "compile_plus_first_run_s": round(compile_s, 1),
                       "chips": 1, "backend": "tpu", "dtype": "bfloat16",
                       "attention_backend": backend,
                       "out_shape": [B, 512, 512, 3],
                       "source": "tools/tpu_profile.py"},
        }
        with open("/root/repo/.bench_tpu_last.json", "w") as f:
            json.dump(record, f)
        print(f"RECORDED {fps:.3f} f/s/chip at batch {B}", flush=True)
except Exception:
    traceback.print_exc()

RESULTS["meta"]["total_s"] = time.perf_counter() - t_all
save()
print(f"\nDONE in {RESULTS['meta']['total_s']:.0f}s", flush=True)
