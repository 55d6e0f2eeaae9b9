"""Round-2 targeted profile: WHERE the UNet's 125 ms (CFG B=16) goes.

Round-1 data (tools/profile_r02.json): matmuls reach ~177 TF/s true and
conv3x3 ~160 TF/s, but the whole UNet step sustains only ~43 TF/s.  This
script decomposes the gap:

1. per-stage timing: SpatialTransformer + ResnetBlock at every UNet level
   geometry, summed against the full forward;
2. UNet forward with attention stubbed to identity (direct SDPA share);
3. SDPA variants at the level-0 shape (head-dim padding, merged-BH layout,
   bf16 logits, jax.nn.dot_product_attention);
4. VAE decode stage split (mid attn vs conv ladder).

All timings synced via D2H fetch; chained fori_loop amortises the ~32 ms
tunnel round-trip (see tpu_profile.py).  Writes tools/profile2_r02.json.
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
    print("AXON UNAVAILABLE - aborting", flush=True)
    sys.exit(7)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "profile2_r02.json")
R: dict = {"meta": {"started_unix": time.time()}}


def save():
    with open(OUT, "w") as f:
        json.dump(R, f, indent=1)


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def timeit(f, *args, n=5):
    sync(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(f(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def chained(op, x0, *rest, iters=8, n=5):
    @jax.jit
    def g(x, *r):
        return jax.lax.fori_loop(0, iters, lambda i, y: op(y, *r), x)
    return timeit(g, x0, *rest, n=n) / iters


def section(name):
    print(f"\n===== {name} =====", flush=True)


B = 16  # CFG batch for a walk batch of 8 (round-1 bench config)
key = jax.random.PRNGKey(0)

# ---------------------------------------------------------- overhead
one = jnp.ones((8, 128), jnp.bfloat16)
OVH = timeit(jax.jit(lambda x: x + 1), one, n=10)
R["sync_overhead_s"] = OVH
print(f"sync overhead {OVH*1e3:.1f} ms (subtract OVH/iters from chained)",
      flush=True)

# ---------------------------------------------------------- stage breakdown
try:
    section(f"UNet per-stage (CFG batch {B}, bf16)")
    from stable_diffusion_videos_tpu.models.layers import (ResnetBlock2D,
                                                           SpatialTransformer)
    R["stages"] = {}
    ctx = jax.random.normal(key, (B, 77, 768), jnp.bfloat16)
    temb = jax.random.normal(key, (B, 1280), jnp.bfloat16)

    # (side, channels, heads, n_transformer, n_resnet[approx incl. up-concat])
    LEVELS = [(64, 320, 8, 5, 5), (32, 640, 8, 5, 5),
              (16, 1280, 8, 5, 5), (8, 1280, 8, 1, 9)]
    total_est = 0.0
    for side, ch, heads, n_tr, n_res in LEVELS:
        x = jax.random.normal(key, (B, side, side, ch), jnp.bfloat16)
        tr = SpatialTransformer(heads, ch // heads, dtype=jnp.bfloat16)
        # init at batch 1: flax init runs the forward EAGERLY, and eager
        # attention at B=16/S=4096 materialises 8.6 GB of fp32 logits
        ptr = tr.init(jax.random.PRNGKey(1), x[:1], ctx[:1])
        dt_tr = chained(lambda y, p, c: tr.apply(p, y, c).astype(y.dtype),
                        x, ptr, ctx, iters=8) - OVH / 8
        res = ResnetBlock2D(ch, dtype=jnp.bfloat16)
        pres = res.init(jax.random.PRNGKey(2), x[:1], temb[:1])
        dt_res = chained(lambda y, p, t: res.apply(p, y, t).astype(y.dtype),
                         x, pres, temb, iters=8) - OVH / 8
        R["stages"][f"L{side}"] = {
            "transformer_ms": dt_tr * 1e3, "resnet_ms": dt_res * 1e3,
            "n_tr": n_tr, "n_res": n_res,
            "est_total_ms": (n_tr * dt_tr + n_res * dt_res) * 1e3}
        total_est += n_tr * dt_tr + n_res * dt_res
        print(f"  {side}^2 x{ch}: transformer {dt_tr*1e3:.2f}ms x{n_tr}, "
              f"resnet {dt_res*1e3:.2f}ms x{n_res} -> "
              f"{(n_tr*dt_tr+n_res*dt_res)*1e3:.1f}ms", flush=True)
    R["stages"]["sum_est_ms"] = total_est * 1e3
    print(f"  stage-sum estimate: {total_est*1e3:.1f} ms", flush=True)
    save()
except Exception:
    traceback.print_exc()

# ---------------------------------------------------------- attention share
try:
    section("UNet full vs attention-stubbed")
    import importlib
    # NB: ``import pkg.ops.attention as m`` resolves to the FUNCTION
    # re-exported by ops/__init__.py, not the module — use import_module
    attn_mod = importlib.import_module(
        "stable_diffusion_videos_tpu.ops.attention")
    from stable_diffusion_videos_tpu.models import (UNet2DCondition,
                                                    UNetConfig)
    ucfg = UNetConfig.sd_v1()
    unet = UNet2DCondition(ucfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda k: unet.init(
        k, jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, 768))), jax.random.PRNGKey(0))
    kk = [jax.random.PRNGKey(1)]

    def mk(s):
        kk[0], sub = jax.random.split(kk[0])
        return (jax.random.normal(sub, s.shape, jnp.float32) * 0.02).astype(
            jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype)
    up = jax.tree.map(mk, shapes)
    lat = jax.random.normal(key, (B, 64, 64, 4), jnp.bfloat16)
    tb = jnp.ones((B,))

    def step(l, p, t, c):
        return unet.apply(p, l, t, c).astype(l.dtype)
    dt_full = chained(step, lat, up, tb, ctx, iters=4, n=3) - OVH / 4
    R["unet_full_ms"] = dt_full * 1e3
    print(f"full UNet: {dt_full*1e3:.1f} ms "
          f"({2*B*0.34e12/2/dt_full/1e12:.1f} TF/s)", flush=True)

    real_attn = attn_mod.attention
    attn_mod.attention = lambda q, k, v, scale=None: (
        v if q.shape[1] == k.shape[1] else
        jnp.broadcast_to(v[:, :1], (v.shape[0], q.shape[1]) + v.shape[2:]))
    # layers.py captured `attention` by from-import; patch there too
    import stable_diffusion_videos_tpu.models.layers as layers_mod
    real_layers_attn = layers_mod.attention
    layers_mod.attention = attn_mod.attention
    dt_stub = chained(step, lat, up, tb, ctx, iters=4, n=3) - OVH / 4
    attn_mod.attention = real_attn
    layers_mod.attention = real_layers_attn
    R["unet_attn_stubbed_ms"] = dt_stub * 1e3
    R["attention_share_ms"] = (dt_full - dt_stub) * 1e3
    print(f"attention stubbed: {dt_stub*1e3:.1f} ms -> SDPA share "
          f"{(dt_full-dt_stub)*1e3:.1f} ms", flush=True)
    save()
except Exception:
    traceback.print_exc()

# ---------------------------------------------------------- SDPA variants
try:
    section(f"SDPA variants at level-0 (B{B}, S4096, H8, D40)")
    R["sdpa"] = {}
    kq, kk2, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    S, H, D = 4096, 8, 40
    q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(kk2, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)
    FL = 4 * B * H * S * S * D

    def run(name, fn, iters=8):
        try:
            dt = chained(fn, q, k, v, iters=iters) - OVH / iters
            R["sdpa"][name] = {"ms": dt * 1e3, "tflops": FL / dt / 1e12}
            print(f"  {name}: {dt*1e3:.2f} ms ({FL/dt/1e12:.1f} TF/s)",
                  flush=True)
        except Exception as e:
            R["sdpa"][name] = {"err": str(e)[:160]}
            print(f"  {name}: ERR {str(e)[:120]}", flush=True)
        save()

    from stable_diffusion_videos_tpu.ops.attention import xla_attention
    run("xla_fp32logits", lambda q, k, v: xla_attention(q, k, v))

    def xla_bf16(q, k, v):
        d = q.shape[-1]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.bfloat16) * (d ** -0.5)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    run("xla_bf16logits_fp32softmax", xla_bf16)

    def xla_allbf16(q, k, v):
        d = q.shape[-1]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.bfloat16) * (d ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    run("xla_allbf16", xla_allbf16)

    def padded(dpad):
        def fn(q, k, v):
            pq = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, dpad - D)))
            pk = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, dpad - D)))
            out = xla_attention(pq, pk, jnp.pad(
                v, ((0, 0), (0, 0), (0, 0), (0, dpad - D))),
                scale=D ** -0.5)
            return out[..., :D]
        return fn
    run("xla_padD64", padded(64))
    run("xla_padD128", padded(128))

    def merged_bh(q, k, v):
        d = q.shape[-1]
        qm = q.transpose(0, 2, 1, 3).reshape(B * H, S, D)
        km = k.transpose(0, 2, 1, 3).reshape(B * H, S, D)
        vm = v.transpose(0, 2, 1, 3).reshape(B * H, S, D)
        logits = jnp.einsum("bqd,bkd->bqk", qm, km,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bqk,bkd->bqd", probs.astype(vm.dtype), vm)
        return out.reshape(B, H, S, D).transpose(0, 2, 1, 3)
    run("merged_bh", merged_bh)

    if hasattr(jax.nn, "dot_product_attention"):
        def jdpa(q, k, v):
            return jax.nn.dot_product_attention(q, k, v)
        run("jax_nn_dpa_xla", jdpa)

    from stable_diffusion_videos_tpu.ops.flash_attention import flash_attention
    run("flash_256x2048", lambda q, k, v: flash_attention(
        q, k, v, tile_q=256, tile_k=2048))

    def flash_pad64(q, k, v):
        pq = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, 64 - D)))
        pk = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, 64 - D)))
        pv = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, 64 - D)))
        return flash_attention(pq, pk, pv, scale=D ** -0.5,
                               tile_q=256, tile_k=2048)[..., :D]
    run("flash_padD64_256x2048", flash_pad64)
    save()
except Exception:
    traceback.print_exc()

# ---------------------------------------------------------- vae split
try:
    section("VAE decode split (batch 8 @ 512^2)")
    from stable_diffusion_videos_tpu.models.layers import VAEAttnBlock
    from stable_diffusion_videos_tpu.models.vae import AutoencoderKL, VAEConfig
    R["vae"] = {}
    vcfg = VAEConfig.sd_v1()
    vae = AutoencoderKL(vcfg, dtype=jnp.bfloat16)
    vshapes = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, 512, 512, 3))),
        jax.random.PRNGKey(2))
    vp = jax.tree.map(mk, vshapes)
    z8 = jax.random.normal(key, (8, 64, 64, 4), jnp.bfloat16)
    fd = jax.jit(lambda p, z: vae.apply(p, z, method=AutoencoderKL.decode))
    dt = timeit(fd, vp, z8, n=3)
    R["vae"]["decode_b8_ms"] = dt * 1e3
    print(f"decode B=8: {dt*1e3:.1f} ms ({dt/8*1e3:.1f} ms/frame, "
          f"{8*1.4e12/dt/1e12:.1f} TF/s)", flush=True)

    xm = jax.random.normal(key, (8, 64, 64, 512), jnp.bfloat16)
    ab = VAEAttnBlock(dtype=jnp.bfloat16)
    pab = ab.init(jax.random.PRNGKey(3), xm[:1])
    dt = chained(lambda y, p: ab.apply(p, y).astype(y.dtype), xm, pab,
                 iters=8) - OVH / 8
    R["vae"]["mid_attn_ms"] = dt * 1e3
    print(f"VAE mid attn block: {dt*1e3:.1f} ms", flush=True)
    save()
except Exception:
    traceback.print_exc()

R["meta"]["total_s"] = time.time() - R["meta"]["started_unix"]
save()
print(f"\nDONE in {R['meta']['total_s']:.0f}s", flush=True)
