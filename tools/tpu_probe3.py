"""Follow-up probe: SDPA share of the full UNet + upsample variants.

Completes the two measurements profile2 missed: (a) full UNet with attention
stubbed to identity (direct SDPA wall-clock share), (b) nearest-neighbour
2x upsample via jax.image.resize vs broadcast-reshape (identical numerics,
potentially different codegen), at the two UNet upsample geometries.
Appends results into tools/profile2_r02.json.
"""
import importlib
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
with open(OUT) as f:
    R = json.load(f)


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


B = 16
key = jax.random.PRNGKey(0)
one = jnp.ones((8, 128), jnp.bfloat16)
OVH = timeit(jax.jit(lambda x: x + 1), one, n=10)
print(f"sync overhead {OVH*1e3:.1f} ms", flush=True)

try:
    print("===== UNet full vs attention-stubbed =====", flush=True)
    attn_mod = importlib.import_module(
        "stable_diffusion_videos_tpu.ops.attention")
    import stable_diffusion_videos_tpu.models.layers as layers_mod
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
    ctx = jax.random.normal(key, (B, 77, 768), jnp.bfloat16)
    tb = jnp.ones((B,))

    def step(l, p, t, c):
        return unet.apply(p, l, t, c).astype(l.dtype)
    dt_full = chained(step, lat, up, tb, ctx, iters=4, n=3) - OVH / 4
    R["unet_full_ms"] = dt_full * 1e3
    print(f"full UNet B{B}: {dt_full*1e3:.1f} ms", flush=True)

    real = layers_mod.attention

    def stub(q, k, v, scale=None):
        if q.shape[1] == k.shape[1]:
            return v
        return jnp.broadcast_to(v[:, :1], (v.shape[0], q.shape[1])
                                + v.shape[2:])
    layers_mod.attention = stub
    attn_real = attn_mod.attention
    attn_mod.attention = stub
    try:
        dt_stub = chained(step, lat, up, tb, ctx, iters=4, n=3) - OVH / 4
    finally:
        layers_mod.attention = real
        attn_mod.attention = attn_real
    R["unet_attn_stubbed_ms"] = dt_stub * 1e3
    R["attention_share_ms"] = (dt_full - dt_stub) * 1e3
    print(f"attention stubbed: {dt_stub*1e3:.1f} ms -> SDPA share "
          f"{(dt_full-dt_stub)*1e3:.1f} ms "
          f"({(dt_full-dt_stub)/dt_full*100:.0f}%)", flush=True)
    save()
except Exception:
    traceback.print_exc()

try:
    print("===== nearest 2x upsample: resize vs broadcast-reshape =====",
          flush=True)
    R["upsample"] = {}
    for (side, ch) in [(32, 640), (16, 1280), (64, 320)]:
        x = jax.random.normal(key, (B, side, side, ch), jnp.bfloat16)

        def via_resize(y):
            b, h, w, c = y.shape
            out = jax.image.resize(y, (b, 2 * h, 2 * w, c), method="nearest")
            return out[:, ::2, ::2]  # back to input shape so chaining works

        def via_reshape(y):
            b, h, w, c = y.shape
            out = jnp.broadcast_to(y[:, :, None, :, None, :],
                                   (b, h, 2, w, 2, c)).reshape(
                                       b, 2 * h, 2 * w, c)
            return out[:, ::2, ::2]

        d1 = chained(via_resize, x, iters=8) - OVH / 8
        d2 = chained(via_reshape, x, iters=8) - OVH / 8
        R["upsample"][f"{side}x{ch}"] = {"resize_ms": d1 * 1e3,
                                         "reshape_ms": d2 * 1e3}
        print(f"  {side}^2x{ch}: resize {d1*1e3:.2f} ms, "
              f"broadcast-reshape {d2*1e3:.2f} ms", flush=True)
    save()
except Exception:
    traceback.print_exc()

print("DONE", flush=True)
