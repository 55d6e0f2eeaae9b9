"""Probe: SD2 UNet step, full vs attention-stubbed, vs SD1.

Buckets SD2's engine-level slowdown (0.76 vs 1.24 f/s at identical FLOPs;
attention micro-probes show only small deltas) into attention-in-context
vs everything-else.  Appends "sd2_stage" to profile2_r02.json.
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

import importlib  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "profile2_r02.json")
B = 32  # 16 frames x CFG


def sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def chained(step, lat, p, tb, ctx, iters=4, n=3):
    @jax.jit
    def run(l, p, t, c):
        def body(i, l):
            return step(l, p, t, c)
        return lax.fori_loop(0, iters, body, l)
    sync(run(lat, p, tb, ctx))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(run(lat, p, tb, ctx))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] / iters


def measure(ucfg, ctx_dim):
    from stable_diffusion_videos_tpu.models import UNet2DCondition
    attn_mod = importlib.import_module(
        "stable_diffusion_videos_tpu.ops.attention")
    import stable_diffusion_videos_tpu.models.layers as layers_mod

    unet = UNet2DCondition(ucfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda k: unet.init(
        k, jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, ctx_dim))), jax.random.PRNGKey(0))
    kk = [jax.random.PRNGKey(1)]

    def mk(s):
        kk[0], sub = jax.random.split(kk[0])
        return (jax.random.normal(sub, s.shape, jnp.float32) * 0.02).astype(
            jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype)
    up = jax.tree.map(mk, shapes)
    key = jax.random.PRNGKey(2)
    lat = jax.random.normal(key, (B, 64, 64, 4), jnp.bfloat16)
    ctx = jax.random.normal(key, (B, 77, ctx_dim), jnp.bfloat16)
    tb = jnp.ones((B,))

    def step(l, p, t, c):
        return unet.apply(p, l, t, c).astype(l.dtype)

    full = chained(step, lat, up, tb, ctx)
    real = attn_mod.attention
    stub = lambda q, k, v, scale=None: (  # noqa: E731
        v if q.shape[1] == k.shape[1] else
        jnp.broadcast_to(v[:, :1], (v.shape[0], q.shape[1]) + v.shape[2:]))
    attn_mod.attention = stub
    real_l = layers_mod.attention
    layers_mod.attention = stub
    stubbed = chained(step, lat, up, tb, ctx)
    attn_mod.attention = real
    layers_mod.attention = real_l
    return {"full_ms": round(full * 1e3, 1),
            "attn_stubbed_ms": round(stubbed * 1e3, 1),
            "attention_share_ms": round((full - stubbed) * 1e3, 1)}


def main():
    from stable_diffusion_videos_tpu.models import UNetConfig
    res = {}
    res["sd1"] = measure(UNetConfig.sd_v1(), 768)
    print("sd1", res["sd1"], flush=True)
    res["sd2"] = measure(UNetConfig.sd_v2(), 1024)
    print("sd2", res["sd2"], flush=True)

    with open(OUT) as f:
        allr = json.load(f)
    allr["sd2_stage"] = res
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)


if __name__ == "__main__":
    main()
