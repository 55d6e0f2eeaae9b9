"""Probe: SD2 level-0 self-attention — materialized vs chunked vs flash.

HLO evidence (tools/hlo_sd2_b{8,16}.txt, sd2_b8_r03.json): the b8 scan
program allocates MORE temp (5.93 GB) than the b16 one (4.37 GB) because
the f32[16,5,4096,4096] level-0 score tensor (5 GB) FITS at b8, so XLA
materializes it; at b16 (10 GB) it cannot, and the forced chunked softmax
is also cheaper on HBM bandwidth.  Scan per-frame cost: b8 1.114 s vs
b16 0.821 s (+36%).

This measures, at the exact shapes, what each strategy costs:
  xla      — free choice (materializes when it fits)
  chunked  — explicit q-block softmax (jnp, no Pallas) forcing O(S*q) temp
  flash    — the repo's Pallas kernel
Cases: SD2 L0 (H=5, D=64) at CFG batch 16 and 32; SD1 L0 (H=8, D=40)
b16 as control.  Appends "sd2attn" to tools/probe_r03.json.
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
from jax import lax  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r03.json")
ITERS = 8
CASES = [  # (name, B, H, S, D)
    ("sd2_L0_cfg16", 16, 5, 4096, 64),
    ("sd2_L0_cfg32", 32, 5, 4096, 64),
    ("sd1_L0_cfg16", 16, 8, 4096, 40),
    ("sd2_L1_cfg16", 16, 10, 1024, 64),
]


def sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def xla_sdpa(q, k, v, scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def chunked(q, k, v, scale, block=512):
    """q-block softmax: temp is O(B*H*block*S) instead of O(B*H*S*S)."""
    B, S, H, D = q.shape

    def one(qb):  # (B, block, H, D)
        s = jnp.einsum("bqhd,bkhd->bhqk", qb, k) * scale
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    qb = q.reshape(B, S // block, block, H, D).transpose(1, 0, 2, 3, 4)
    out = lax.map(one, qb)  # sequential over q blocks
    return out.transpose(1, 0, 2, 3, 4).reshape(B, S, H, D)


def flash(q, k, v, scale):
    from stable_diffusion_videos_tpu.ops.flash_attention import \
        flash_attention
    return flash_attention(q, k, v, scale=scale)


def time_fn(fn, q, k, v, scale, n=3):
    @jax.jit
    def run(q, k, v):
        def body(i, carry):
            out = fn(carry, k, v, scale)
            return out + 1e-3 * jnp.abs(out)
        return lax.fori_loop(0, ITERS, body, q)

    sync(run(q, k, v))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(run(q, k, v))
        ts.append(time.perf_counter() - t0)
    return min(ts) / ITERS


def main():
    results = {"iters": ITERS}
    for name, B, S_H_D in [(n, b, (h, s, d)) for n, b, h, s, d in CASES]:
        H, S, D = S_H_D
        rng = np.random.default_rng(0)
        q, k, v = (jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.1,
                               jnp.bfloat16) for _ in range(3))
        scale = 1.0 / np.sqrt(D)
        flops = 2 * 2 * B * H * S * S * D
        score_gb = 4 * B * H * S * S / 2**30
        entry = {"score_f32_gb": round(score_gb, 2)}
        for vname, fn in (("xla", xla_sdpa), ("chunked", chunked),
                          ("flash", flash)):
            try:
                dt = time_fn(fn, q, k, v, scale)
                entry[vname] = {"us": round(dt * 1e6, 1),
                                "tflops": round(flops / dt / 1e12, 1)}
            except Exception as e:  # noqa: BLE001
                entry[vname] = {"error": f"{type(e).__name__}: "
                                         f"{str(e)[:150]}"}
        results[name] = entry
        print(json.dumps({name: entry}), flush=True)

    try:
        with open(OUT) as f:
            allr = json.load(f)
    except FileNotFoundError:
        allr = {}
    allr["sd2attn"] = results
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
