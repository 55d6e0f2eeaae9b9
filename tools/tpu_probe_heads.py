"""Probe: XLA SDPA throughput vs head COUNT at head_dim=64 (SD2 level 0).

SD2.x-base measured 36% slower than SD1.x end-to-end; the suspect is its
five-head level-0 attention (odd head count vs SD1's 8).  If H=8 at the
same D=64 is faster than H=5 DESPITE 1.6x the FLOPs, zero-padding the head
count (numerics-exact: padded heads have zero V and zero out-proj rows)
is a win.  Appends to profile2_r02.json "heads_sweep".
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

from stable_diffusion_videos_tpu.ops.attention import xla_attention  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "profile2_r02.json")
ITERS = 10


def sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def bench(B, S, H, D):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)

    @jax.jit
    def run(q, k, v):
        def body(i, q):
            o = xla_attention(q, k, v)
            return (o * jnp.bfloat16(0.5) + q * jnp.bfloat16(0.5))
        return lax.fori_loop(0, ITERS, body, q)

    r = run(q, k, v)
    sync(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(run(q, k, v))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    fl = 4 * B * H * S * S * D * ITERS  # QK^T + AV
    return round(fl / ts[1] / 1e12, 1), round(ts[1] / ITERS * 1000, 1)


def main():
    res = {}
    # SD2 level-0 geometry: B=32 (16 frames x CFG), S=4096, D=64
    for H in (4, 5, 6, 8):
        tf, ms = bench(32, 4096, H, 64)
        res[f"h{H}_d64"] = {"tf_s": tf, "ms_per_call": ms}
        print(f"H={H} D=64: {tf} TF/s, {ms} ms", flush=True)
    # SD1 reference point: 8 heads of 40
    tf, ms = bench(32, 4096, 8, 40)
    res["h8_d40"] = {"tf_s": tf, "ms_per_call": ms}
    print(f"H=8 D=40: {tf} TF/s, {ms} ms", flush=True)

    with open(OUT) as f:
        allr = json.load(f)
    allr["heads_sweep"] = res
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)


if __name__ == "__main__":
    main()
