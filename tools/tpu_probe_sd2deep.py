"""Probe: SD2-vs-SD1 attention geometry at the deep UNet levels.

SD2-base measured 0.79 f/s vs SD1's 1.24 at identical FLOPs; the level-0
head sweep showed flat per-FLOP SDPA. This times the remaining attention
geometry differences: level-1/2 self-attention (SD2 D=64 many-heads vs
SD1 D=80/160 few-heads) and level-0 cross-attention (S_kv=77).
Appends to profile2_r02.json "sd2_deep".
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
ITERS = 20


def sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def bench(B, Sq, Skv, H, D):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, Sq, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, Skv, H, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, Skv, H, D), jnp.bfloat16)

    @jax.jit
    def run(q, k, v):
        def body(i, q):
            o = xla_attention(q, k, v)
            return (o * jnp.bfloat16(0.5) + q * jnp.bfloat16(0.5))
        return lax.fori_loop(0, ITERS, body, q)

    sync(run(q, k, v))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(run(q, k, v))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    fl = 4 * B * H * Sq * Skv * D * ITERS
    return {"tf_s": round(fl / ts[1] / 1e12, 1),
            "ms": round(ts[1] / ITERS * 1000, 2)}


def main():
    res = {}
    cases = {
        # level-1 self-attention, B = 16 frames x CFG
        "l1_sd2_h10_d64": (32, 1024, 1024, 10, 64),
        "l1_sd1_h8_d80": (32, 1024, 1024, 8, 80),
        # level-2/3 self-attention (16x16 latents)
        "l2_sd2_h20_d64": (32, 256, 256, 20, 64),
        "l2_sd1_h8_d160": (32, 256, 256, 8, 160),
        # level-0 cross-attention (77-token context)
        "x0_sd2_h5_d64": (32, 4096, 77, 5, 64),
        "x0_sd1_h8_d40": (32, 4096, 77, 8, 40),
        # level-1 cross-attention
        "x1_sd2_h10_d64": (32, 1024, 77, 10, 64),
        "x1_sd1_h8_d80": (32, 1024, 77, 8, 80),
    }
    for name, args in cases.items():
        try:
            res[name] = bench(*args)
        except Exception as e:  # noqa: BLE001
            res[name] = f"ERR {type(e).__name__}: {str(e)[:120]}"
        print(name, res[name], flush=True)

    with open(OUT) as f:
        allr = json.load(f)
    allr["sd2_deep"] = res
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)


if __name__ == "__main__":
    main()
