"""Tile sweep for the flash kernel at the r3-routed D=64 shapes.

The q256/k1024 default was tuned at D=40 (r2); the materialization-aware
routing (ops/attention.py) now sends SD2/SDXL D=64 self-attention to
flash at S=4096/1024 — sweep (tile_q, tile_k) there and pick winners.
Appends "flash_d64" to tools/probe_r03.json.
"""
import itertools
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
ITERS = 16
CASES = [  # (name, B, H, S, D) — SD2 b8 L0/L1, SDXL 1024^2 L1/L2
    ("sd2b8_L0", 16, 5, 4096, 64),
    ("sd2b8_L1", 16, 10, 1024, 64),
    ("sdxl_L1", 2, 10, 4096, 64),
    ("sdxl_L2", 2, 20, 1024, 64),
]
TQ = (128, 256, 512, 1024)
TK = (512, 1024, 2048, 4096)


def sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def time_fn(fn, q, k, v, n=3):
    @jax.jit
    def run(q, k, v):
        def body(i, carry):
            out = fn(carry, k, v)
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
    from stable_diffusion_videos_tpu.ops.flash_attention import \
        flash_attention

    results = {"iters": ITERS}
    for name, B, H, S, D in CASES:
        rng = np.random.default_rng(0)
        q, k, v = (jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.1,
                               jnp.bfloat16) for _ in range(3))
        entry = {}
        best = None
        for tq, tk in itertools.product(TQ, TK):
            if tq > S or tk > S:
                continue
            try:
                dt = time_fn(lambda a, b, c, tq=tq, tk=tk: flash_attention(
                    a, b, c, tile_q=tq, tile_k=tk), q, k, v)
                entry[f"q{tq}_k{tk}"] = round(dt * 1e6, 1)
                if best is None or dt * 1e6 < entry[best]:
                    best = f"q{tq}_k{tk}"
            except Exception as e:  # noqa: BLE001
                entry[f"q{tq}_k{tk}"] = f"{type(e).__name__}: {str(e)[:80]}"
        entry["best"] = best
        results[name] = entry
        print(json.dumps({name: entry}), flush=True)

    try:
        with open(OUT) as f:
            allr = json.load(f)
    except FileNotFoundError:
        allr = {}
    allr["flash_d64"] = results
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
