"""Probe: fused Pallas GroupNorm+SiLU vs XLA at the UNet's glue shapes.

VERDICT r2 weak #1: the bandwidth-bound "norms/glue" 15% of step time had
no fusion attempt.  This measures the fused kernel (1 HBM read + 1 write)
against the production GroupNorm32+silu lowering at every (B=32 CFG)
SD1.x level shape, plus an e2e engine A/B when the op-level result wins.

Timing per axon rules: chained iterations inside one jit with a nonlinear
carry (XLA deletes linearly-carried ops), D2H-synced, min of repeats.
Appends "gnsilu" to tools/probe_r03.json.
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
ITERS = 200  # ~1.5 ms tunnel RTT per dispatch must amortise to <10 us/iter
# (H=W, C): SD1.x levels at 512^2, CFG batch 32 (= walk batch 16)
SHAPES = [(64, 320), (32, 640), (16, 1280), (8, 1280)]
B = 32


def sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def time_chained(fn, x, scale, bias, n=3):
    @jax.jit
    def run(x, s, b):
        def body(i, carry):
            out = fn(carry, s, b)
            # nonlinear carry: keeps every iteration live (axon rule)
            return out + 1e-3 * jnp.abs(out)
        return lax.fori_loop(0, ITERS, body, x)

    sync(run(x, scale, bias))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(run(x, scale, bias))
        ts.append(time.perf_counter() - t0)
    return min(ts) / ITERS


def main():
    import flax.linen as nn

    from stable_diffusion_videos_tpu.ops.groupnorm import fused_groupnorm_silu

    results = {"iters": ITERS, "batch": B}
    for side, c in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, side, side, c)),
                        jnp.bfloat16)
        scale = jnp.asarray(rng.standard_normal(c), jnp.float32)
        bias = jnp.asarray(rng.standard_normal(c), jnp.float32)

        def xla_gn(h, s, b):
            # production path: GroupNorm32 (fp32 stats) + silu
            hf = h.astype(jnp.float32)
            hw = hf.reshape(B, side * side, 32, c // 32)
            m = hw.mean(axis=(1, 3), keepdims=True)
            v = jnp.square(hw - m).mean(axis=(1, 3), keepdims=True)
            y = ((hw - m) * lax.rsqrt(v + 1e-5)).reshape(h.shape)
            y = y * s + b
            return (y * jax.nn.sigmoid(y)).astype(h.dtype)

        def fused(h, s, b):
            return fused_groupnorm_silu(h, s, b, num_groups=32, eps=1e-5,
                                        silu=True)

        entry = {}
        bytes_rw = 2 * x.size * 2  # bf16 read + write
        for name, fn in (("xla", xla_gn), ("pallas_fused", fused)):
            try:
                dt = time_chained(fn, x, scale, bias)
                entry[name] = {"us": round(dt * 1e6, 1),
                               "gbps": round(bytes_rw / dt / 1e9, 1)}
            except Exception as e:  # noqa: BLE001
                entry[name] = {"error": f"{type(e).__name__}: {str(e)[:150]}"}
        if "us" in entry.get("xla", {}) and \
                "us" in entry.get("pallas_fused", {}):
            entry["speedup"] = round(entry["xla"]["us"]
                                     / entry["pallas_fused"]["us"], 3)
        results[f"{side}x{side}x{c}"] = entry
        print(json.dumps({f"{side}x{side}x{c}": entry}), flush=True)

    try:
        with open(OUT) as f:
            allr = json.load(f)
    except FileNotFoundError:
        allr = {}
    allr["gnsilu"] = results
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
