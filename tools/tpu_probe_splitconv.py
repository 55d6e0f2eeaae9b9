"""Probe: up-path resnet conv on concat(x, skip) vs split-weight sum.

The UNet up path concatenates the skip connection before conv1
(channels double/triple); algebraically conv(concat(x, s), W) ==
conv(x, W_x) + conv(s, W_s).  The split form avoids materialising the
concat in HBM — XLA may or may not already do this.  Measures both at the
three SD1.x up-path geometries.  Appends to profile2_r02.json "splitconv".
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
                   "profile2_r02.json")
ITERS = 20
DN = ("NHWC", "HWIO", "NHWC")


def sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timed(fn, *args):
    r = fn(*args)
    sync(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*args)
        sync(r)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[1]


def bench_pair(B, H, W, cx, cs, cout):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, cx), jnp.bfloat16)
    s = jax.random.normal(key, (B, H, W, cs), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, cx + cs, cout), jnp.bfloat16) * 0.02

    # NOTE: the skip tensor must be loop-CARRIED (s scaled each iteration),
    # otherwise XLA hoists or algebraically simplifies conv(s, Ws) (scalar
    # multiplies commute through convs) — the update must be nonlinear
    @jax.jit
    def concat_form(x, s, w):
        def body(i, v):
            x, s = v
            y = lax.conv_general_dilated(
                jnp.concatenate([x, s], -1), w, (1, 1), "SAME",
                dimension_numbers=DN)
            return (y[..., :cx].astype(jnp.bfloat16),
                    (s + jnp.abs(s) * jnp.bfloat16(1e-3)))
        return lax.fori_loop(0, ITERS, body, (x, s))[0]

    @jax.jit
    def split_form(x, s, w):
        wx, ws = w[:, :, :cx], w[:, :, cx:]

        def body(i, v):
            x, s = v
            y = lax.conv_general_dilated(x, wx, (1, 1), "SAME",
                                         dimension_numbers=DN) \
                + lax.conv_general_dilated(s, ws, (1, 1), "SAME",
                                           dimension_numbers=DN)
            return (y[..., :cx].astype(jnp.bfloat16),
                    (s + jnp.abs(s) * jnp.bfloat16(1e-3)))
        return lax.fori_loop(0, ITERS, body, (x, s))[0]

    # numerics identical?
    a = np.asarray(concat_form(x, s, w), np.float32)
    b = np.asarray(split_form(x, s, w), np.float32)
    close = bool(np.allclose(a, b, atol=2e-1, rtol=2e-1))
    tc, tsp = timed(concat_form, x, s, w), timed(split_form, x, s, w)
    fl = 2 * B * H * W * 9 * (cx + cs) * cout * ITERS
    return {"concat_tf": round(fl / tc / 1e12, 1),
            "split_tf": round(fl / tsp / 1e12, 1), "allclose": close}


def main():
    res = {}
    # (x channels, skip channels, out) at each up-path geometry, B=16 CFG=32
    for name, (B, H, W, cx, cs, co) in {
        "up0_64x64_320+640": (32, 64, 64, 320, 640, 320),
        "up1_32x32_640+1280": (32, 32, 32, 640, 1280, 640),
        "up2_16x16_1280+1280": (32, 16, 16, 1280, 1280, 1280),
    }.items():
        try:
            res[name] = bench_pair(B, H, W, cx, cs, co)
        except Exception as e:  # noqa: BLE001
            res[name] = f"ERR {type(e).__name__}: {str(e)[:120]}"
        print(name, res[name], flush=True)

    with open(OUT) as f:
        allr = json.load(f)
    allr["splitconv"] = res
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)


if __name__ == "__main__":
    main()
