"""Probe: does int8 matmul/conv hit the v5e's 2x MXU path via axon?

Measures sustained TOP/s for int8 (int32-accumulate) vs bf16 at SD1.x UNet
conv/FF geometries.  If int8 sustains >=1.5x bf16, a W8A8 engine path is
worth building (conv/FF ~50% of UNet step time -> ~1.3x end-to-end).

Timing rule (ROADMAP.md): chain iterations inside one jit via lax.fori_loop
and sync by device-to-host fetch; never trust block_until_ready on axon.
Appends results to tools/profile2_r02.json under "int8".
"""
import functools
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
ITERS = 30


def sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timed(fn, *args):
    """Median wall-clock of 3 runs of fn (which loops ITERS internally)."""
    r = fn(*args)
    sync(r)  # compile + warmup
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*args)
        sync(r)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[1]


def loop_matmul(dtype, acc, M, K, N):
    @jax.jit
    def run(a, b):
        def body(i, x):
            y = lax.dot_general(x, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=acc)
            # renormalise back into the input dtype so the loop carries
            return y.astype(jnp.float32).astype(dtype)[:, :K] \
                if N >= K else y.astype(dtype)
        return lax.fori_loop(0, ITERS, body, a)

    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        a = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
        b = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    else:
        a = jax.random.normal(key, (M, K), dtype)
        b = jax.random.normal(key, (K, N), dtype)
    dt = timed(run, a, b)
    flops = 2 * M * K * N * ITERS
    return flops / dt / 1e12


def loop_conv(dtype, acc, B, H, W, Cin, Cout):
    @jax.jit
    def run(x, w):
        def body(i, v):
            y = lax.conv_general_dilated(
                v, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc)
            return y.astype(jnp.float32).astype(dtype)[..., :Cin] \
                if Cout >= Cin else y.astype(dtype)
        return lax.fori_loop(0, ITERS, body, x)

    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        x = jax.random.randint(key, (B, H, W, Cin), -127, 127, jnp.int8)
        w = jax.random.randint(key, (3, 3, Cin, Cout), -127, 127, jnp.int8)
    else:
        x = jax.random.normal(key, (B, H, W, Cin), dtype)
        w = jax.random.normal(key, (3, 3, Cin, Cout), dtype)
    dt = timed(run, x, w)
    flops = 2 * B * H * W * 9 * Cin * Cout * ITERS
    return flops / dt / 1e12


def main():
    res = {}
    # FF geometry: level-1 transformer FF (S=1024, 640->2560) and level-2
    # (S=256 per frame x batch, 1280->5120); batch 16 frames folded in.
    for name, (M, K, N) in {
        "ff_l1": (16 * 1024, 640, 2560),
        "ff_l2": (16 * 256, 1280, 5120),
        "big_square": (4096, 4096, 4096),
    }.items():
        for dname, (dt, acc) in {
            "bf16": (jnp.bfloat16, jnp.float32),
            "int8": (jnp.int8, jnp.int32),
        }.items():
            try:
                tf = loop_matmul(dt, acc, M, K, N)
            except Exception as e:  # noqa: BLE001
                tf = f"ERR {type(e).__name__}: {str(e)[:120]}"
            res[f"matmul_{name}_{dname}"] = tf
            print(f"matmul {name} {dname}: {tf}", flush=True)

    # conv3x3 geometries: UNet level-1 (32x32x640) and level-0 (64x64x320)
    for name, (B, H, W, Ci, Co) in {
        "conv_l0": (16, 64, 64, 320, 320),
        "conv_l1": (16, 32, 32, 640, 640),
        "conv_l2": (16, 16, 16, 1280, 1280),
    }.items():
        for dname, (dt, acc) in {
            "bf16": (jnp.bfloat16, jnp.float32),
            "int8": (jnp.int8, jnp.int32),
        }.items():
            try:
                tf = loop_conv(dt, acc, B, H, W, Ci, Co)
            except Exception as e:  # noqa: BLE001
                tf = f"ERR {type(e).__name__}: {str(e)[:120]}"
            res[f"{name}_{dname}"] = tf
            print(f"{name} {dname}: {tf}", flush=True)

    with open(OUT) as f:
        all_res = json.load(f)
    all_res["int8"] = {k: (round(v, 1) if isinstance(v, float) else v)
                       for k, v in res.items()}
    with open(OUT, "w") as f:
        json.dump(all_res, f, indent=1)
    print(json.dumps(all_res["int8"]))


if __name__ == "__main__":
    main()
