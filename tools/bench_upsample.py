"""Real-ESRGAN (RRDBNet x4) on-TPU benchmark: 512^2 -> 2048^2.

BASELINE.md graded config 5 (stretch): "4x Real-ESRGAN on-TPU upsample to
1024^2+".  The reference runs this stage on CUDA via basicsr
(``upsampling.py:17-28``); here it is the owned Flax RRDBNet, jitted in bf16
with random weights (identical FLOP/byte cost to trained ones).

Timing follows the environment rule: D2H fetch per run, never
block_until_ready.  Appends results to tools/profile2_r02.json under
"rrdbnet" and prints one JSON line.
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def main():
    from stable_diffusion_videos_tpu.models.rrdbnet import (RRDBNet,
                                                            RRDBNetConfig)

    cfg = RRDBNetConfig()  # RealESRGAN_x4plus geometry: 23 RRDB blocks
    model = RRDBNet(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 3))),
        jax.random.PRNGKey(0))
    key = [jax.random.PRNGKey(1)]

    def mk(s):
        key[0], sub = jax.random.split(key[0])
        return (jax.random.normal(sub, s.shape, jnp.float32) * 0.02).astype(
            jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype)
    params = jax.tree.map(mk, shapes)
    fwd = jax.jit(lambda p, x: model.apply(p, x))

    results = {}
    for B, side in [(1, 512), (2, 512), (1, 1024)]:
        x = jax.random.uniform(jax.random.PRNGKey(2), (B, side, side, 3),
                               jnp.bfloat16)
        try:
            t0 = time.perf_counter()
            out = fwd(params, x)
            sync(out)
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                sync(fwd(params, x))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            dt = ts[1]
            results[f"B{B}_{side}"] = {
                "s_per_batch": round(dt, 4),
                "ms_per_frame": round(dt / B * 1e3, 1),
                "out_side": side * 4, "compile_s": round(compile_s, 1)}
            print(f"# B={B} {side}^2 -> {side*4}^2: {dt/B*1e3:.0f} ms/frame "
                  f"(compile {compile_s:.0f}s)", file=sys.stderr, flush=True)
        except jax.errors.JaxRuntimeError as e:
            results[f"B{B}_{side}"] = {"err": str(e).splitlines()[0][:120]}
            print(f"# B={B} {side}^2 ERR {str(e)[:100]}", file=sys.stderr,
                  flush=True)

    out_json = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "profile2_r02.json")
    try:
        with open(out_json) as f:
            R = json.load(f)
    except (OSError, json.JSONDecodeError):
        R = {}
    R["rrdbnet"] = results
    with open(out_json, "w") as f:
        json.dump(R, f, indent=1)
    print(json.dumps({"metric": "realesrgan x4 512->2048 ms/frame (tpu)",
                      "results": results}))


if __name__ == "__main__":
    main()
