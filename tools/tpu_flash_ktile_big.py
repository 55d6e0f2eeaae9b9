"""Flash-attention BIG k-tile probe at high-res sequence lengths.

The r2 high-res sweep (profile2_r02.json "flash_highres") stopped at
tk=2048, yet throughput at S=16384 was still rising with tk
(k512/k1024/k2048 = 16.9/28.4/31.7 TF/s at q512), and the r3 D=64 sweep
found the k tile "wants the whole sequence".  This closes the question:
tk in {4096, 8192, Sk} (plus q1024 variants) at the 1024^2 (S=16384) and
768^2 (S=9216, tk in {3072, 4608, 9216}) UNet level-0 geometries.
Appends "flash_ktile_big" to probe_r03.json.
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

from stable_diffusion_videos_tpu.ops.flash_attention import \
    flash_attention  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r03.json")
ITERS = 6


def sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def bench(B, S, H, D, tq, tk):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)

    @jax.jit
    def run(q, k, v):
        def body(i, q):
            o = flash_attention(q, k, v, tile_q=tq, tile_k=tk)
            return (o * jnp.bfloat16(0.5) + q * jnp.bfloat16(0.5))
        return lax.fori_loop(0, ITERS, body, q)

    sync(run(q, k, v))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(run(q, k, v))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    fl = 4 * B * H * S * S * D * ITERS  # true (unpadded) FLOPs
    return {"tf_s": round(fl / ts[1] / 1e12, 1),
            "ms": round(ts[1] / ITERS * 1000, 1)}


def main():
    res = {}
    cases = {
        # 1024^2: engine batch 1 -> CFG 2.  Baseline (applied): q512/k2048.
        "s16384": ((2, 16384, 8, 40),
                   [(512, 4096), (512, 8192), (512, 16384),
                    (1024, 2048), (1024, 4096), (256, 4096)]),
        # 768^2: engine batch 2 -> CFG 4.  Baseline (applied): q512/k1024.
        "s9216": ((4, 9216, 8, 40),
                  [(512, 3072), (512, 4608), (512, 9216), (1024, 3072)]),
    }
    for geo_name, ((B, S, H, D), tiles) in cases.items():
        for tq, tk in tiles:
            name = f"{geo_name}_q{tq}_k{tk}"
            try:
                res[name] = bench(B, S, H, D, tq, tk)
            except Exception as e:  # noqa: BLE001
                res[name] = f"ERR {type(e).__name__}: {str(e)[:100]}"
            print(name, res[name], flush=True)

    with open(OUT) as f:
        allr = json.load(f)
    allr["flash_ktile_big"] = res
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)
    print("WROTE", OUT, flush=True)


if __name__ == "__main__":
    main()
