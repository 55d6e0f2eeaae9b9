"""Flash-attention tile sweep at the HIGH-RES sequence lengths.

The kernel's default tiles (tq=256, tk=1024) were tuned at S=4096 (512^2);
from S>=8192 flash is the only path that fits HBM, and its tiles were never
swept there.  Measures (tq, tk) combinations at 768^2 (S=9216) and 1024^2
(S=16384) UNet level-0 geometry.  Appends "flash_highres" to
profile2_r02.json.
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
                   "profile2_r02.json")
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
    # 768^2: engine batch 2 -> CFG 4; 1024^2: batch 1 -> CFG 2
    for geo_name, (B, S, H, D) in {"s9216": (4, 9216, 8, 40),
                                   "s16384": (2, 16384, 8, 40)}.items():
        for tq in (256, 512):
            for tk in (512, 1024, 2048):
                name = f"{geo_name}_q{tq}_k{tk}"
                try:
                    res[name] = bench(B, S, H, D, tq, tk)
                except Exception as e:  # noqa: BLE001
                    res[name] = f"ERR {type(e).__name__}: {str(e)[:100]}"
                print(name, res[name], flush=True)

    with open(OUT) as f:
        allr = json.load(f)
    allr["flash_highres"] = res
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)


if __name__ == "__main__":
    main()
