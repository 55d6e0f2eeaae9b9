"""Probe: cross-attention (tiny S_kv=77) formulation variants.

SD2's level-0 cross-attention (B=32, Sq=4096, Skv=77, H=5, D=64) measured
12.3 ms — 5x SD1's same-FLOP geometry and ~25% of the whole UNet step.
The FLOPs are trivial (~0.5 GFLOP); the einsum layout must be the problem.
Times alternative formulations; the winner becomes a small-S_kv
specialization in ops/attention.py.  Appends "crossattn_variants".
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


def sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def v_einsum(q, k, v, scale):
    """Current xla_attention formulation."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)


def v_merged(q, k, v, scale):
    """Merge (B,H) into one leading batch dim via explicit transpose."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    qm = q.transpose(0, 2, 1, 3).reshape(B * H, Sq, D)
    km = k.transpose(0, 2, 1, 3).reshape(B * H, Sk, D)
    vm = v.transpose(0, 2, 1, 3).reshape(B * H, Sk, D)
    logits = lax.dot_general(qm, km, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    o = lax.dot_general(p.astype(vm.dtype), vm,
                        (((2,), (1,)), ((0,), (0,))))
    return o.reshape(B, H, Sq, D).transpose(0, 2, 1, 3)


def v_flatheads(q, k, v, scale):
    """Keep heads folded into the FEATURE dim: per-head block matmuls via
    one (Sq, H*D) x (H*D, H*Sk) block-diagonal-free two-step: compute
    logits per head with k reshaped (B, Sk*H, D) is wrong — instead use
    dot_general with TWO batch dims (b, h) and q laid out (B, H, Sq, D)."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    qh = jnp.moveaxis(q, 2, 1)  # (B,H,Sq,D)
    kh = jnp.moveaxis(k, 2, 1)
    vh = jnp.moveaxis(v, 2, 1)
    logits = lax.dot_general(qh, kh, (((3,), (3,)), ((0, 1), (0, 1))),
                             preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    o = lax.dot_general(p.astype(vh.dtype), vh,
                        (((3,), (2,)), ((0, 1), (0, 1))))
    return jnp.moveaxis(o, 1, 2)


def v_onematmul(q, k, v, scale):
    """Single giant matmul over merged (H*D): logits computed per head by
    slicing a (Sq, H, Sk) result of (B, Sq, H, D) x (B, Sk, H, D) with a
    head-batched einsum that keeps q in its NATIVE (b q h d) layout and
    contracts d with k ALSO in native layout (b k h d), producing
    (b q h k) directly — avoids the bhqk transpose entirely."""
    logits = jnp.einsum("bqhd,bkhd->bqhk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bqhk,bkhd->bqhd", p.astype(v.dtype), v)


VARIANTS = {"einsum_bhqk": v_einsum, "merged_bh": v_merged,
            "twobatch_bh": v_flatheads, "native_bqhk": v_onematmul}


def bench(fn, B, Sq, Sk, H, D):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, Sq, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, Sk, H, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, Sk, H, D), jnp.bfloat16)
    scale = D ** -0.5

    @jax.jit
    def run(q, k, v):
        def body(i, q):
            o = fn(q, k, v, scale)
            return (o * jnp.bfloat16(0.5) + q * jnp.bfloat16(0.5))
        return lax.fori_loop(0, ITERS, body, q)

    # correctness vs reference first
    ref = np.asarray(v_einsum(q, k, v, scale), np.float32)
    got = np.asarray(fn(q, k, v, scale), np.float32)
    ok = bool(np.allclose(ref, got, atol=2e-2, rtol=2e-2))
    sync(run(q, k, v))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(run(q, k, v))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return {"ms": round(ts[1] / ITERS * 1000, 2), "match": ok}


def main():
    res = {}
    for geo_name, geo in {"sd2_x0": (32, 4096, 77, 5, 64),
                          "sd1_x0": (32, 4096, 77, 8, 40)}.items():
        for vname, fn in VARIANTS.items():
            key = f"{geo_name}_{vname}"
            try:
                res[key] = bench(fn, *geo)
            except Exception as e:  # noqa: BLE001
                res[key] = f"ERR {type(e).__name__}: {str(e)[:120]}"
            print(key, res[key], flush=True)

    with open(OUT) as f:
        allr = json.load(f)
    allr["crossattn_variants"] = res
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)


if __name__ == "__main__":
    main()
