"""Probe: head-packed attention for D=40 heads (VERDICT r2 weak #1b).

SD1.x levels 0/1 have 8 heads of D=40; the 128-lane MXU contraction pads
40 -> 128 (3.2x waste) in QK^T, and the P@V output occupies 40 of 128
lanes.  The one untried idea from r2: pack 3 heads' D into 120 lanes.

Analysis first (the probe verifies it): packing cannot recover the 3.2x —
per-head separation forces block-diagonal operands, and the zero blocks
occupy MXU lanes exactly like padding does:

* QK^T packed: (3S, 120) @ (120, S) with block-diag Q' = 3*S*S*120 MACs
  vs padded 3*(S, 128)@(128, S) = 3*S*S*128 -> at most 128/120 = 6.7%.
* P@V packed: (S, 3S) @ block-diag(V) (3S, 120) = same 6.7% bound.

Variants measured at (B=32, S=4096, H=8, D=40) and (S=1024, D=80):
  xla_sdpa       — production einsum attention (the r2 winner)
  packed_qk      — 3-head block-diag QK^T + packed P@V, XLA einsums
  unpacked_pad   — explicit 40->128 zero-pad baseline (sanity)

Appends "headpack" to tools/probe_r03.json; a <10% delta closes the
question per docs/performance.md.
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
ITERS = 24
CASES = [  # (S, H, D) — SD1.x level 0 self-attn, level 1
    (4096, 8, 40),
    (1024, 8, 80),
]
B = 32


def sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def xla_sdpa(q, k, v, scale):
    # (B, S, H, D) — the production path (ops/attention.py einsum form)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def packed(q, k, v, scale, pack=3):
    """Block-diagonal 3-head packing: contraction/output lanes 120/128."""
    Bq, S, H, D = q.shape
    Hp = (H + pack - 1) // pack * pack
    if Hp != H:
        pad = [(0, 0), (0, 0), (0, Hp - H), (0, 0)]
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
    G = Hp // pack  # packed groups
    # Q' block-diag: (B, G, pack, S, pack*D) with head j in lanes [jD:(j+1)D]
    qg = q.reshape(Bq, S, G, pack, D).transpose(0, 2, 3, 1, 4)  # B,G,p,S,D
    eye = jnp.eye(pack, dtype=q.dtype)
    qb = jnp.einsum("bgpsd,pj->bgpsjd", qg, eye).reshape(
        Bq, G, pack, S, pack * D)
    kg = k.reshape(Bq, S, G, pack, D).transpose(0, 2, 1, 3, 4).reshape(
        Bq, G, S, pack * D)  # heads concatenated along lanes
    # scores: contraction over the packed 120 lanes; zeros select the head
    s = jnp.einsum("bgpsl,bgkl->bgpsk", qb, kg) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    # P@V packed: block-diag V so one matmul emits all pack heads
    vg = v.reshape(Bq, S, G, pack, D).transpose(0, 2, 3, 1, 4)  # B,G,p,S,D
    vb = jnp.einsum("bgpsd,pj->bgsjpd", vg, eye).reshape(
        Bq, G, S, pack, pack * D)  # zero except block p
    out = jnp.einsum("bgpsk,bgkpl->bgpsl", p, vb)
    # extract head p's lanes [pD:(p+1)D]
    out = out.reshape(Bq, G, pack, S, pack, D)
    idx = jnp.arange(pack)
    out = out[:, :, idx, :, idx]  # advanced idx -> (pack, B, G, S, D)
    out = out.transpose(1, 3, 2, 0, 4).reshape(Bq, S, G * pack, D)
    return out[:, :, :H]


def padded(q, k, v, scale):
    Bq, S, H, D = q.shape
    qp = jnp.pad(q, [(0, 0), (0, 0), (0, 0), (0, 128 - D)])
    kp = jnp.pad(k, [(0, 0), (0, 0), (0, 0), (0, 128 - D)])
    s = jnp.einsum("bqhd,bkhd->bhqk", qp, kp) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def time_fn(fn, q, k, v, scale, n=3):
    @jax.jit
    def run(q, k, v):
        def body(i, carry):
            out = fn(carry, k, v, scale)
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
    results = {"iters": ITERS, "batch": B}
    for S, H, D in CASES:
        rng = np.random.default_rng(0)
        q, k, v = (jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.1,
                               jnp.bfloat16) for _ in range(3))
        scale = 1.0 / np.sqrt(D)
        flops = 2 * 2 * B * H * S * S * D  # qk + pv
        entry = {}
        # numerics check once (CPU-cheap shapes would be better, but verify
        # on-device at the real shape with relaxed tolerance)
        try:
            ref = xla_sdpa(q[:1], k[:1], v[:1], scale)
            got = packed(q[:1], k[:1], v[:1], scale)
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                        - got.astype(jnp.float32))))
            entry["packed_max_abs_err"] = round(err, 5)
        except Exception as e:  # noqa: BLE001
            entry["packed_err"] = f"{type(e).__name__}: {str(e)[:200]}"
        for name, fn in (("xla_sdpa", xla_sdpa), ("packed_qk", packed),
                         ("padded_128", padded)):
            try:
                dt = time_fn(fn, q, k, v, scale)
                entry[name] = {"us": round(dt * 1e6, 1),
                               "tflops": round(flops / dt / 1e12, 1)}
            except Exception as e:  # noqa: BLE001
                entry[name] = {"error": f"{type(e).__name__}: "
                                        f"{str(e)[:150]}"}
        results[f"S{S}_H{H}_D{D}"] = entry
        print(json.dumps({f"S{S}_H{H}_D{D}": entry}), flush=True)

    try:
        with open(OUT) as f:
            allr = json.load(f)
    except FileNotFoundError:
        allr = {}
    allr["headpack"] = results
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
