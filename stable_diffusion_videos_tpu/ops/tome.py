"""Token Merging for Stable Diffusion (ToMe-SD) — XLA-static formulation.

Bolya & Hoffman 2023, "Token Merging for Fast Stable Diffusion": adjacent
latent tokens are visually redundant, so before a transformer block's
self-attention, merge the ``r·S`` most-redundant tokens into their nearest
neighbours, run attention on the reduced set, and unmerge (broadcast each
merged token's output from the token it merged into).  No weights change —
it is a pure runtime approximation, like DeepCache, and COMPOSABLE with it:
``step_cache`` skips the deep trunk between anchor steps while ToMe shrinks
the shallow high-resolution attention that caching cannot skip.

TPU-first differences from the CUDA reference implementation (tomesd):

* **Static shapes everywhere.**  ``n_merge = int(ratio * S)`` is a Python
  int baked into the program: top-k, gathers and scatters all have fixed
  shapes, so the whole thing lives inside the jitted denoise scan without
  recompilation or dynamic-shape fallbacks.
* **Matmul-formulated scatter.**  The merge step aggregates src tokens
  into dst tokens with a one-hot ``einsum`` (an MXU matmul) instead of a
  serialised scatter-add — scatters are the one op class TPUs hate.
* **Bipartite partition by a fixed 2x2 stride** (the paper's 2D strided
  dst set).  The partition indices are host-computed constants.

The merge plan (which tokens merge where) is data-dependent and recomputed
every call from the current features — only the SHAPES are static.

Applied (like tomesd's defaults) to self-attention only, at the highest
resolution level(s); cross-attention and FF see the full token set.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MergePlan(NamedTuple):
    """Data-dependent merge assignment with static shapes."""
    src_idx: jax.Array     # (S_src,) token positions of the src partition
    dst_idx: jax.Array     # (S_dst,) token positions of the dst partition
    kept: jax.Array        # (B, S_src - n) src-list indices kept unmerged
    merged: jax.Array      # (B, n) src-list indices merged away
    assign: jax.Array      # (B, n) dst-list index each merged token joins
    n_merge: int


def bipartite_partition(h: int, w: int, sy: int = 2, sx: int = 2):
    """Host-side constant partition: one dst token per sy*sx region (top-
    left corner), the rest src.  Returns (src_idx, dst_idx) numpy arrays."""
    ys, xs = np.arange(h), np.arange(w)
    grid = ys[:, None] * w + xs[None, :]
    dst_mask = (ys[:, None] % sy == 0) & (xs[None, :] % sx == 0)
    dst = grid[dst_mask].ravel()
    src = grid[~dst_mask].ravel()
    return src.astype(np.int32), dst.astype(np.int32)


def build_plan(metric: jax.Array, h: int, w: int, n_merge: int,
               sy: int = 2, sx: int = 2) -> MergePlan:
    """(B, S, C) features -> MergePlan merging the ``n_merge`` src tokens
    most cosine-similar to any dst token."""
    b, s, c = metric.shape
    assert s == h * w, (s, h, w)
    src_np, dst_np = bipartite_partition(h, w, sy, sx)
    n_merge = int(min(n_merge, len(src_np)))
    src_idx = jnp.asarray(src_np)
    dst_idx = jnp.asarray(dst_np)

    m = metric.astype(jnp.float32)
    m = m / (jnp.linalg.norm(m, axis=-1, keepdims=True) + 1e-6)
    sim = jnp.einsum("bsc,bdc->bsd", jnp.take(m, src_idx, axis=1),
                     jnp.take(m, dst_idx, axis=1))  # (B, S_src, S_dst)
    node_max = jnp.max(sim, axis=-1)                # (B, S_src)
    node_assign = jnp.argmax(sim, axis=-1)          # (B, S_src)

    # full descending order of src tokens by redundancy; the first n_merge
    # merge away, the rest stay (static split)
    order = jnp.argsort(-node_max, axis=-1)         # (B, S_src)
    merged = order[:, :n_merge]
    kept = order[:, n_merge:]
    assign = jnp.take_along_axis(node_assign, merged, axis=1)
    return MergePlan(src_idx, dst_idx, kept, merged, assign, n_merge)


def merge(x: jax.Array, plan: MergePlan) -> jax.Array:
    """(B, S, C) -> (B, S - n_merge, C): kept src tokens followed by dst
    tokens with their merged-in src tokens mean-aggregated."""
    xf = x.astype(jnp.float32)
    x_src = jnp.take(xf, plan.src_idx, axis=1)
    x_dst = jnp.take(xf, plan.dst_idx, axis=1)
    x_kept = jnp.take_along_axis(x_src, plan.kept[..., None], axis=1)
    x_merged = jnp.take_along_axis(x_src, plan.merged[..., None], axis=1)
    # matmul-scatter: (B, n, S_dst) one-hot aggregates merged src into dst
    onehot = jax.nn.one_hot(plan.assign, x_dst.shape[1], dtype=jnp.float32)
    dst_sum = x_dst + jnp.einsum("bnd,bnc->bdc", onehot, x_merged)
    counts = 1.0 + jnp.sum(onehot, axis=1)          # (B, S_dst)
    x_dst = dst_sum / counts[..., None]
    return jnp.concatenate([x_kept, x_dst], axis=1).astype(x.dtype)


def unmerge(out: jax.Array, plan: MergePlan, s_total: int) -> jax.Array:
    """(B, S - n_merge, C) block output -> (B, S, C): kept/dst tokens go
    back to their positions, merged tokens copy their dst's output.

    Formulated as a SCALAR-index scatter (each absolute position learns
    which reduced row supplies it) followed by one vectorised gather —
    TPUs serialise scatters, so scattering (B, S) int32 row ids instead of
    (B, S, C) float vectors cuts the scatter traffic by the channel width
    (320x at SD1.x level 0)."""
    b = out.shape[0]
    n_kept = plan.kept.shape[1]
    s_dst = plan.dst_idx.shape[0]

    kept_pos = jnp.take(plan.src_idx, plan.kept)       # (B, n_kept)
    merged_pos = jnp.take(plan.src_idx, plan.merged)   # (B, n)
    dst_pos = jnp.broadcast_to(plan.dst_idx[None], (b, s_dst))

    rows = jnp.zeros((b, s_total), jnp.int32)

    def scatter_rows(r, kp, mp, dp, asg):
        r = r.at[dp].set(n_kept + jnp.arange(s_dst, dtype=jnp.int32))
        r = r.at[kp].set(jnp.arange(n_kept, dtype=jnp.int32))
        r = r.at[mp].set(n_kept + asg)
        return r

    rows = jax.vmap(scatter_rows)(rows, kept_pos, merged_pos, dst_pos,
                                  plan.assign.astype(jnp.int32))
    return jnp.take_along_axis(out, rows[..., None], axis=1)


def tome_wrap(fn, x: jax.Array, h: int, w: int, ratio: float,
              sy: int = 2, sx: int = 2) -> jax.Array:
    """Run ``fn`` (e.g. self-attention) on the token-merged view of ``x``
    and unmerge its output: ``unmerge(fn(merge(x)))``.  ``ratio`` is the
    fraction of ALL tokens to merge (tomesd convention; capped at the src
    partition size, i.e. 1 - 1/(sy*sx))."""
    b, s, c = x.shape
    n_merge = int(ratio * s)
    if n_merge <= 0:
        return fn(x)
    plan = build_plan(x, h, w, n_merge, sy=sy, sx=sx)
    return unmerge(fn(merge(x, plan)), plan, s)
