"""Tensor parallelism via GSPMD param-sharding rules on the ``model`` axis.

SD 1.x (860M params) replicates comfortably, so the default mesh keeps
``model=1``.  For larger UNets (SDXL+) or small-HBM chips, these rules shard
the transformer weights Megatron-style over the mesh ``model`` axis:

* attention ``to_q/to_k/to_v`` and FF ``proj_in``: output-feature sharded
  (column parallel — each chip owns a head/neuron slice),
* attention ``to_out`` and FF ``proj_out``: input-feature sharded
  (row parallel — XLA inserts the psum all-reduce automatically via SPMD
  propagation),
* everything else (convs, norms, embeddings): replicated.

No module changes: rules map flax param *paths* to ``PartitionSpec``s, and
the engine device_puts params with the resulting ``NamedSharding`` tree; XLA
partitions the matmuls and places the collectives.  This is the modern
equivalent of what the reference cannot do at all — its only strategy is
pmap replication (``flax_stable_diffusion_pipeline.py:898-932``).
"""

from __future__ import annotations

import re
from typing import Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec builder): first match wins.  Specs are for 2-D kernels
# (in, out); 1-D params (bias/scale) and convs fall through to replicated.
DEFAULT_TP_RULES: Sequence[Tuple[str, P]] = (
    # column-parallel: shard the output features
    (r".*(attn1|attn2|mid_attn|to_q|to_k|to_v).*?/(to_q|to_k|to_v)/kernel$",
     P(None, "model")),
    (r".*/ff/proj_in/kernel$", P(None, "model")),
    # row-parallel: shard the input features (psum inserted by SPMD)
    (r".*/(to_out)/kernel$", P("model", None)),
    (r".*/ff/proj_out/kernel$", P("model", None)),
    # CLIP text layers follow the same pattern
    (r".*/(q_proj|k_proj|v_proj|fc1)/kernel$", P(None, "model")),
    (r".*/(out_proj|fc2)/kernel$", P("model", None)),
)


def param_pspecs(params, rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES):
    """Tree of PartitionSpec matching ``params``; unmatched leaves -> P()."""
    compiled = [(re.compile(pat), spec) for pat, spec in rules]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if leaf.ndim == 2:  # only 2-D kernels shard
            for pat, spec in compiled:
                if pat.match(name):
                    return spec
        return P()

    specs = {jax.tree_util.keystr(p): spec_for(p, leaf) for p, leaf in flat}
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [specs[jax.tree_util.keystr(p)] for p, _ in flat])


def shard_params(mesh: Mesh, params,
                 rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES):
    """device_put params with TP shardings (replicated when model axis is 1
    — the specs degenerate gracefully)."""
    specs = param_pspecs(params, rules)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(params, shardings), shardings


def tp_param_fraction(params, rules=DEFAULT_TP_RULES) -> float:
    """Fraction of parameter bytes that the rules shard (diagnostics)."""
    specs = param_pspecs(params, rules)
    flat_p = jax.tree.leaves(params)
    flat_s = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    sharded = sum(p.size for p, s in zip(flat_p, flat_s) if s != P())
    total = sum(p.size for p in flat_p)
    return sharded / max(total, 1)
