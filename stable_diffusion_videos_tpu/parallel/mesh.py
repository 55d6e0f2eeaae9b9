"""Device mesh + sharding — the framework's only parallelism substrate.

The reference shards frames over TPU cores with legacy ``jax.pmap`` plus a
manual host-side pad/shard/unshard dance (reference
``flax_stable_diffusion_pipeline.py:898-932,935-939``; ``shard`` at
``:577-578``).  Here that is replaced by the modern idiom (SURVEY.md §5.8):
one ``jax.sharding.Mesh`` over all chips with

* a ``data`` axis — frames of the walk batch (embarrassingly parallel), and
* a ``model`` axis — reserved for tensor-parallel sharding of attention
  heads / MLP at >SD1.x scale (size 1 on a v4-8 for SD1.x, where weights
  replicate comfortably).

``jax.jit`` with ``NamedSharding`` annotations replaces pmap: XLA inserts the
collectives, params replicate via sharding spec (no ``flax.jax_utils
.replicate`` buffers), and multi-host DCN falls out of
``jax.distributed.initialize`` + the same global mesh with no code change.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              data: Optional[int] = None, model: int = 1) -> Mesh:
    """Build a (data, model) mesh.  Defaults: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"data*model ({data}*{model}) != #devices ({n})")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (frame/batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device_put a pytree with its leading axis sharded over ``data``."""
    return jax.device_put(tree, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    """Device_put a pytree fully replicated (params)."""
    return jax.device_put(tree, replicated(mesh))


def data_parallel_size(mesh: Mesh) -> int:
    return mesh.shape["data"]


def pad_to_multiple(n: int, multiple: int) -> int:
    """Smallest m >= n with m % multiple == 0 (batch padding for even
    sharding; cf. reference ``pad_along_axis``, ``utils.py:131-136``)."""
    return ((n + multiple - 1) // multiple) * multiple


def pad_along_axis(array: np.ndarray, pad_size: int,
                   axis: int = 0) -> np.ndarray:
    """Zero-pad ``pad_size`` trailing entries on ``axis`` (reference
    ``utils.py:131-136`` API parity; the engine normally pads inside jit)."""
    if pad_size <= 0:
        return array
    widths = [(0, 0)] * array.ndim
    widths[axis] = (0, pad_size)
    return np.pad(array, widths)
