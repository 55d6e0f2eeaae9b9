"""LoRA fine-tuning — low-rank adapters over the UNet's attention/FF kernels.

The standard SD customization path (Hu et al. 2021; the diffusers/kohya
ecosystem's dominant format) implemented the TPU-idiomatic way: instead of
monkey-patching module forwards (the torch approach), the jitted train step
computes ``W_eff = W + (alpha/r) * A @ B`` for every adapted 2-D kernel and
calls the UNCHANGED UNet with the merged tree.  XLA fuses the tiny
(in, r) @ (r, out) matmuls into the step; gradients flow only through
A/B (the base tree enters as a constant), so optimizer state is a few MB
instead of 3.4 GB.

Adapted kernels (the customary set): attention to_q/to_k/to_v/to_out and
the transformer FF projections.  Rank-r init: A ~ N(0, 1/r), B = 0 — the
delta starts at exactly zero, so step 0 reproduces the base model.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.schedulers.base import SchedulerConfig, alphas_cumprod_for
from ..parallel.mesh import batch_sharding, make_mesh, replicate, replicated

logger = logging.getLogger("sdv_tpu")

#: kernels that get adapters (2-D only)
DEFAULT_TARGET_RE = re.compile(
    r".*(to_q|to_k|to_v|to_out|ff/proj_in|ff/proj_out)/kernel$")


def _flatten(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [("/".join(str(getattr(k, "key", k)) for k in p), leaf)
            for p, leaf in flat]


def init_lora_params(unet_params, rank: int = 8, seed: int = 0,
                     target_re: re.Pattern = DEFAULT_TARGET_RE) -> dict:
    """{path: {"a": (in, r), "b": (r, out)}} for every matched 2-D kernel."""
    key = jax.random.PRNGKey(seed)
    out: dict[str, Any] = {}
    for name, leaf in _flatten(unet_params):
        if leaf.ndim == 2 and target_re.match(name):
            key, sub = jax.random.split(key)
            fan_in, fan_out = leaf.shape
            out[name] = {
                "a": (jax.random.normal(sub, (fan_in, rank), jnp.float32)
                      / np.sqrt(rank)),
                "b": jnp.zeros((rank, fan_out), jnp.float32),
            }
    if not out:
        raise ValueError("no kernels matched the LoRA target pattern")
    return out


def merge_lora(unet_params, lora, scale: float):
    """Base tree + scale * A@B on the adapted kernels (pure function —
    runs inside the jitted step; XLA fuses the rank-r matmuls)."""
    flat = jax.tree_util.tree_flatten_with_path(unet_params)
    leaves = []
    for p, leaf in flat[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in p)
        if name in lora:
            delta = (lora[name]["a"] @ lora[name]["b"]) * scale
            leaf = (leaf.astype(jnp.float32) + delta).astype(leaf.dtype)
        leaves.append(leaf)
    return jax.tree_util.tree_unflatten(flat[1], leaves)


class LoRATrainer:
    """Fine-tunes rank-r adapters only; the base UNet stays frozen."""

    def __init__(self, models, rank: int = 8, alpha: float | None = None,
                 mesh=None, learning_rate: float = 1e-4,
                 objective: str = "epsilon",
                 scheduler_config: Optional[SchedulerConfig] = None,
                 seed: int = 0):
        self.models = models
        self.mesh = mesh if mesh is not None else make_mesh()
        self.rank = rank
        self.alpha = float(alpha if alpha is not None else rank)
        self.scale = self.alpha / rank
        if objective not in ("epsilon", "v_prediction"):
            raise ValueError(f"unknown objective {objective!r}")
        self.objective = objective
        scfg = scheduler_config or models.scheduler_config
        self._acp = jnp.asarray(alphas_cumprod_for(scfg), jnp.float32)
        self._num_train_timesteps = scfg.num_train_timesteps

        self.base = replicate(self.mesh, models.params["unet"])
        self.lora = replicate(self.mesh, init_lora_params(
            models.params["unet"], rank=rank, seed=seed))
        self.tx = optax.adamw(learning_rate)
        self.opt_state = replicate(self.mesh, self.tx.init(self.lora))
        self.step_count = 0
        self._train_step = self._build()

    def _build(self):
        unet = self.models.unet()
        acp = self._acp
        tx = self.tx
        scale = self.scale
        objective = self.objective

        def loss_fn(lora, base, latents, context, t, noise):
            merged = merge_lora(base, lora, scale)
            a = acp[t][:, None, None, None]
            noisy = jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise
            pred = unet.apply(merged, noisy, t.astype(jnp.float32), context)
            if objective == "v_prediction":
                target = jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * latents
            else:
                target = noise
            return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

        def train_step(lora, opt_state, base, latents, context, key):
            kt, kn = jax.random.split(key)
            b = latents.shape[0]
            t = jax.random.randint(kt, (b,), 0, self._num_train_timesteps)
            noise = jax.random.normal(kn, latents.shape, jnp.float32)
            loss, grads = jax.value_and_grad(loss_fn)(
                lora, base, latents, context, t, noise)
            updates, opt_state = tx.update(grads, opt_state, lora)
            lora = optax.apply_updates(lora, updates)
            return lora, opt_state, loss

        bs = batch_sharding(self.mesh)
        rep = replicated(self.mesh)
        return jax.jit(train_step,
                       in_shardings=(rep, rep, rep, bs, bs, rep),
                       out_shardings=(rep, rep, rep),
                       donate_argnums=(0, 1))

    def step(self, latents, context, key=None) -> float:
        if key is None:
            key = jax.random.PRNGKey(self.step_count)
        latents = jax.device_put(jnp.asarray(latents, jnp.float32),
                                 batch_sharding(self.mesh))
        context = jax.device_put(jnp.asarray(context, jnp.float32),
                                 batch_sharding(self.mesh))
        self.lora, self.opt_state, loss = self._train_step(
            self.lora, self.opt_state, self.base, latents, context, key)
        self.step_count += 1
        return float(loss)

    # ------------------------------------------------------------------
    def export_params(self):
        """Full bundle params with the LoRA delta merged in (for the
        inference Engine)."""
        out = dict(self.models.params)
        out["unet"] = merge_lora(self.base, self.lora, self.scale)
        return out

    def save_lora(self, path):
        """Adapters alone (a few MB) as .npz: {path/a, path/b} + meta."""
        arrs = {}
        for name, ab in self.lora.items():
            arrs[f"{name}::a"] = np.asarray(ab["a"])
            arrs[f"{name}::b"] = np.asarray(ab["b"])
        np.savez_compressed(path, __rank__=self.rank, __alpha__=self.alpha,
                            **arrs)
        logger.info("saved %d LoRA adapters -> %s", len(self.lora), path)

    @staticmethod
    def load_lora(path) -> tuple[dict, int, float]:
        """-> (lora tree, rank, alpha); apply with ``merge_lora(base,
        lora, alpha/rank)``."""
        z = np.load(str(path) if str(path).endswith(".npz")
                    else str(path) + ".npz")
        lora: dict[str, Any] = {}
        for k in z.files:
            if k.startswith("__"):
                continue
            name, part = k.rsplit("::", 1)
            lora.setdefault(name, {})[part] = jnp.asarray(z[k])
        return lora, int(z["__rank__"]), float(z["__alpha__"])
