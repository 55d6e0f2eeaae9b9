"""UNet fine-tuning — a sharded denoising-objective training step.

Beyond the reference's scope (it is inference-only) but a first-class
framework capability here: DreamBooth/style fine-tuning of the UNet on TPU.
The step is the standard epsilon-prediction objective (Ho et al. 2020):

    t ~ U[0, T);  x_t = sqrt(a_t) x0 + sqrt(1-a_t) eps;
    loss = ||unet(x_t, t, context) - eps||^2

jitted over the same (data, model) mesh as inference: batch data-parallel,
params replicated (or Megatron-TP via ``parallel/tp.py``), gradient psum
inserted by XLA SPMD.  bf16 forward/backward with fp32 params + Adam state.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.schedulers.base import SchedulerConfig, alphas_cumprod_for
from ..parallel.mesh import batch_sharding, make_mesh, replicate, replicated

logger = logging.getLogger("sdv_tpu")


@flax.struct.dataclass
class TrainConfig:
    learning_rate: float = flax.struct.field(pytree_node=False, default=1e-5)
    weight_decay: float = flax.struct.field(pytree_node=False, default=1e-2)
    beta1: float = flax.struct.field(pytree_node=False, default=0.9)
    beta2: float = flax.struct.field(pytree_node=False, default=0.999)
    max_grad_norm: float = flax.struct.field(pytree_node=False, default=1.0)
    warmup_steps: int = flax.struct.field(pytree_node=False, default=0)
    #: rematerialise the UNet forward in the backward pass
    #: (jax.checkpoint): ~sqrt activation memory for ~1.3x FLOPs — what
    #: makes full-geometry 512^2 fine-tuning fit a single chip's HBM
    remat: bool = flax.struct.field(pytree_node=False, default=False)
    #: "epsilon" (SD1.x/SDXL) or "v_prediction" (SD2.x) — must match the
    #: family's scheduler prediction type
    objective: str = flax.struct.field(pytree_node=False, default="epsilon")
    #: min-SNR-gamma loss weighting (Hang et al. 2023); 0 disables.  5.0 is
    #: the customary value — downweights the near-noise timesteps that
    #: otherwise dominate the gradient
    snr_gamma: float = flax.struct.field(pytree_node=False, default=0.0)
    #: exponential moving average of the params (the weights diffusion
    #: models are actually sampled from); 0 disables
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.0)


class UNetTrainer:
    """Owns optimizer state + the compiled sharded train step."""

    def __init__(self, models, mesh=None, config: Optional[TrainConfig] = None,
                 scheduler_config: Optional[SchedulerConfig] = None):
        self.models = models
        self.mesh = mesh if mesh is not None else make_mesh()
        self.config = config or TrainConfig()
        scfg = scheduler_config or models.scheduler_config
        self._acp = jnp.asarray(alphas_cumprod_for(scfg), jnp.float32)
        self._num_train_timesteps = scfg.num_train_timesteps

        cfg = self.config
        schedule: Any = cfg.learning_rate
        if cfg.warmup_steps:
            schedule = optax.linear_schedule(0.0, cfg.learning_rate,
                                             cfg.warmup_steps)
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adamw(schedule, b1=cfg.beta1, b2=cfg.beta2,
                        weight_decay=cfg.weight_decay))

        # fp32 master params on the mesh (explicit copies: the train step
        # donates its param buffers, which must not alias the bundle's)
        self.params = replicate(
            self.mesh,
            jax.tree.map(lambda x: jnp.array(x, jnp.float32, copy=True),
                         models.params["unet"]))
        self.opt_state = replicate(self.mesh, self.tx.init(self.params))
        #: EMA shadow of the params (sampled-from weights); tracks params
        #: exactly when ema_decay == 0 so export is uniform
        self.ema_params = replicate(
            self.mesh, jax.tree.map(lambda x: jnp.array(x, copy=True),
                                    self.params))             if self.config.ema_decay > 0.0 else None
        self.step_count = 0
        self._train_step = self._build()

    def _build(self):
        unet = self.models.unet()
        acp = self._acp
        tx = self.tx

        apply = unet.apply
        if self.config.remat:
            apply = jax.checkpoint(unet.apply,
                                   policy=jax.checkpoint_policies.nothing_saveable)

        objective = self.config.objective
        if objective not in ("epsilon", "v_prediction"):
            raise ValueError(f"unknown objective {objective!r}")
        snr_gamma = self.config.snr_gamma
        ema_decay = self.config.ema_decay

        def loss_fn(params, latents, context, t, noise):
            a = acp[t][:, None, None, None]
            noisy = jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise
            pred = apply(params, noisy, t.astype(jnp.float32), context)
            if objective == "v_prediction":
                # v = sqrt(a) eps - sqrt(1-a) x0 (Salimans & Ho 2022)
                target = jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * latents
            else:
                target = noise
            err = (pred.astype(jnp.float32) - target) ** 2
            if snr_gamma > 0.0:
                snr = a[:, 0, 0, 0] / (1.0 - a[:, 0, 0, 0])
                if objective == "v_prediction":
                    w = jnp.minimum(snr, snr_gamma) / (snr + 1.0)
                else:
                    w = jnp.minimum(snr, snr_gamma) / snr
                # mean over all elements == batch-mean of w_b * per-sample
                # MSE (w broadcasts over the pixel dims)
                return jnp.mean(w[:, None, None, None] * err)
            return jnp.mean(err)

        def train_step(params, ema, opt_state, latents, context, key):
            kt, kn = jax.random.split(key)
            b = latents.shape[0]
            t = jax.random.randint(kt, (b,), 0, self._num_train_timesteps)
            noise = jax.random.normal(kn, latents.shape, jnp.float32)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, latents, context, t, noise)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if ema_decay > 0.0:
                ema = jax.tree.map(
                    lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                    ema, params)
            return params, ema, opt_state, loss

        bs = batch_sharding(self.mesh)
        rep = replicated(self.mesh)
        return jax.jit(train_step,
                       in_shardings=(rep, rep, rep, bs, bs, rep),
                       out_shardings=(rep, rep, rep, rep),
                       donate_argnums=(0, 1, 2))

    # ------------------------------------------------------------------
    def step(self, latents, context, key=None) -> float:
        """One optimization step.  latents: (B, h, w, 4) clean image latents
        (already scaled by the VAE scaling factor); context: (B, S, D)."""
        if key is None:
            key = jax.random.PRNGKey(self.step_count)
        latents = jnp.asarray(latents, jnp.float32)
        context = jnp.asarray(context, jnp.float32)
        # even sharding: wrap-pad the batch with repeated samples (real data,
        # so the gradient is a slightly reweighted but unbiased mini-batch)
        dp = self.mesh.shape["data"]
        b = latents.shape[0]
        if b % dp:
            reps = -(-b // dp) * dp
            idx = jnp.arange(reps) % b
            latents, context = latents[idx], context[idx]
        latents = jax.device_put(latents, batch_sharding(self.mesh))
        context = jax.device_put(context, batch_sharding(self.mesh))
        # scalar placeholder when EMA is off — passing self.params here
        # would alias a DONATED buffer into a second argument
        ema_in = self.ema_params if self.ema_params is not None \
            else jax.device_put(jnp.float32(0), replicated(self.mesh))
        self.params, ema_out, self.opt_state, loss = self._train_step(
            self.params, ema_in, self.opt_state, latents, context, key)
        if self.ema_params is not None:
            self.ema_params = ema_out
        self.step_count += 1
        return float(loss)

    def finetune(self, images: np.ndarray, prompts, num_steps: int = 100,
                 log_every: int = 10):
        """Convenience: VAE-encode images ([-1,1] (N,H,W,3)) + embed prompts,
        then overfit for ``num_steps``.  Returns the loss history."""
        from ..runtime.engine import Engine
        engine = Engine(self.models, mesh=self.mesh)
        vae = self.models.vae()
        mean, _ = vae.apply(self.models.params["vae"],
                            jnp.asarray(images, jnp.float32),
                            method=type(vae).encode)
        latents = mean * self.models.vae_config.scaling_factor
        context = engine.embed_text(list(prompts))
        losses = []
        for i in range(num_steps):
            losses.append(self.step(latents, context))
            if log_every and i % log_every == 0:
                logger.info("finetune step %d loss %.5f", i, losses[-1])
        return losses

    def export_params(self, ema: bool = True):
        """Updated UNet params (dtype of the bundle) -> new params dict.
        ``ema=True`` exports the EMA weights when tracked (the weights
        diffusion models are sampled from); falls back to the live
        params otherwise."""
        src = self.ema_params if (ema and self.ema_params is not None) \
            else self.params
        out = dict(self.models.params)
        # COPY every leaf: the train step donates its param buffers, so a
        # same-dtype jnp.asarray view exported here would be deleted by
        # the next step() (observed as "Array has been deleted" at
        # bundle save time)
        out["unet"] = jax.tree.map(
            lambda x: jnp.array(x, self.models.dtype, copy=True)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.array(x, copy=True), src)
        return out

    # ------------------------------------------------------------------
    # checkpoint / resume (orbax)
    # ------------------------------------------------------------------
    def save_checkpoint(self, path):
        """Write params + optimizer state + EMA + step counter so a long
        fine-tune survives preemption (orbax; the inference engine's
        frame-granular resume is the separate walk-level mechanism)."""
        import orbax.checkpoint as ocp
        from pathlib import Path as _P
        path = _P(path).absolute()
        ckptr = ocp.PyTreeCheckpointer()
        payload = {"params": self.params, "opt_state": self.opt_state,
                   "step_count": self.step_count}
        if self.ema_params is not None:
            payload["ema_params"] = self.ema_params
        ckptr.save(path, payload, force=True)
        logger.info("saved training checkpoint @ step %d -> %s",
                    self.step_count, path)

    def restore_checkpoint(self, path):
        """Restore a save_checkpoint() snapshot into this trainer."""
        import orbax.checkpoint as ocp
        from pathlib import Path as _P
        ckptr = ocp.PyTreeCheckpointer()
        # restore INTO the live structure: optax states are NamedTuples,
        # which a structureless restore would flatten to dicts
        template = {"params": self.params, "opt_state": self.opt_state,
                    "step_count": 0}
        if self.ema_params is not None:
            template["ema_params"] = self.ema_params
        restored = ckptr.restore(_P(path).absolute(), item=template)
        self.params = replicate(self.mesh, restored["params"])
        self.opt_state = jax.tree.map(
            lambda x: jax.device_put(x, replicated(self.mesh)),
            restored["opt_state"])
        if "ema_params" in restored:
            self.ema_params = replicate(self.mesh, restored["ema_params"])
        self.step_count = int(restored["step_count"])
        return self
