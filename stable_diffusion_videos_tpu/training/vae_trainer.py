"""VAE training — reconstruction + KL on the same mesh as inference.

The reference never trains anything (inference-only, SURVEY.md §5.4); this
exists so the framework can produce its OWN quality-gate weights: a tiny
bundle whose VAE actually reconstructs and whose UNet is then trained in
that latent space gives the step-cache / guidance-interval / fast-preset
gates something non-random to measure (VERDICT r4: on random weights every
config saturates at ~92 dB PSNR — the gate proves plumbing, not quality).

Objective (Rombach et al. 2022, sans the adversarial term — overkill for
gate-weight training):

    mean, logvar = encode(x);  z = mean + exp(logvar/2) * eps
    loss = ||decode(z) - x||^2 + kl_weight * KL(N(mean, var) || N(0, 1))

kl_weight defaults to SD's 1e-6 — the posterior stays nearly
deterministic, which is what a latent-diffusion VAE wants.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel.mesh import batch_sharding, make_mesh, replicate, replicated

logger = logging.getLogger("sdv_tpu")


class VAETrainer:
    """Owns optimizer state + the compiled sharded VAE train step."""

    def __init__(self, models, mesh=None, learning_rate: float = 1e-3,
                 kl_weight: float = 1e-6,
                 max_grad_norm: float = 1.0):
        self.models = models
        self.mesh = mesh if mesh is not None else make_mesh()
        self.kl_weight = float(kl_weight)
        self.tx = optax.chain(optax.clip_by_global_norm(max_grad_norm),
                              optax.adam(learning_rate))
        self.params = replicate(
            self.mesh,
            jax.tree.map(lambda x: jnp.array(x, jnp.float32, copy=True),
                         models.params["vae"]))
        self.opt_state = replicate(self.mesh, self.tx.init(self.params))
        self.step_count = 0
        self._train_step = self._build()

    def _build(self):
        vae = self.models.vae()
        tx = self.tx
        kl_w = self.kl_weight

        def loss_fn(params, images, key):
            mean, logvar = vae.apply(params, images,
                                     method=type(vae).encode)
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape, jnp.float32)
            recon = vae.apply(params, z, method=type(vae).decode)
            rec = jnp.mean((recon.astype(jnp.float32) - images) ** 2)
            kl = 0.5 * jnp.mean(mean ** 2 + jnp.exp(logvar) - 1.0 - logvar)
            return rec + kl_w * kl, rec

        def train_step(params, opt_state, images, key):
            (loss, rec), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, images, key)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, rec

        bs = batch_sharding(self.mesh)
        rep = replicated(self.mesh)
        return jax.jit(train_step,
                       in_shardings=(rep, rep, bs, rep),
                       out_shardings=(rep, rep, rep, rep),
                       donate_argnums=(0, 1))

    def step(self, images, key=None) -> float:
        """One optimization step.  images: (B, H, W, 3) float in [-1, 1].
        Returns the reconstruction MSE (the number worth watching)."""
        if key is None:
            key = jax.random.PRNGKey(self.step_count)
        images = jnp.asarray(images, jnp.float32)
        dp = self.mesh.shape["data"]
        b = images.shape[0]
        if b % dp:
            idx = jnp.arange(-(-b // dp) * dp) % b
            images = images[idx]
        images = jax.device_put(images, batch_sharding(self.mesh))
        self.params, self.opt_state, _loss, rec = self._train_step(
            self.params, self.opt_state, images, key)
        self.step_count += 1
        return float(rec)

    def recon_psnr(self, images) -> float:
        """Deterministic (mean-latent) reconstruction PSNR in dB over the
        [-1, 1] range — the convergence criterion for gate-weight VAEs."""
        vae = self.models.vae()
        x = jnp.asarray(images, jnp.float32)
        mean, _ = vae.apply(self.params, x, method=type(vae).encode)
        recon = vae.apply(self.params, mean, method=type(vae).decode)
        mse = float(jnp.mean((recon - x) ** 2))
        return float(10.0 * np.log10(4.0 / max(mse, 1e-12)))

    def export_params(self):
        """Trained VAE params (host float32 pytree)."""
        return jax.tree.map(lambda x: np.asarray(x, np.float32), self.params)
