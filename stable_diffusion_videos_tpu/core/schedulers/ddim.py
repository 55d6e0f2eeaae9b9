"""DDIM sampler (Song et al. 2020) — deterministic at eta=0.

Equivalent of the DDIMScheduler used by the reference
(``stable_diffusion_pipeline.py:17,393-426``), as host tables + a pure step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import (Scheduler, SchedulerConfig, alphas_cumprod_for,
                   pred_original_sample, register, spaced_timesteps,
                   transition_noise)


@register
class DDIM(Scheduler):
    name = "ddim"
    stochastic = False  # at eta=0 (the pipeline default, eta arg supported)

    def make_tables(self, cfg: SchedulerConfig, num_inference_steps: int,
                    eta: float = 0.0):
        acp = alphas_cumprod_for(cfg)
        ts = spaced_timesteps(cfg, num_inference_steps)
        a_t = acp[ts]
        prev_ts = ts - cfg.num_train_timesteps // num_inference_steps
        final_alpha = 1.0 if cfg.set_alpha_to_one else acp[0]
        a_prev = np.where(prev_ts >= 0, acp[np.maximum(prev_ts, 0)], final_alpha)
        variance = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
        return {
            "timesteps": jnp.asarray(ts, jnp.int32),
            "alphas_cumprod": jnp.asarray(acp, jnp.float32),
            "alpha_prod": jnp.asarray(a_t, jnp.float32),
            "alpha_prod_prev": jnp.asarray(a_prev, jnp.float32),
            "std_dev": jnp.asarray(eta * np.sqrt(variance), jnp.float32),
            "init_noise_sigma": jnp.float32(1.0),
            "prediction_type": cfg.prediction_type,
            "clip_sample": cfg.clip_sample,
        }

    def init_state(self, tables, latent_shape, key=None):
        return {"key": key if key is not None else jax.random.PRNGKey(0)}

    def step(self, tables, state, i, model_output, sample):
        a_t = tables["alpha_prod"][i]
        a_prev = tables["alpha_prod_prev"][i]
        sigma = tables["std_dev"][i]

        x0 = pred_original_sample(model_output, sample, a_t,
                                  tables["prediction_type"])
        if tables["prediction_type"] == "v_prediction":
            eps = jnp.sqrt(a_t) * model_output + jnp.sqrt(1 - a_t) * sample
        else:
            eps = (sample - jnp.sqrt(a_t) * x0) / jnp.sqrt(1.0 - a_t)
        if tables["clip_sample"]:
            x0 = jnp.clip(x0, -1.0, 1.0)
            eps = (sample - jnp.sqrt(a_t) * x0) / jnp.sqrt(1.0 - a_t)

        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma ** 2, 0.0)) * eps
        prev = jnp.sqrt(a_prev) * x0 + dir_xt

        key, sub = jax.random.split(state["key"])
        noise = transition_noise(sub, sample, tables)
        prev = prev + sigma * noise  # sigma==0 when eta==0 (deterministic)
        return {"key": key}, prev.astype(sample.dtype)
