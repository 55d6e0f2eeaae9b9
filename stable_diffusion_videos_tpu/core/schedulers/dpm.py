"""DPM-Solver++ (2M, multistep, midpoint) sampler.

Equivalent of DPMSolverMultistepScheduler in the reference suite
(``stable_diffusion_pipeline.py:24``).  All per-step (alpha, sigma, lambda, h,
r0) terms and the "use first-order here" decisions are precomputed on the
host, so the device step is branch-free: both the first- and second-order
updates are evaluated (cheap elementwise VPU work) and selected per step index
with ``jnp.where`` — scan/jit-safe with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import (Scheduler, SchedulerConfig, alphas_cumprod_for, register)


@register
class DPMSolverMultistep(Scheduler):
    name = "dpm"
    stochastic = False

    def make_tables(self, cfg: SchedulerConfig, num_inference_steps: int):
        from .base import check_num_steps
        check_num_steps(cfg, num_inference_steps + 1)
        acp = alphas_cumprod_for(cfg)
        n = cfg.num_train_timesteps
        # (steps+1)-point grid, drop the terminal point -> descending timesteps
        if cfg.timestep_spacing == "linspace":
            ts = (np.linspace(0, n - 1, num_inference_steps + 1)
                  .round()[::-1][:-1].astype(np.int64))
        else:  # leading (SD checkpoints)
            ratio = n // (num_inference_steps + 1)
            ts = ((np.arange(0, num_inference_steps + 1) * ratio)
                  .round()[::-1][:-1].astype(np.int64)) + cfg.steps_offset

        alpha = np.sqrt(acp)
        sigma = np.sqrt(1.0 - acp)
        lam = np.log(alpha) - np.log(sigma)

        steps = num_inference_steps
        # at loop index i we move from timestep ts[i] to ts[i+1] (0 at the end)
        t_cur = ts
        t_prev = np.concatenate([ts[1:], [0]])
        lam_cur = lam[t_cur]
        lam_prev = lam[t_prev]
        h = lam_prev - lam_cur
        # h0[i] = lam_cur[i] - lam_cur[i-1] (for the 2nd-order D1 term)
        h0 = np.concatenate([[1.0], lam_cur[1:] - lam_cur[:-1]])

        first_order = np.zeros(steps, dtype=bool)
        first_order[0] = True
        if cfg.lower_order_final and steps < 15:
            first_order[-1] = True

        return {
            "timesteps": jnp.asarray(t_cur, jnp.int32),
            "alphas_cumprod": jnp.asarray(acp, jnp.float32),
            "alpha_cur": jnp.asarray(alpha[t_cur], jnp.float32),
            "sigma_cur": jnp.asarray(sigma[t_cur], jnp.float32),
            "alpha_prev": jnp.asarray(alpha[t_prev], jnp.float32),
            "sigma_prev": jnp.asarray(sigma[t_prev], jnp.float32),
            "h": jnp.asarray(h, jnp.float32),
            "h0": jnp.asarray(h0, jnp.float32),
            "first_order": jnp.asarray(first_order),
            "init_noise_sigma": jnp.float32(1.0),
            "prediction_type": cfg.prediction_type,
        }

    def init_state(self, tables, latent_shape, key=None):
        return {"m1": jnp.zeros(tuple(latent_shape), jnp.float32)}

    def step(self, tables, state, i, model_output, sample):
        a_c, s_c = tables["alpha_cur"][i], tables["sigma_cur"][i]
        a_p, s_p = tables["alpha_prev"][i], tables["sigma_prev"][i]
        h, h0 = tables["h"][i], tables["h0"][i]

        x = sample.astype(jnp.float32)
        eps = model_output.astype(jnp.float32)
        # data-prediction (dpmsolver++) conversion
        if tables["prediction_type"] == "epsilon":
            m0 = (x - s_c * eps) / a_c
        elif tables["prediction_type"] == "v_prediction":
            m0 = a_c * x - s_c * eps
        else:
            m0 = eps

        emh = jnp.expm1(-h)
        # first-order (DPM-Solver++ 1S == DDIM in lambda space)
        x1 = (s_p / s_c) * x - a_p * emh * m0
        # second-order multistep, midpoint rule
        r = h0 / jnp.where(jnp.abs(h) < 1e-20, 1.0, h)
        d1 = (m0 - state["m1"]) / jnp.where(jnp.abs(r) < 1e-20, 1.0, r)
        x2 = (s_p / s_c) * x - a_p * emh * m0 - 0.5 * a_p * emh * d1

        prev = jnp.where(tables["first_order"][i], x1, x2)
        return {"m1": m0}, prev.astype(sample.dtype)
