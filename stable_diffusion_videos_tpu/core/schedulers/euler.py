"""Euler and Euler-Ancestral discrete samplers (Karras et al. 2022 family).

Equivalents of EulerDiscreteScheduler / EulerAncestralDiscreteScheduler from
the reference's sampler suite (``stable_diffusion_pipeline.py:20-21``).
Sigma tables are host-precomputed; the step is a pure gather + axpy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import (Scheduler, SchedulerConfig, alphas_cumprod_for,
                   register, spaced_timesteps,
                   transition_noise)


def _sigma_tables(cfg: SchedulerConfig, num_inference_steps: int):
    acp = alphas_cumprod_for(cfg)
    sigmas_train = np.sqrt((1.0 - acp) / acp)
    ts = spaced_timesteps(cfg, num_inference_steps).astype(np.float64)
    sigmas = np.interp(ts, np.arange(len(sigmas_train)), sigmas_train)
    if cfg.use_karras_sigmas:
        # Karras et al. 2022 rho-7 noise schedule over [sigma_min, sigma_max]
        rho = 7.0
        s_min, s_max = sigmas[-1], sigmas[0]
        ramp = np.linspace(0, 1, num_inference_steps)
        sigmas = (s_max ** (1 / rho)
                  + ramp * (s_min ** (1 / rho) - s_max ** (1 / rho))) ** rho
        # timesteps fed to the unet follow the resampled sigmas
        log_s = np.log(np.maximum(sigmas_train, 1e-20))
        ts = np.interp(np.log(sigmas), log_s, np.arange(len(sigmas_train)))
    sigmas = np.concatenate([sigmas, [0.0]])  # terminal sigma
    return ts, sigmas


class _EulerBase(Scheduler):
    def make_tables(self, cfg: SchedulerConfig, num_inference_steps: int,
                    start_index: int = 0):
        ts, sigmas = _sigma_tables(cfg, num_inference_steps)
        if start_index:
            # mid-schedule entry (img2img): truncate the sigma grid; LMS
            # rebuilds its Lagrange warm-up over the truncated grid
            ts, sigmas = ts[start_index:], sigmas[start_index:]
        return {
            "timesteps": jnp.asarray(ts, jnp.float32),
            "alphas_cumprod": jnp.asarray(alphas_cumprod_for(cfg), jnp.float32),
            "sigmas": jnp.asarray(sigmas, jnp.float32),
            "init_noise_sigma": jnp.float32(float(np.max(sigmas))),
            "prediction_type": cfg.prediction_type,
        }

    def scale_model_input(self, tables, state, i, sample):
        sigma = tables["sigmas"][i]
        return (sample / jnp.sqrt(sigma ** 2 + 1.0)).astype(sample.dtype)

    def _pred_x0(self, tables, sigma, model_output, sample):
        pt = tables["prediction_type"]
        if pt == "epsilon":
            return sample - sigma * model_output
        if pt == "v_prediction":
            return (model_output * (-sigma / jnp.sqrt(sigma ** 2 + 1))
                    + sample / (sigma ** 2 + 1))
        raise ValueError(pt)


@register
class Euler(_EulerBase):
    name = "euler"
    stochastic = False

    def step(self, tables, state, i, model_output, sample):
        sigma = tables["sigmas"][i]
        sigma_next = tables["sigmas"][i + 1]
        x0 = self._pred_x0(tables, sigma, model_output, sample)
        derivative = (sample - x0) / sigma
        prev = sample + derivative * (sigma_next - sigma)
        return state, prev.astype(sample.dtype)


@register
class EulerAncestral(_EulerBase):
    """NOTE: the per-step ancestral noise draws from one PRNG key per
    dispatch, so frames are reproducible for a fixed (seed, batch layout)
    but not invariant to re-batching — use a deterministic sampler when
    exact batch-size invariance matters."""
    name = "euler_ancestral"
    stochastic = True

    def make_tables(self, cfg: SchedulerConfig, num_inference_steps: int):
        t = super().make_tables(cfg, num_inference_steps)
        s_from = np.asarray(t["sigmas"])[:-1]
        s_to = np.asarray(t["sigmas"])[1:]
        var = np.maximum(s_to ** 2 * (s_from ** 2 - s_to ** 2) / np.maximum(s_from ** 2, 1e-20), 0.0)
        sigma_up = np.sqrt(var)
        sigma_down = np.sqrt(np.maximum(s_to ** 2 - sigma_up ** 2, 0.0))
        t["sigma_up"] = jnp.asarray(sigma_up, jnp.float32)
        t["sigma_down"] = jnp.asarray(sigma_down, jnp.float32)
        return t

    def init_state(self, tables, latent_shape, key=None):
        return {"key": key if key is not None else jax.random.PRNGKey(0)}

    def step(self, tables, state, i, model_output, sample):
        sigma = tables["sigmas"][i]
        x0 = self._pred_x0(tables, sigma, model_output, sample)
        derivative = (sample - x0) / sigma
        prev = sample + derivative * (tables["sigma_down"][i] - sigma)
        key, sub = jax.random.split(state["key"])
        noise = transition_noise(sub, sample, tables)
        prev = prev + noise * tables["sigma_up"][i]
        return {"key": key}, prev.astype(sample.dtype)
