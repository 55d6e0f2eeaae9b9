"""LCM sampler (Luo et al. 2023, "Latent Consistency Models") — 2-8 step
inference for consistency-distilled checkpoints (incl. LCM-LoRA adapters
merged via ``models/lora_file.py``).

Beyond the reference's six samplers.  The consistency parameterisation maps
the model output to a denoised estimate through the boundary-condition
coefficients ``c_skip``/``c_out`` (distillation's sigma_data=0.5,
timestep_scaling=10), then re-noises to the next timestep with FRESH noise —
unlike ancestral samplers the noise is not a perturbation of a deterministic
path but the whole transition.  Run with ``guidance_scale=1.0`` (the
distillation bakes CFG in; higher scales over-sharpen).

All coefficients are host-precomputed tables; the device step is pure and
scan-compatible (``base.py`` design).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import (Scheduler, SchedulerConfig, alphas_cumprod_for,
                   check_num_steps, pred_original_sample, register,
                   transition_noise)


def lcm_timesteps(cfg: SchedulerConfig, num_inference_steps: int,
                  original_inference_steps: int = 50) -> np.ndarray:
    """The distillation's skipping-step schedule: the model was trained on
    ``original_inference_steps`` evenly-strided timesteps, inference picks
    every ``len // num_inference_steps``-th of them (descending)."""
    check_num_steps(cfg, num_inference_steps)
    k = cfg.num_train_timesteps // original_inference_steps
    if num_inference_steps > original_inference_steps:
        raise ValueError(
            f"num_inference_steps={num_inference_steps} exceeds the "
            f"distillation's original_inference_steps="
            f"{original_inference_steps}")
    origin = np.arange(1, original_inference_steps + 1, dtype=np.int64) * k - 1
    origin = origin[::-1]  # descending
    skip = len(origin) // num_inference_steps
    return origin[::skip][:num_inference_steps].copy()


@register
class LCM(Scheduler):
    name = "lcm"
    stochastic = True  # fresh transition noise at every step but the last

    #: consistency-distillation constants (published defaults)
    sigma_data = 0.5
    timestep_scaling = 10.0

    def make_tables(self, cfg: SchedulerConfig, num_inference_steps: int,
                    original_inference_steps: int = 50):
        acp = alphas_cumprod_for(cfg)
        ts = lcm_timesteps(cfg, num_inference_steps,
                           original_inference_steps)
        a_t = acp[ts]
        # boundary conditions c_skip/c_out at the scaled timestep
        st = self.timestep_scaling * ts.astype(np.float64)
        c_skip = self.sigma_data ** 2 / (st ** 2 + self.sigma_data ** 2)
        c_out = st / np.sqrt(st ** 2 + self.sigma_data ** 2)
        # transition target: the NEXT loop timestep (last step: pure
        # denoised output -> alpha_prev=1, noise coefficient 0)
        a_prev = np.concatenate([acp[ts[1:]], [1.0]])
        noise_coeff = np.sqrt(1.0 - a_prev)
        noise_coeff[-1] = 0.0
        return {
            "timesteps": jnp.asarray(ts, jnp.int32),
            "alphas_cumprod": jnp.asarray(acp, jnp.float32),
            "alpha_prod": jnp.asarray(a_t, jnp.float32),
            "alpha_prod_prev": jnp.asarray(a_prev, jnp.float32),
            "noise_coeff": jnp.asarray(noise_coeff, jnp.float32),
            "c_skip": jnp.asarray(c_skip, jnp.float32),
            "c_out": jnp.asarray(c_out, jnp.float32),
            "init_noise_sigma": jnp.float32(1.0),
            "prediction_type": cfg.prediction_type,
            "clip_sample": cfg.clip_sample,
        }

    def init_state(self, tables, latent_shape, key=None):
        return {"key": key if key is not None else jax.random.PRNGKey(0)}

    def step(self, tables, state, i, model_output, sample):
        a_t = tables["alpha_prod"][i]
        x0 = pred_original_sample(model_output, sample, a_t,
                                  tables["prediction_type"])
        if tables["clip_sample"]:
            x0 = jnp.clip(x0, -1.0, 1.0)
        denoised = tables["c_out"][i] * x0 + tables["c_skip"][i] * sample
        key, sub = jax.random.split(state["key"])
        noise = transition_noise(sub, sample, tables)
        prev = (jnp.sqrt(tables["alpha_prod_prev"][i]) * denoised
                + tables["noise_coeff"][i] * noise)
        return {"key": key}, prev.astype(sample.dtype)
