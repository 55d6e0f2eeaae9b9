"""PNDM / PLMS sampler (pseudo linear multistep, skip_prk_steps=True).

Equivalent of PNDMScheduler — the default SD v1.x sampler used by the
reference pipelines (``stable_diffusion_pipeline.py:18``;
``flax_stable_diffusion_pipeline.py:19``).

The diffusers implementation is a counter-driven state machine (warm-up
special cases at counters 0/1, a duplicated second timestep, an `ets` history
list).  That control flow is hoisted to the host at table-build time:

* the loop runs ``num_inference_steps + 1`` iterations over a timestep array
  whose second entry is duplicated (the PLMS warm-up re-evaluation);
* a ``(L, 5)`` weight table combines ``[eps_new, e0, e1, e2, e3]`` into the
  effective model output per index (1 / mean-of-2 / AB2 / AB3 / AB4 rows);
* per-index scalars (sample coeff, denominator coeff, alpha difference) are
  dense arrays;
* two boolean tables drive "append to history" and "substitute the stored
  warm-up sample".

On device the step is: conditional ring-buffer shift, a 5-term weighted sum,
and an axpy — branch-free and ``lax.scan``-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import (Scheduler, SchedulerConfig, alphas_cumprod_for, register)


@register
class PNDM(Scheduler):
    name = "pndm"
    stochastic = False

    def make_tables(self, cfg: SchedulerConfig, num_inference_steps: int,
                    start_index: int = 0):
        if not cfg.skip_prk_steps:
            raise NotImplementedError(
                "Only skip_prk_steps=True (PLMS, the SD checkpoint config) is "
                "supported; the Runge-Kutta warm-up variant is not used by "
                "any SD checkpoint.")
        from .base import check_num_steps
        check_num_steps(cfg, num_inference_steps)
        acp = alphas_cumprod_for(cfg)
        final_alpha = 1.0 if cfg.set_alpha_to_one else acp[0]
        ratio = cfg.num_train_timesteps // num_inference_steps
        base = (np.arange(0, num_inference_steps) * ratio).round().astype(np.int64) \
            + cfg.steps_offset  # ascending
        if start_index:
            # mid-schedule entry (img2img): drop the `start_index` highest
            # timesteps and REPLAY the PLMS warm-up at the truncated head —
            # the multistep history is only valid when built from steps that
            # actually ran, so entry at k0 restarts the order ramp (this is
            # what diffusers' counter state machine does on a sliced
            # schedule).  All derived tables below follow automatically.
            base = base[:num_inference_steps - start_index]
        # descending with second entry duplicated (PLMS warm-up)
        ts = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1].copy()
        L = len(ts)  # num_inference_steps + 1

        # effective (timestep, prev_timestep) pairs per loop index
        t_used = ts.copy()
        t_prev = ts - ratio
        if L >= 2:
            t_used[1] = ts[1] + ratio
            t_prev[1] = ts[1]

        a_t = acp[t_used]
        a_prev = np.where(t_prev >= 0, acp[np.maximum(t_prev, 0)], final_alpha)
        b_t = 1.0 - a_t
        b_prev = 1.0 - a_prev
        sample_coeff = np.sqrt(a_prev / a_t)
        denom_coeff = a_t * np.sqrt(b_prev) + np.sqrt(a_t * b_t * a_prev)
        alpha_diff = a_prev - a_t

        # model-output combination weights over [eps, e0, e1, e2, e3]
        W = np.zeros((L, 5), dtype=np.float64)
        for i in range(L):
            if i == 0:
                W[i] = [1, 0, 0, 0, 0]
            elif i == 1:
                W[i] = [0.5, 0.5, 0, 0, 0]
            elif i == 2:
                W[i] = [0, 3 / 2, -1 / 2, 0, 0]
            elif i == 3:
                W[i] = [0, 23 / 12, -16 / 12, 5 / 12, 0]
            else:
                W[i] = [0, 55 / 24, -59 / 24, 37 / 24, -9 / 24]

        append = np.ones(L, dtype=bool)
        if L >= 2:
            append[1] = False
        use_stored = np.zeros(L, dtype=bool)
        if L >= 2:
            use_stored[1] = True

        return {
            "timesteps": jnp.asarray(ts, jnp.int32),
            "alphas_cumprod": jnp.asarray(acp, jnp.float32),
            "sample_coeff": jnp.asarray(sample_coeff, jnp.float32),
            "denom_coeff": jnp.asarray(denom_coeff, jnp.float32),
            "alpha_diff": jnp.asarray(alpha_diff, jnp.float32),
            "weights": jnp.asarray(W, jnp.float32),
            "append": jnp.asarray(append),
            "use_stored": jnp.asarray(use_stored),
            "init_noise_sigma": jnp.float32(1.0),
            "prediction_type": cfg.prediction_type,
        }

    def num_loop_steps(self, tables) -> int:
        return int(tables["timesteps"].shape[0])

    def init_state(self, tables, latent_shape, key=None):
        shape = tuple(latent_shape)
        return {
            "ets": jnp.zeros((4,) + shape, jnp.float32),
            "cur_sample": jnp.zeros(shape, jnp.float32),
        }

    def step(self, tables, state, i, model_output, sample):
        eps = model_output.astype(jnp.float32)
        x = sample.astype(jnp.float32)

        shifted = jnp.roll(state["ets"], 1, axis=0).at[0].set(eps)
        ets = jnp.where(tables["append"][i], shifted, state["ets"])

        w = tables["weights"][i]
        combined = w[0] * eps + jnp.tensordot(w[1:], ets, axes=1)

        # warm-up: index 1 re-steps from the stored index-0 input sample
        cur = jnp.where(tables["use_stored"][i], state["cur_sample"], x)
        new_stored = jnp.where(i == 0, x, state["cur_sample"])

        prev = (tables["sample_coeff"][i] * cur
                - tables["alpha_diff"][i] * combined / tables["denom_coeff"][i])
        return ({"ets": ets, "cur_sample": new_stored},
                prev.astype(sample.dtype))
