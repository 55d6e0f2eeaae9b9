"""LMS (linear multistep / Adams-Bashforth over sigma) sampler.

Equivalent of LMSDiscreteScheduler in the reference suite
(``stable_diffusion_pipeline.py:19``).  The scipy polynomial integrals that
make LMS awkward inside a compiled loop are evaluated ONCE on the host into a
dense ``(num_steps, order)`` coefficient matrix; on device each step is a
gather + a 4-term weighted sum over a fixed-shape derivative history buffer —
fully static for ``lax.scan``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy import integrate

from .base import SchedulerConfig, register
from .euler import _EulerBase


def _lms_coeff_matrix(sigmas: np.ndarray, order: int) -> np.ndarray:
    """coeffs[t, k] = integral over [sigma_t, sigma_{t+1}] of the k-th
    Lagrange basis over the last ``min(t+1, order)`` sigmas."""
    n = len(sigmas) - 1
    coeffs = np.zeros((n, order), dtype=np.float64)
    for t in range(n):
        cur_order = min(t + 1, order)
        for k in range(cur_order):
            def poly(tau, k=k, cur_order=cur_order, t=t):
                prod = 1.0
                for j in range(cur_order):
                    if j == k:
                        continue
                    prod *= (tau - sigmas[t - j]) / (sigmas[t - k] - sigmas[t - j])
                return prod
            coeffs[t, k] = integrate.quad(poly, sigmas[t], sigmas[t + 1],
                                          epsrel=1e-4)[0]
    return coeffs


@register
class LMS(_EulerBase):
    name = "lms"
    stochastic = False

    def make_tables(self, cfg: SchedulerConfig, num_inference_steps: int,
                    start_index: int = 0):
        # start_index > 0 (img2img mid-schedule entry) truncates the sigma
        # grid; cur_order = min(t+1, order) below then replays the
        # Adams-Bashforth warm-up at the truncated head — the history
        # buffer is empty at entry, so low-order steps are the only valid
        # choice there
        tables = _EulerBase.make_tables(self, cfg, num_inference_steps,
                                        start_index=start_index)
        sigmas = np.asarray(tables["sigmas"], dtype=np.float64)
        tables["lms_coeffs"] = jnp.asarray(
            _lms_coeff_matrix(sigmas, cfg.lms_order), jnp.float32)
        tables["lms_order"] = cfg.lms_order
        return tables

    def init_state(self, tables, latent_shape, key=None):
        order = tables["lms_order"]
        return {"derivatives": jnp.zeros((order,) + tuple(latent_shape),
                                         jnp.float32)}

    def step(self, tables, state, i, model_output, sample):
        sigma = tables["sigmas"][i]
        x0 = self._pred_x0(tables, sigma, model_output, sample)
        derivative = ((sample - x0) / sigma).astype(jnp.float32)

        # shift history: derivatives[k] == derivative at step i-k
        derivs = jnp.roll(state["derivatives"], 1, axis=0)
        derivs = derivs.at[0].set(derivative)

        coeffs = tables["lms_coeffs"][i]  # (order,) — zero beyond cur_order
        update = jnp.tensordot(coeffs, derivs, axes=1)
        prev = sample.astype(jnp.float32) + update
        return {"derivatives": derivs}, prev.astype(sample.dtype)
