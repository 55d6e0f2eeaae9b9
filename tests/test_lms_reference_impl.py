"""Cross-validate table-driven LMS against an independent stateful numpy
transcription (Adams-Bashforth over sigma with on-the-fly scipy integrals)."""

import numpy as np
import pytest
from scipy import integrate

from stable_diffusion_videos_tpu.core.schedulers import (SchedulerConfig,
                                                         get_scheduler)
from stable_diffusion_videos_tpu.core.schedulers.base import (
    alphas_cumprod_for, spaced_timesteps)


class NumpyLMS:
    def __init__(self, cfg: SchedulerConfig, num_steps: int, order: int = 4):
        acp = alphas_cumprod_for(cfg)
        strain = np.sqrt((1 - acp) / acp)
        ts = spaced_timesteps(cfg, num_steps).astype(np.float64)
        sig = np.interp(ts, np.arange(len(strain)), strain)
        self.sigmas = np.concatenate([sig, [0.0]])
        self.order = order
        self.derivatives = []
        self.i = 0

    def _coeff(self, t, cur_order, k):
        def poly(tau):
            prod = 1.0
            for j in range(cur_order):
                if j == k:
                    continue
                prod *= (tau - self.sigmas[t - j]) / (
                    self.sigmas[t - k] - self.sigmas[t - j])
            return prod
        return integrate.quad(poly, self.sigmas[t], self.sigmas[t + 1],
                              epsrel=1e-4)[0]

    def step(self, eps, sample):
        i = self.i
        sigma = self.sigmas[i]
        x0 = sample - sigma * eps
        d = (sample - x0) / sigma
        self.derivatives.append(d)
        if len(self.derivatives) > self.order:
            self.derivatives.pop(0)
        cur_order = min(i + 1, self.order)
        coeffs = [self._coeff(i, cur_order, k) for k in range(cur_order)]
        out = sample + sum(c * d for c, d in
                           zip(coeffs, reversed(self.derivatives)))
        self.i += 1
        return out


@pytest.mark.parametrize("num_steps", [3, 8, 15])
def test_lms_matches_reference_transcription(num_steps):
    import jax.numpy as jnp

    cfg = SchedulerConfig()
    sched = get_scheduler("lms")
    tables = sched.make_tables(cfg, num_steps)
    ref = NumpyLMS(cfg, num_steps)

    rng = np.random.default_rng(2)
    shape = (1, 4, 4, 2)
    ours = rng.standard_normal(shape).astype(np.float32)
    theirs = ours.astype(np.float64)
    state = sched.init_state(tables, shape)
    for i in range(num_steps):
        eps = rng.standard_normal(shape).astype(np.float32)
        state, out = sched.step(tables, state, jnp.int32(i),
                                jnp.asarray(eps), jnp.asarray(ours))
        ours = np.asarray(out)
        theirs = ref.step(eps.astype(np.float64), theirs)
        np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-5,
                                   err_msg=f"diverged at step {i}")
