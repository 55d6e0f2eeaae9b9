"""Cross-validate table-driven DPM-Solver++(2M) against an independent
stateful numpy transcription of the published multistep midpoint update
(Lu et al. 2022), same shared model-output sequence."""

import numpy as np
import pytest

from stable_diffusion_videos_tpu.core.schedulers import (SchedulerConfig,
                                                         get_scheduler)
from stable_diffusion_videos_tpu.core.schedulers.base import \
    alphas_cumprod_for


class NumpyDPMpp2M:
    def __init__(self, cfg: SchedulerConfig, num_steps: int):
        acp = alphas_cumprod_for(cfg)
        self.alpha = np.sqrt(acp)
        self.sigma = np.sqrt(1 - acp)
        self.lam = np.log(self.alpha) - np.log(self.sigma)
        ratio = cfg.num_train_timesteps // (num_steps + 1)
        ts = ((np.arange(num_steps + 1) * ratio).round()[::-1][:-1]
              .astype(int)) + cfg.steps_offset
        self.timesteps = ts
        self.num_steps = num_steps
        self.lower_order_final = num_steps < 15
        self.m1 = None
        self.step_idx = 0

    def step(self, eps, sample):
        i = self.step_idx
        ts = self.timesteps
        t = ts[i]
        t_prev = ts[i + 1] if i + 1 < len(ts) else 0
        a_t, s_t = self.alpha[t], self.sigma[t]
        a_p, s_p = self.alpha[t_prev], self.sigma[t_prev]
        lam_t, lam_p = self.lam[t], self.lam[t_prev]
        x0 = (sample - s_t * eps) / a_t
        h = lam_p - lam_t
        use_first = (i == 0) or (self.lower_order_final
                                 and i == self.num_steps - 1)
        if use_first:
            out = (s_p / s_t) * sample - a_p * np.expm1(-h) * x0
        else:
            t_last = ts[i - 1]
            h0 = lam_t - self.lam[t_last]
            r = h0 / h
            d1 = (x0 - self.m1) / r
            out = ((s_p / s_t) * sample - a_p * np.expm1(-h) * x0
                   - 0.5 * a_p * np.expm1(-h) * d1)
        self.m1 = x0
        self.step_idx += 1
        return out


@pytest.mark.parametrize("num_steps", [5, 12, 30])
def test_dpm_matches_reference_transcription(num_steps):
    import jax.numpy as jnp

    cfg = SchedulerConfig()
    sched = get_scheduler("dpm")
    tables = sched.make_tables(cfg, num_steps)
    ref = NumpyDPMpp2M(cfg, num_steps)

    np.testing.assert_array_equal(np.asarray(tables["timesteps"]),
                                  ref.timesteps)

    rng = np.random.default_rng(1)
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
