"""Cross-validate the table-driven PNDM/PLMS against an independent,
straightforwardly-stateful numpy implementation of the published algorithm
(Liu et al. 2022, pseudo linear multistep with the SD skip-prk variant).

The production sampler hoists the counter-based state machine into dense
per-index tables (core/schedulers/pndm.py); this harness feeds BOTH
implementations the same arbitrary model-output sequence and requires
identical trajectories — catching any error in that hoisting.
"""

import numpy as np
import pytest

from stable_diffusion_videos_tpu.core.schedulers import (SchedulerConfig,
                                                         get_scheduler)
from stable_diffusion_videos_tpu.core.schedulers.base import \
    alphas_cumprod_for


class NumpyPLMS:
    """Direct counter/ets-list transcription of the PLMS update rule."""

    def __init__(self, cfg: SchedulerConfig, num_steps: int):
        self.acp = alphas_cumprod_for(cfg)
        self.final_alpha = self.acp[0]  # set_alpha_to_one=False
        self.ratio = cfg.num_train_timesteps // num_steps
        base = (np.arange(num_steps) * self.ratio).round().astype(int) \
            + cfg.steps_offset
        self.timesteps = np.concatenate(
            [base[:-1], base[-2:-1], base[-1:]])[::-1].copy()
        self.ets = []
        self.counter = 0
        self.cur_sample = None

    def _prev_sample(self, sample, t, t_prev, eps):
        a_t = self.acp[t]
        a_prev = self.acp[t_prev] if t_prev >= 0 else self.final_alpha
        b_t, b_prev = 1 - a_t, 1 - a_prev
        coeff = (a_prev / a_t) ** 0.5
        denom = a_t * b_prev ** 0.5 + (a_t * b_t * a_prev) ** 0.5
        return coeff * sample - (a_prev - a_t) * eps / denom

    def step(self, eps, t, sample):
        t_prev = t - self.ratio
        if self.counter != 1:
            self.ets = self.ets[-3:] + [eps]
        else:
            t_prev = t
            t = t + self.ratio

        if len(self.ets) == 1 and self.counter == 0:
            eps_eff = eps
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            eps_eff = (eps + self.ets[-1]) / 2
            sample = self.cur_sample
            self.cur_sample = None
        elif len(self.ets) == 2:
            eps_eff = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            eps_eff = (23 * self.ets[-1] - 16 * self.ets[-2]
                       + 5 * self.ets[-3]) / 12
        else:
            eps_eff = (55 * self.ets[-1] - 59 * self.ets[-2]
                       + 37 * self.ets[-3] - 9 * self.ets[-4]) / 24
        self.counter += 1
        return self._prev_sample(sample, t, t_prev, eps_eff)


@pytest.mark.parametrize("num_steps", [4, 10, 25])
def test_pndm_matches_reference_transcription(num_steps):
    import jax.numpy as jnp

    cfg = SchedulerConfig()
    sched = get_scheduler("pndm")
    tables = sched.make_tables(cfg, num_steps)
    ref = NumpyPLMS(cfg, num_steps)

    np.testing.assert_array_equal(np.asarray(tables["timesteps"]),
                                  ref.timesteps)

    rng = np.random.default_rng(0)
    shape = (1, 4, 4, 2)
    sample_ours = rng.standard_normal(shape).astype(np.float32)
    sample_ref = sample_ours.copy()
    state = sched.init_state(tables, shape)

    n_loop = sched.num_loop_steps(tables)
    for i in range(n_loop):
        # arbitrary (but shared) model output at each call
        eps = rng.standard_normal(shape).astype(np.float32)
        state, out = sched.step(tables, state, jnp.int32(i),
                                jnp.asarray(eps), jnp.asarray(sample_ours))
        sample_ours = np.asarray(out)
        sample_ref = ref.step(eps.astype(np.float64), int(ref.timesteps[i]),
                              sample_ref.astype(np.float64)).astype(np.float64)
        np.testing.assert_allclose(
            sample_ours, sample_ref, rtol=2e-4, atol=2e-5,
            err_msg=f"diverged at loop index {i}/{n_loop}")
