"""Cross-validate the table-driven LCM sampler against an independent
stateful numpy transcription of the published consistency-model inference
(Luo et al. 2023 §4: boundary-scaled denoise + fresh-noise transition over
the distillation's skipping-step schedule).

The transcription recomputes c_skip/c_out per step from the paper's
formulas and draws its transition noise through the same jax PRNG sequence
the scan consumes — agreement checks the host precomputation and the scan
step, not a shared implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_videos_tpu.core.schedulers import (SchedulerConfig,
                                                         get_scheduler)
from stable_diffusion_videos_tpu.core.schedulers.base import (
    alphas_cumprod_for, pred_original_sample)
from stable_diffusion_videos_tpu.core.schedulers.lcm import lcm_timesteps


class NumpyLCM:
    """Stateful LCM inference, diffusers-equivalent flow."""

    sigma_data = 0.5
    timestep_scaling = 10.0

    def __init__(self, cfg, num_steps, original_steps=50):
        self.acp = alphas_cumprod_for(cfg)
        k = cfg.num_train_timesteps // original_steps
        origin = (np.arange(1, original_steps + 1, dtype=np.int64) * k
                  - 1)[::-1]
        skip = len(origin) // num_steps
        self.ts = origin[::skip][:num_steps].copy()
        self.pred = cfg.prediction_type
        self.i = 0

    def scalings(self, t):
        st = self.timestep_scaling * t
        c_skip = self.sigma_data ** 2 / (st ** 2 + self.sigma_data ** 2)
        c_out = st / np.sqrt(st ** 2 + self.sigma_data ** 2)
        return c_skip, c_out

    def step(self, eps, sample, noise):
        t = self.ts[self.i]
        a_t = self.acp[t]
        if self.pred == "epsilon":
            x0 = (sample - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
        else:
            x0 = np.sqrt(a_t) * sample - np.sqrt(1 - a_t) * eps
        c_skip, c_out = self.scalings(t)
        denoised = c_out * x0 + c_skip * sample
        self.i += 1
        if self.i >= len(self.ts):
            return denoised
        t_prev = self.ts[self.i]
        a_prev = self.acp[t_prev]
        return np.sqrt(a_prev) * denoised + np.sqrt(1 - a_prev) * noise


def fake_model(x, t):
    """Deterministic pseudo-eps the two implementations share."""
    return np.tanh(x) * 0.7 + np.cos(x * 0.3 + float(t) / 999.0) * 0.3


@pytest.mark.parametrize("num_steps", [1, 2, 4, 8])
@pytest.mark.parametrize("pred", ["epsilon", "v_prediction"])
def test_lcm_matches_transcription(num_steps, pred):
    cfg = SchedulerConfig(prediction_type=pred)
    sched = get_scheduler("lcm")
    tables = sched.make_tables(cfg, num_steps)
    ref = NumpyLCM(cfg, num_steps)
    np.testing.assert_array_equal(np.asarray(tables["timesteps"]), ref.ts)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    x_ref = x.copy()
    state = sched.init_state(tables, x.shape, key=jax.random.PRNGKey(7))

    # replay the scan's PRNG stream for the transcription
    key = jax.random.PRNGKey(7)
    for i in range(num_steps):
        t = int(np.asarray(tables["timesteps"])[i])
        eps = fake_model(x, t)
        state, x_jax = sched.step(tables, state, jnp.int32(i),
                                  jnp.asarray(eps), jnp.asarray(x))
        x = np.asarray(x_jax)

        key, sub = jax.random.split(key)
        noise = np.asarray(jax.random.normal(sub, x_ref.shape,
                                             dtype=jnp.float32))
        x_ref = ref.step(fake_model(x_ref, t), x_ref, noise)
        np.testing.assert_allclose(x, x_ref, atol=1e-5, rtol=1e-5)


def test_lcm_last_step_is_pure_denoise():
    """The final transition adds no noise (noise_coeff[-1] == 0) and the
    denoised estimate uses the boundary scalings."""
    cfg = SchedulerConfig()
    sched = get_scheduler("lcm")
    tables = sched.make_tables(cfg, 4)
    assert float(tables["noise_coeff"][-1]) == 0.0
    assert float(tables["alpha_prod_prev"][-1]) == 1.0
    # c_skip + c_out -> boundary condition: at t=0 c_skip ~ 1, c_out ~ 0
    st = 10.0 * np.asarray(tables["timesteps"], np.float64)
    np.testing.assert_allclose(
        np.asarray(tables["c_skip"]),
        0.25 / (st ** 2 + 0.25), rtol=1e-6)


def test_lcm_timestep_schedule_shape():
    cfg = SchedulerConfig()
    ts = lcm_timesteps(cfg, 4)
    assert ts.tolist() == [999, 759, 519, 279]  # 50-step distillation grid
    with pytest.raises(ValueError, match="original_inference_steps"):
        lcm_timesteps(cfg, 51)


def test_lcm_engine_dispatch():
    """4-step LCM walk dispatch through the fused engine program."""
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    eng = Engine(SDModels.tiny(), scheduler="lcm")
    cond = eng.embed_text(["a", "b"])
    noise = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    out = eng.denoise_frames(cond, eng.embed_text(""), noise,
                             num_inference_steps=4, guidance_scale=1.0)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(out).all()
    # deterministic given the same key
    out2 = eng.denoise_frames(cond, eng.embed_text(""), noise,
                              num_inference_steps=4, guidance_scale=1.0)
    np.testing.assert_array_equal(out, out2)


def test_lcm_img2img_and_inpaint():
    """LCM's tables are index-aligned, so mid-schedule entry (img2img) and
    per-index noise levels (inpaint) are valid."""
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    eng = Engine(SDModels.tiny(), scheduler="lcm")
    cond = eng.embed_text("a")
    init = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4)) * 0.1
    out = eng.img2img(cond, cond, init, strength=0.5,
                      num_inference_steps=4, guidance_scale=1.0)
    assert out.shape == (1, 16, 16, 3) and np.isfinite(out).all()
    mask = jnp.ones((1, 8, 8, 1))
    out2 = eng.inpaint(cond, cond, init, mask, num_inference_steps=4,
                       guidance_scale=1.0)
    assert out2.shape == (1, 16, 16, 3) and np.isfinite(out2).all()
