"""Guidance-rescale CFG and zero-terminal-SNR beta rescale (Lin et al. 2024).

The reference exposes neither (plain CFG only,
``stable_diffusion_pipeline.py:421-423``); both are required to run SD2.1-v
style checkpoints fine-tuned with zero-SNR v-prediction correctly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_videos_tpu.core.schedulers.base import (
    SchedulerConfig, alphas_cumprod_for, rescale_zero_terminal_snr)
from stable_diffusion_videos_tpu.runtime.engine import apply_guidance


# ---------------------------------------------------------------------------
# zero-terminal-SNR
# ---------------------------------------------------------------------------

def test_zero_snr_terminal_alpha():
    cfg = SchedulerConfig(rescale_betas_zero_snr=True)
    acp = alphas_cumprod_for(cfg)
    # terminal SNR acp/(1-acp) ~ 0 (clamped to 2^-24 so sigmas stay finite)
    assert acp[-1] == pytest.approx(2.0 ** -24)
    # still a valid cumulative-product curve: in (0,1], strictly decreasing
    assert acp[0] > 0.99
    assert np.all(np.diff(acp) < 0)
    assert np.all(acp > 0)


def test_zero_snr_preserves_first_step():
    """The sqrt-space linear map keeps sqrt(acp[0]) exactly (paper §4)."""
    base = alphas_cumprod_for(SchedulerConfig())
    fixed = rescale_zero_terminal_snr(base)
    assert np.sqrt(fixed[0]) == pytest.approx(np.sqrt(base[0]), abs=1e-12)


def test_zero_snr_off_by_default():
    a = alphas_cumprod_for(SchedulerConfig())
    b = alphas_cumprod_for(SchedulerConfig(rescale_betas_zero_snr=False))
    np.testing.assert_array_equal(a, b)
    assert a[-1] > 1e-3  # the SD schedule's terminal alpha is ~0.0047


def test_zero_snr_sigma_space_finite():
    """Sigma-space samplers (euler/lms) must survive the zero-SNR table:
    sigma = sqrt((1-a)/a) at the clamped terminal is large but finite."""
    from stable_diffusion_videos_tpu.core.schedulers import get_scheduler
    cfg = SchedulerConfig(rescale_betas_zero_snr=True,
                          timestep_spacing="trailing",
                          prediction_type="v_prediction")
    for name in ("euler", "euler_ancestral", "lms"):
        tables = get_scheduler(name).make_tables(cfg, 8)
        sig = np.asarray(tables["sigmas"])
        assert np.all(np.isfinite(sig)), name
        assert sig.max() < 1e6, name


def test_zero_snr_ddim_denoises():
    """One full tiny denoise under the zero-SNR trailing v-pred config."""
    from stable_diffusion_videos_tpu.core.schedulers import get_scheduler
    import jax
    cfg = SchedulerConfig(rescale_betas_zero_snr=True,
                          timestep_spacing="trailing",
                          prediction_type="v_prediction")
    sched = get_scheduler("ddim")
    tables = sched.make_tables(cfg, 6)
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    lat = lat * sched.init_noise_sigma(tables)
    st = sched.init_state(tables, lat.shape)
    for i in range(sched.num_loop_steps(tables)):
        x = sched.scale_model_input(tables, st, i, lat)
        st, lat = sched.step(tables, st, i, 0.1 * x, lat)
    assert np.all(np.isfinite(np.asarray(lat)))


# ---------------------------------------------------------------------------
# guidance rescale
# ---------------------------------------------------------------------------

def test_apply_guidance_plain_matches_reference_formula():
    rng = np.random.default_rng(0)
    eps_u = jnp.asarray(rng.normal(size=(3, 8, 8, 4)), jnp.float32)
    eps_c = jnp.asarray(rng.normal(size=(3, 8, 8, 4)), jnp.float32)
    got = apply_guidance(eps_u, eps_c, 7.5, rescale=0.0)
    want = eps_u + 7.5 * (eps_c - eps_u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_apply_guidance_full_rescale_restores_cond_std():
    """rescale=1: the combined prediction's per-sample std equals the
    conditional branch's (the paper's variance correction)."""
    rng = np.random.default_rng(1)
    eps_u = jnp.asarray(rng.normal(size=(4, 8, 8, 4)), jnp.float32)
    eps_c = jnp.asarray(2.5 * rng.normal(size=(4, 8, 8, 4)), jnp.float32)
    out = np.asarray(apply_guidance(eps_u, eps_c, 9.0, rescale=1.0))
    std_out = out.reshape(4, -1).std(axis=1)
    std_c = np.asarray(eps_c).reshape(4, -1).std(axis=1)
    np.testing.assert_allclose(std_out, std_c, rtol=1e-3)


def test_apply_guidance_partial_blend():
    rng = np.random.default_rng(2)
    eps_u = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)
    eps_c = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)
    plain = np.asarray(apply_guidance(eps_u, eps_c, 7.5, rescale=0.0))
    full = np.asarray(apply_guidance(eps_u, eps_c, 7.5, rescale=1.0))
    half = np.asarray(apply_guidance(eps_u, eps_c, 7.5, rescale=0.5))
    np.testing.assert_allclose(half, 0.5 * full + 0.5 * plain, rtol=1e-5)


def test_engine_guidance_rescale_changes_output():
    """The engine bakes the rescale into the fused program; outputs differ
    from plain CFG but stay finite/valid frames."""
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    models = SDModels.tiny()
    cond = jnp.ones((1, 77, models.text_config.hidden_size), jnp.float32)
    uncond = jnp.zeros_like(cond)
    import jax
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    kw = dict(num_inference_steps=4, guidance_scale=7.5)
    plain = Engine(models, scheduler="ddim").denoise_frames(
        cond, uncond, noise, **kw)
    rescaled = Engine(models, scheduler="ddim",
                      guidance_rescale=0.7).denoise_frames(
        cond, uncond, noise, **kw)
    assert plain.shape == rescaled.shape
    assert np.all(np.isfinite(rescaled))
    assert not np.allclose(plain, rescaled)


def test_engine_guidance_rescale_validation():
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    with pytest.raises(ValueError):
        Engine(SDModels.tiny(), guidance_rescale=1.5)
