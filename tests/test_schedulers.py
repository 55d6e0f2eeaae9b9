"""Sampler correctness: with an oracle model that returns the *exact* noise
for a known clean image, every sampler must recover that image.

This is a much stronger test than the reference ships (it has zero scheduler
tests — SURVEY.md §4): it exercises warm-up state machines (PNDM), multistep
history (LMS/DPM), and sigma-space scaling (Euler/LMS) end to end through a
``lax.scan``, exactly as the runtime engine drives them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_videos_tpu.core.schedulers import (
    SCHEDULER_NAMES, SchedulerConfig, get_scheduler)

SHAPE = (2, 8, 8, 4)  # batch of 2 tiny "latents", NHWC


def _oracle_eps(tables, name, timestep, sample, x0):
    """Exact model output given the scheduler's sample parameterisation."""
    if name in ("euler", "euler_ancestral", "lms"):
        # sigma-space: sample = x0 + sigma * eps
        sigmas_train = jnp.sqrt((1 - tables["alphas_cumprod"])
                                / tables["alphas_cumprod"])
        sigma = jnp.interp(timestep.astype(jnp.float32),
                           jnp.arange(sigmas_train.shape[0], dtype=jnp.float32),
                           sigmas_train)
        return (sample - x0) / sigma
    acp = tables["alphas_cumprod"][timestep.astype(jnp.int32)]
    return (sample - jnp.sqrt(acp) * x0) / jnp.sqrt(1 - acp)


def _run_sampler(name, num_steps=20, seed=0):
    sched = get_scheduler(name)
    cfg = SchedulerConfig()
    tables = sched.make_tables(cfg, num_steps)

    key = jax.random.PRNGKey(seed)
    k_noise, k_x0, k_state = jax.random.split(key, 3)
    x0 = jax.random.uniform(k_x0, SHAPE, jnp.float32, -1.0, 1.0)
    noise = jax.random.normal(k_noise, SHAPE, jnp.float32)

    latents = noise * sched.init_noise_sigma(tables)
    state = sched.init_state(tables, SHAPE, key=k_state)
    n_loop = sched.num_loop_steps(tables)

    def body(carry, i):
        lat, st = carry
        t = sched.timestep(tables, i)
        model_in = sched.scale_model_input(tables, st, i, lat)
        eps = _oracle_eps(tables, name, t, lat, x0)
        del model_in  # oracle works on the unscaled sample directly
        st, lat = sched.step(tables, st, i, eps, lat)
        return (lat, st), None

    (final, _), _ = jax.lax.scan(body, (latents, state), jnp.arange(n_loop))
    return np.asarray(final), np.asarray(x0)


@pytest.mark.parametrize("name", SCHEDULER_NAMES)
def test_sampler_recovers_clean_image(name):
    final, x0 = _run_sampler(name)
    err = np.abs(final - x0).max()
    # sigma-space samplers terminate at sigma=0 (exact); alpha-space ones
    # terminate at t=1 where sqrt(1-acp[1]) ~ 0.04 of noise remains by
    # construction; ancestral adds fresh noise each step.
    tol = {"euler": 0.02, "lms": 0.02, "euler_ancestral": 0.3}.get(name, 0.2)
    assert err < tol, f"{name}: max err {err}"


@pytest.mark.parametrize("name", SCHEDULER_NAMES)
def test_sampler_is_jittable_and_deterministic(name):
    a, _ = _run_sampler(name, num_steps=8, seed=1)
    b, _ = _run_sampler(name, num_steps=8, seed=1)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("name", SCHEDULER_NAMES)
def test_tables_are_finite(name):
    sched = get_scheduler(name)
    tables = sched.make_tables(SchedulerConfig(), 50)
    for k, v in tables.items():
        if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating):
            assert np.isfinite(np.asarray(v)).all(), f"{name}.{k} has non-finite"


def test_timesteps_match_sd_leading_spacing():
    # SD v1.x 'leading' spacing with steps_offset=1: 50 steps ->
    # [981, 961, ..., 1]
    tables = get_scheduler("ddim").make_tables(SchedulerConfig(), 50)
    ts = np.asarray(tables["timesteps"])
    assert ts[0] == 981 and ts[-1] == 1 and len(ts) == 50
    assert np.all(np.diff(ts) == -20)


def test_pndm_has_duplicated_warmup_timestep():
    tables = get_scheduler("pndm").make_tables(SchedulerConfig(), 10)
    ts = np.asarray(tables["timesteps"])
    assert len(ts) == 11  # steps + 1 (PLMS warm-up re-evaluation)
    assert ts[1] == ts[2]


def test_add_noise_roundtrip():
    sched = get_scheduler("ddim")
    tables = sched.make_tables(SchedulerConfig(), 10)
    x0 = jnp.ones(SHAPE)
    noise = jnp.zeros(SHAPE)
    noisy = sched.add_noise(tables, x0, noise, jnp.int32(0))
    acp0 = float(tables["alphas_cumprod"][0])
    np.testing.assert_allclose(np.asarray(noisy), np.sqrt(acp0), rtol=1e-5)


@pytest.mark.parametrize("name", SCHEDULER_NAMES)
@pytest.mark.parametrize("steps", [1, 2, 10])
def test_tables_edge_step_counts(name, steps):
    """Degenerate step counts must not crash or produce non-finite tables."""
    sched = get_scheduler(name)
    tables = sched.make_tables(SchedulerConfig(), steps)
    assert sched.num_loop_steps(tables) >= steps
    for k, v in tables.items():
        if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating):
            assert np.isfinite(np.asarray(v)).all(), f"{name}[{steps}].{k}"


def test_karras_sigmas_euler():
    cfg = SchedulerConfig(use_karras_sigmas=True)
    tables = get_scheduler("euler").make_tables(cfg, 20)
    sig = np.asarray(tables["sigmas"])
    assert np.all(np.diff(sig) < 1e-9)  # strictly decreasing to 0
    assert sig[-1] == 0.0
    # oracle convergence still holds on the karras grid
    sched = get_scheduler("euler")
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, SHAPE, jnp.float32, -1, 1)
    noise = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    lat = noise * sched.init_noise_sigma(tables)
    st = sched.init_state(tables, SHAPE)

    def body(c, i):
        lat, st = c
        sigma = tables["sigmas"][i]
        eps = (lat - x0) / sigma
        st, lat = sched.step(tables, st, i, eps, lat)
        return (lat, st), None
    (lat, _), _ = jax.lax.scan(body, (lat, st), jnp.arange(20))
    assert np.abs(np.asarray(lat) - np.asarray(x0)).max() < 0.02
