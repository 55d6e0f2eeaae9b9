"""LCM consistency distillation (training/lcm_distill.py).

The framework MAKES few-step checkpoints rather than only loading them:
a trained epsilon teacher distills into a student the ``lcm`` sampler
runs in 2-8 cond-only steps.  Unit layer here; the committed distilled
bundle (tools/distill_lcm.py) gets the same identification gate as the
teacher bundle (test_trained_gates.py).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

LCM_BUNDLE = os.path.join(os.path.dirname(__file__), "goldens",
                          "structured_lcm_bundle")


def test_boundary_matches_sampler_tables():
    """Training-side c_skip/c_out == the inference sampler's table values
    at the same timesteps (drift here would silently break sampling)."""
    from stable_diffusion_videos_tpu.core.schedulers import (SchedulerConfig,
                                                             get_scheduler)
    from stable_diffusion_videos_tpu.training.lcm_distill import \
        boundary_coefficients
    cfg = SchedulerConfig()
    sched = get_scheduler("lcm")
    tables = sched.make_tables(cfg, 8)
    c_skip, c_out = boundary_coefficients(tables["timesteps"])
    np.testing.assert_allclose(np.asarray(c_skip),
                               np.asarray(tables["c_skip"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c_out),
                               np.asarray(tables["c_out"]), rtol=1e-5)


def test_distill_step_runs_and_exports():
    """A few distillation steps on the tiny bundle: finite losses, the
    student moves away from the teacher, and the export samples through
    the engine's cond-only lcm program."""
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    from stable_diffusion_videos_tpu.training import (LCMDistillConfig,
                                                      LCMDistiller)
    models = SDModels.tiny(seed=0)
    h = models.unet_config.sample_size
    d_ctx = models.unet_config.cross_attention_dim
    rng = np.random.default_rng(0)
    lat = rng.standard_normal((8, h, h, 4)).astype(np.float32)
    ctx = rng.standard_normal((8, 7, d_ctx)).astype(np.float32)
    uc = rng.standard_normal((1, 7, d_ctx)).astype(np.float32)

    dist = LCMDistiller(models, config=LCMDistillConfig(learning_rate=1e-3))
    teacher_leaf = np.asarray(jax.tree.leaves(dist.teacher_params)[0])
    losses = [dist.step(lat, ctx, uc, key=jax.random.PRNGKey(i))
              for i in range(4)]
    assert all(np.isfinite(losses)), losses
    student_leaf = np.asarray(jax.tree.leaves(dist.params)[0])
    assert not np.allclose(teacher_leaf, student_leaf)

    m = dataclasses.replace(models, params=dist.export_params())
    eng = Engine(m, scheduler="lcm", batch_bucket=8,
                 guidance_interval=(0.0, 0.0))
    frames = eng.denoise_frames(
        jnp.asarray(ctx), jnp.asarray(uc),
        jnp.asarray(rng.standard_normal((8, h, h, 4), np.float32)),
        num_inference_steps=4, guidance_scale=1.0,
        key=jax.random.PRNGKey(0))
    frames = np.asarray(frames)
    f = m.vae_config.scale_factor
    assert frames.shape == (8, h * f, h * f, 3)
    assert np.isfinite(frames).all() and frames.min() >= 0.0 \
        and frames.max() <= 1.0


def test_perfect_teacher_zero_loss_at_boundary():
    """Consistency sanity: when student == EMA target and the teacher's
    ODE step is the identity (same timestep pair would be degenerate, so
    instead check the target function at t ~ lowest is ~ the x0
    prediction: c_skip ~ 0, c_out ~ 1 at t=19)."""
    from stable_diffusion_videos_tpu.training.lcm_distill import \
        boundary_coefficients
    c_skip, c_out = boundary_coefficients(jnp.asarray([19.0]))
    assert float(c_skip[0]) < 1e-4
    assert abs(float(c_out[0]) - 1.0) < 1e-4
    # ... and at t=0 the function is exactly the identity (boundary cond)
    c_skip0, c_out0 = boundary_coefficients(jnp.asarray([0.0]))
    assert float(c_skip0[0]) == 1.0 and float(c_out0[0]) == 0.0


@pytest.mark.skipif(not os.path.isdir(LCM_BUNDLE),
                    reason="distilled LCM bundle not present "
                           "(tools/distill_lcm.py)")
def test_distilled_bundle_lcm4_identifies_patterns():
    """The committed distilled student reproduces each training pattern in
    FOUR cond-only lcm steps (identification criterion: each sample
    correlates best with its own prompt's image)."""
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    from stable_diffusion_videos_tpu.training import make_structured_dataset
    models = SDModels.load(LCM_BUNDLE)
    images, prompts = make_structured_dataset(32)
    h = models.unet_config.sample_size
    eng = Engine(models, scheduler="lcm", batch_bucket=len(prompts),
                 guidance_interval=(0.0, 0.0))
    noise = jnp.asarray(np.random.default_rng(11).standard_normal(
        (len(prompts), h, h, 4), np.float32))
    frames = np.asarray(eng.denoise_frames(
        eng.embed_text(prompts), eng.embed_text(""), noise,
        num_inference_steps=4, guidance_scale=1.0,
        key=jax.random.PRNGKey(0)), np.float32) * 2.0 - 1.0
    from stable_diffusion_videos_tpu.training import identify_patterns
    ids = identify_patterns(frames, images)
    assert (ids == np.arange(len(frames))).all(), ids
