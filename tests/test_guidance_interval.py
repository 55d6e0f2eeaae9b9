"""Limited-interval CFG (Kynkäänniemi et al. 2024).

``Engine(guidance_interval=(lo, hi))`` runs the CFG pair only for loop
steps whose fraction falls in [lo, hi); outside the interval only the
conditional branch runs (half the UNet batch — a real FLOP cut).  The
scan splits into up to three statically-shaped segments.

Reference scope note: the reference applies plain CFG on every step
(``stable_diffusion_pipeline.py:422-447``); this is a beyond-reference
opt-in acceleration, like step_cache.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_videos_tpu.models.bundle import SDModels
from stable_diffusion_videos_tpu.runtime.engine import Engine


def _inputs(models, b=2, key=0):
    d = models.unet_config.cross_attention_dim
    h = models.unet_config.sample_size
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    cond = jax.random.normal(ks[0], (b, 77, d))
    uncond = jax.random.normal(ks[1], (1, 77, d))
    noise = jax.random.normal(ks[2], (b, h, h, 4))
    return cond, uncond, noise


@pytest.mark.parametrize("scheduler", ["ddim", "pndm", "euler_ancestral"])
def test_full_interval_matches_default(scheduler):
    """(0, 1) and None compile structurally different programs (the tuple
    is normalised away) — but any non-trivial full-cover interval must
    reproduce the default output."""
    models = SDModels.tiny()
    cond, uncond, noise = _inputs(models)
    base = Engine(models, scheduler=scheduler).denoise_frames(
        cond, uncond, noise, num_inference_steps=6)
    eng = Engine(models, scheduler=scheduler, guidance_interval=(0.0, 1.0))
    assert eng.guidance_interval is None  # normalised to the plain program
    out = eng.denoise_frames(cond, uncond, noise, num_inference_steps=6)
    np.testing.assert_allclose(out, base, atol=1e-5)


def test_empty_interval_equals_guidance_one():
    """CFG on zero steps == running the conditional branch everywhere ==
    the default program at guidance_scale=1 (eps_u + 1*(eps_c-eps_u) =
    eps_c)."""
    models = SDModels.tiny()
    cond, uncond, noise = _inputs(models)
    ref = Engine(models, scheduler="ddim").denoise_frames(
        cond, uncond, noise, num_inference_steps=5, guidance_scale=1.0)
    out = Engine(models, scheduler="ddim",
                 guidance_interval=(0.0, 0.0)).denoise_frames(
        cond, uncond, noise, num_inference_steps=5, guidance_scale=7.5)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_partial_interval_runs_and_differs():
    models = SDModels.tiny()
    cond, uncond, noise = _inputs(models)
    eng = Engine(models, scheduler="ddim", guidance_interval=(0.2, 0.8))
    out = eng.denoise_frames(cond, uncond, noise, num_inference_steps=10,
                             guidance_scale=7.5)
    assert np.isfinite(out).all() and out.shape[0] == 2
    full = Engine(models, scheduler="ddim").denoise_frames(
        cond, uncond, noise, num_inference_steps=10, guidance_scale=7.5)
    none = Engine(models, scheduler="ddim").denoise_frames(
        cond, uncond, noise, num_inference_steps=10, guidance_scale=1.0)
    assert float(np.abs(out - full).max()) > 1e-6
    assert float(np.abs(out - none).max()) > 1e-6
    # segments partition the loop exactly
    assert eng._interval_segments(10) == [(0, 2, False), (2, 8, True),
                                          (8, 10, False)]


def test_interval_with_warmup_sampler():
    """pndm's warm-up extends the loop beyond num_inference_steps; the
    interval is over LOOP steps and must still partition cleanly."""
    models = SDModels.tiny()
    cond, uncond, noise = _inputs(models)
    eng = Engine(models, scheduler="pndm", guidance_interval=(0.0, 0.5))
    out = eng.denoise_frames(cond, uncond, noise, num_inference_steps=6)
    assert np.isfinite(out).all()


def test_interval_validation():
    models = SDModels.tiny()
    with pytest.raises(ValueError, match="guidance_interval"):
        Engine(models, guidance_interval=(0.8, 0.2))
    with pytest.raises(ValueError, match="guidance_interval"):
        Engine(models, guidance_interval=(-0.1, 0.5))


def test_interval_composes_with_step_cache():
    """The two speed levers compose: each interval segment re-initialises
    its deep-trunk cache at the segment's batch (2B for CFG segments, B for
    cond-only) and opens with a full-trunk pass (segment-relative cache
    predicate), so the B-vs-2B mismatch that used to be rejected never
    arises."""
    models = SDModels.tiny()
    cond, uncond, noise = _inputs(models)
    kw = dict(num_inference_steps=10, guidance_scale=7.5)
    out = Engine(models, scheduler="ddim", step_cache=2,
                 guidance_interval=(0.2, 0.8)).denoise_frames(
        cond, uncond, noise, **kw)
    assert np.isfinite(out).all() and out.shape[0] == 2
    # step_cache=1 recomputes the trunk every step == the interval-only
    # program, bit-for-bit (cache path adds no approximation at k=1)
    k1 = Engine(models, scheduler="ddim", step_cache=1,
                guidance_interval=(0.2, 0.8)).denoise_frames(
        cond, uncond, noise, **kw)
    ref = Engine(models, scheduler="ddim",
                 guidance_interval=(0.2, 0.8)).denoise_frames(
        cond, uncond, noise, **kw)
    np.testing.assert_allclose(k1, ref, atol=1e-5)
    # k=2 is an approximation of the same program — close, not identical
    assert float(np.abs(out - ref).max()) > 1e-7
    err = float(np.abs(out.astype(np.float64) - ref).mean())
    assert err < 0.25, f"step_cache=2 diverged from exact: mean err {err}"


def test_interval_step_cache_img2img():
    """The composed program also serves the img2img path (shared _build)."""
    models = SDModels.tiny()
    cond, uncond, _ = _inputs(models)
    h = models.unet_config.sample_size
    init = jax.random.normal(jax.random.PRNGKey(5), (2, h, h, 4)) * 0.2
    out = Engine(models, scheduler="ddim", step_cache=2,
                 guidance_interval=(0.0, 0.7)).img2img(
        cond, uncond, init, strength=0.6, num_inference_steps=8)
    assert np.isfinite(out).all()


def test_interval_img2img():
    """img2img shares _build; the interval applies to the SLICED loop."""
    models = SDModels.tiny()
    cond, uncond, _ = _inputs(models)
    h = models.unet_config.sample_size
    init = jax.random.normal(jax.random.PRNGKey(5), (2, h, h, 4)) * 0.2
    out = Engine(models, scheduler="ddim",
                 guidance_interval=(0.0, 0.7)).img2img(
        cond, uncond, init, strength=0.6, num_inference_steps=8)
    assert np.isfinite(out).all()


def test_interval_with_controlnet():
    """Cond-only segments slice the cond half of the CFG-doubled maps."""
    from stable_diffusion_videos_tpu.models.controlnet import ControlNetBundle
    models = SDModels.tiny()
    cond, uncond, noise = _inputs(models)
    eng = Engine(models, scheduler="ddim",
                 controlnet=ControlNetBundle.tiny(perturb=True),
                 guidance_interval=(0.3, 1.0))
    size = models.default_size
    ctrl = jax.random.uniform(jax.random.PRNGKey(7), (size, size, 3))
    out = eng.denoise_frames(cond, uncond, noise, num_inference_steps=4,
                             control=ctrl)
    assert np.isfinite(out).all()
    # control must still matter in the cond-only segment
    out0 = eng.denoise_frames(cond, uncond, noise, num_inference_steps=4,
                              control=jnp.zeros_like(ctrl))
    assert float(np.abs(out - out0).max()) > 1e-6


def test_interval_debug_path_matches_fused():
    models = SDModels.tiny()
    cond, uncond, noise = _inputs(models)
    kw = dict(num_inference_steps=6, guidance_scale=7.5)
    fused = Engine(models, scheduler="ddim",
                   guidance_interval=(0.25, 0.75)).denoise_frames(
        cond, uncond, noise, **kw)
    dbg = Engine(models, scheduler="ddim", guidance_interval=(0.25, 0.75),
                 debug=True).denoise_frames(cond, uncond, noise, **kw)
    np.testing.assert_allclose(dbg, fused, atol=1e-4)


def test_pipeline_and_cli_plumbing(tmp_path):
    from stable_diffusion_videos_tpu.pipeline import \
        StableDiffusionWalkPipeline
    pipe = StableDiffusionWalkPipeline.tiny(guidance_interval=(0.0, 0.6))
    assert pipe.engine.guidance_interval == (0.0, 0.6)
    pipe.walk(prompts=["a", "b"], seeds=[1, 2], num_interpolation_steps=2,
              output_dir=str(tmp_path), name="gi", num_inference_steps=4,
              make_video=False)
    assert len(list((tmp_path / "gi" / "gi_000000").glob("frame*.png"))) == 2

    from stable_diffusion_videos_tpu.__main__ import build_parser
    args = build_parser().parse_args(
        ["walk", "--prompts", "a", "b", "--seeds", "1", "2",
         "--guidance-interval", "0.1", "0.9"])
    assert args.guidance_interval == [0.1, 0.9]
