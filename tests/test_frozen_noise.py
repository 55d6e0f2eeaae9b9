"""Frozen stochastic-transition noise (Engine(frozen_noise=True)).

A walk dispatch batches adjacent frames of ONE trajectory; stochastic
samplers (lcm, euler_ancestral, ddim eta>0) injecting independent
per-row transition noise there reads as temporal flicker.  The frozen
mode broadcasts one noise field across the batch
(core/schedulers/base.py ``transition_noise``).

The discriminating property: a batch of IDENTICAL rows (same latent,
same context) must produce IDENTICAL frames under frozen noise, and
DIFFERENT frames without it — while deterministic samplers are
row-identical either way.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny():
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    return SDModels.tiny(seed=0)


def _frames(models, scheduler, frozen, steps=4, eta=0.0):
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    eng = Engine(models, scheduler=scheduler, batch_bucket=8,
                 frozen_noise=frozen)
    d_ctx = models.unet_config.cross_attention_dim
    h = models.unet_config.sample_size
    rng = np.random.default_rng(3)
    ctx = jnp.broadcast_to(
        jnp.asarray(rng.standard_normal((1, 7, d_ctx), np.float32)),
        (8, 7, d_ctx))
    noise = jnp.broadcast_to(
        jnp.asarray(rng.standard_normal((1, h, h, 4), np.float32)),
        (8, h, h, 4))
    return np.asarray(eng.denoise_frames(
        ctx, ctx[:1], noise, num_inference_steps=steps,
        guidance_scale=2.0, eta=eta, key=jax.random.PRNGKey(5)), np.float32)


@pytest.mark.parametrize("scheduler,kw", [
    ("lcm", {}),
    ("euler_ancestral", {}),
    ("ddim", {"eta": 1.0}),
])
def test_frozen_noise_makes_identical_rows_identical(tiny, scheduler, kw):
    frames = _frames(tiny, scheduler, frozen=True, **kw)
    for b in range(1, 8):
        np.testing.assert_array_equal(frames[0], frames[b])


@pytest.mark.parametrize("scheduler,kw", [
    ("lcm", {}),
    ("euler_ancestral", {}),
    ("ddim", {"eta": 1.0}),
])
def test_default_noise_keeps_rows_independent(tiny, scheduler, kw):
    frames = _frames(tiny, scheduler, frozen=False, **kw)
    diffs = [float(np.abs(frames[0] - frames[b]).max()) for b in range(1, 8)]
    assert max(diffs) > 1e-4, diffs


def test_frozen_flag_noop_for_deterministic_samplers(tiny):
    """dpm is noise-free: frozen mode must not change its output (the
    flag only alters transition_noise call sites)."""
    a = _frames(tiny, "dpm", frozen=False)
    b = _frames(tiny, "dpm", frozen=True)
    np.testing.assert_array_equal(a, b)


def _clip_frames(tmp_path, batch_size, tag):
    from stable_diffusion_videos_tpu.pipeline import (
        StableDiffusionWalkPipeline)
    pipe = StableDiffusionWalkPipeline.tiny(scheduler="euler_ancestral",
                                            frozen_noise=True, safety=False)
    out = tmp_path / tag
    pipe.make_clip_frames("a", "b", 1, 2, num_interpolation_steps=5,
                          save_path=out, num_inference_steps=3,
                          guidance_scale=2.0, batch_size=batch_size)
    import PIL.Image
    return [np.asarray(PIL.Image.open(p))
            for p in sorted(out.glob("frame*.png"))]


LCM_BUNDLE = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "goldens",
    "structured_lcm_bundle")


@pytest.mark.skipif(not __import__("os").path.isdir(LCM_BUNDLE),
                    reason="distilled LCM bundle not present")
def test_frozen_noise_reduces_walk_flicker_on_trained_weights():
    """Quality evidence on TRAINED weights (not plumbing): a walk
    trajectory sampled with the distilled lcm-4 student flickers less
    frame-to-frame under frozen noise.  LCM injects fresh transition
    noise at every step, so adjacent frames of the free-noise walk carry
    independent noise textures — exactly what temporal_flicker measures
    (the vid2vid coherence gate, utils/metrics.py)."""
    from stable_diffusion_videos_tpu.core.interp import lerp, slerp
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    from stable_diffusion_videos_tpu.training import make_structured_dataset
    from stable_diffusion_videos_tpu.utils.metrics import temporal_flicker

    models = SDModels.load(LCM_BUNDLE)
    _, prompts = make_structured_dataset(32)
    h = models.unet_config.sample_size
    rng = np.random.default_rng(23)
    n0, n1 = (jnp.asarray(rng.standard_normal((h, h, 4), np.float32))
              for _ in range(2))

    def walk_frames(frozen):
        eng = Engine(models, scheduler="lcm", batch_bucket=8,
                     guidance_interval=(0.0, 0.0), frozen_noise=frozen)
        e0 = eng.embed_text([prompts[0]])
        e1 = eng.embed_text([prompts[1]])
        ts = np.linspace(0.0, 1.0, 8)
        embeds = jnp.concatenate([lerp(float(t), e0, e1) for t in ts])
        noise = jnp.stack([slerp(float(t), n0, n1) for t in ts])
        return np.asarray(eng.denoise_frames(
            embeds, eng.embed_text(""), noise, num_inference_steps=4,
            guidance_scale=1.0, key=jax.random.PRNGKey(2)), np.float32)

    free = temporal_flicker(walk_frames(False))
    frozen = temporal_flicker(walk_frames(True))
    # the frozen field removes the sampler-noise component of the
    # consecutive-frame difference; the content morph remains in both
    assert frozen["flicker_ssim"] < 0.7 * free["flicker_ssim"], (frozen,
                                                                 free)
    assert frozen["flicker_mad"] < free["flicker_mad"], (frozen, free)


def test_vid2vid_frozen_noise_invariant_to_batch_partitioning():
    """Same property on the vid2vid path: its per-dispatch key derivation
    (seed*9973 + frame_idx) must drop the frame_idx term under frozen
    noise, or each batch of a stochastic-sampler restyle freezes a
    different transition field (seam every batch_size frames)."""
    from stable_diffusion_videos_tpu.pipeline import (
        StableDiffusionWalkPipeline)
    pipe = StableDiffusionWalkPipeline.tiny(scheduler="lcm",
                                            frozen_noise=True, safety=False)
    h = pipe.models.default_size
    rng = np.random.default_rng(11)
    src = rng.integers(0, 256, (6, h, h, 3), dtype=np.uint8)
    kw = dict(strength=0.6, num_inference_steps=4, guidance_scale=2.0,
              seed=7, output_type="frames")
    a = pipe.vid2vid(list(src), "p", batch_size=6, **kw)
    b = pipe.vid2vid(list(src), "p", batch_size=2, **kw)
    assert len(a) == len(b) == 6
    for fa, fb in zip(a, b):
        # batch 6 vs 2 compile DIFFERENT XLA programs (unlike the walk
        # test, whose dispatches pad to one bucket) — allow the 1-ULP
        # fusion-order wiggle at the uint8 quantisation edge; a per-batch
        # key would differ by O(100) levels across most pixels
        diff = np.abs(np.asarray(fa, np.int16) - np.asarray(fb, np.int16))
        assert diff.max() <= 1, diff.max()


def test_vid2vid_frozen_transition_keeps_per_frame_initial_noise():
    """frozen_noise must freeze ONLY the transition field.  With
    ``shared_noise=False`` the initial re-noising draw has to stay
    per-frame: the buggy path let img2img split the (frozen) dispatch
    key, so every batch reused one (B,h,w,4) field — frame j and frame
    j+batch_size got byte-identical initial noise (period-B texture
    recurrence) and the output depended on the batch partitioning."""
    from stable_diffusion_videos_tpu.pipeline import (
        StableDiffusionWalkPipeline)
    pipe = StableDiffusionWalkPipeline.tiny(scheduler="lcm",
                                            frozen_noise=True, safety=False)
    h = pipe.models.default_size
    # IDENTICAL source frames isolate the initial-noise contribution
    src = [np.full((h, h, 3), 128, np.uint8)] * 6
    kw = dict(strength=0.6, num_inference_steps=4, guidance_scale=2.0,
              seed=7, output_type="frames", shared_noise=False)
    a = pipe.vid2vid(src, "p", batch_size=2, **kw)
    assert len(a) == 6
    arr = [np.asarray(f, np.int16) for f in a]
    # period-B recurrence gone: same-row frames of consecutive batches
    # must differ (identical sources, so only the initial noise separates
    # them)
    assert np.abs(arr[0] - arr[2]).max() > 1, "frame 0 == frame 2"
    assert np.abs(arr[1] - arr[3]).max() > 1, "frame 1 == frame 3"
    # and the result is invariant to the partitioning (absolute-frame-
    # indexed draws), modulo the 1-ULP cross-program quantisation wiggle
    b = pipe.vid2vid(src, "p", batch_size=3, **kw)
    for fa, fb in zip(a, b):
        diff = np.abs(np.asarray(fa, np.int16) - np.asarray(fb, np.int16))
        assert diff.max() <= 1, diff.max()


def test_frozen_noise_invariant_to_batch_partitioning(tmp_path):
    """The frozen field must be constant across DISPATCH boundaries:
    rendering one clip with batch_size=5 (one dispatch) and batch_size=2
    (three dispatches, uneven tail) must give identical frames.  The
    per-batch ``fold_in(key, batch_idx)`` derivation broke this — each
    batch froze a DIFFERENT field, a texture seam every batch_size
    frames (pipeline/walk.py ``noise_key`` threading)."""
    a = _clip_frames(tmp_path, 5, "one_dispatch")
    b = _clip_frames(tmp_path, 2, "three_dispatches")
    assert len(a) == len(b) == 5
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(fa, fb)
