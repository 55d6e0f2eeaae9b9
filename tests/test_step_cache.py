"""DeepCache-style step caching: cached-trunk UNet splitting + engine wiring.

Opt-in inference acceleration beyond the reference's feature set: recompute
the deep UNet trunk every k denoise steps and splice the cached trunk into
shallow-only passes in between (Ma et al. 2023).  ``step_cache=1`` runs the
full trunk every step and must be bit-identical to the exact path — the
equivalence test below pins that.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_videos_tpu.models.unet import (UNet2DCondition,
                                                     UNetConfig)


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNetConfig.tiny()
    m = UNet2DCondition(cfg)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([5.0, 700.0])
    ctx = jnp.asarray(rng.standard_normal((2, 7, 32)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), lat, t, ctx)
    return cfg, m, p, lat, t, ctx


def test_split_full_pass_matches_plain(tiny_unet):
    cfg, m, p, lat, t, ctx = tiny_unet
    base = m.apply(p, lat, t, ctx)
    eps, deep = m.apply(p, lat, t, ctx, cache_split=1)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(eps))
    # deep trunk: level-0 resolution, level-1 channels
    assert deep.shape == (2, 8, 8, cfg.block_out_channels[1])


def test_shallow_with_fresh_cache_is_exact(tiny_unet):
    cfg, m, p, lat, t, ctx = tiny_unet
    eps, deep = m.apply(p, lat, t, ctx, cache_split=1)
    eps_sh, deep2 = m.apply(p, lat, t, ctx, cache_split=1,
                            deep_feature=deep)
    np.testing.assert_allclose(np.asarray(eps_sh), np.asarray(eps),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(deep2), np.asarray(deep))


def test_shallow_with_stale_cache_approximates(tiny_unet):
    cfg, m, p, lat, t, ctx = tiny_unet
    _, deep = m.apply(p, lat, t, ctx, cache_split=1)
    t2 = t + 1.0
    exact = m.apply(p, lat, t2, ctx)
    approx, _ = m.apply(p, lat, t2, ctx, cache_split=1, deep_feature=deep)
    a, e = np.asarray(approx), np.asarray(exact)
    assert not np.array_equal(a, e)  # it IS an approximation
    # ...but a close one for adjacent timesteps
    rel = np.linalg.norm(a - e) / np.linalg.norm(e)
    assert rel < 0.5


def test_cache_split_bounds(tiny_unet):
    cfg, m, p, lat, t, ctx = tiny_unet
    with pytest.raises(ValueError, match="cache_split"):
        m.apply(p, lat, t, ctx, cache_split=0)
    with pytest.raises(ValueError, match="cache_split"):
        m.apply(p, lat, t, ctx, cache_split=len(cfg.block_out_channels))


def test_deeper_split_roundtrip():
    cfg = UNetConfig(sample_size=8, block_out_channels=(32, 64, 64),
                     layers_per_block=2, cross_attention_dim=32,
                     attention_head_dim=2, attn_levels=(True, True, False))
    m = UNet2DCondition(cfg)
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([100.0])
    ctx = jnp.asarray(rng.standard_normal((1, 5, 32)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), lat, t, ctx)
    base = m.apply(p, lat, t, ctx)
    for split in (1, 2):
        eps, deep = m.apply(p, lat, t, ctx, cache_split=split)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(eps))
        eps_sh, _ = m.apply(p, lat, t, ctx, cache_split=split,
                            deep_feature=deep)
        np.testing.assert_allclose(np.asarray(eps_sh), np.asarray(eps),
                                   atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# engine integration
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def models():
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    return SDModels.tiny()


def _run(models, step_cache, steps=6, scheduler="ddim"):
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    eng = Engine(models, scheduler=scheduler, step_cache=step_cache)
    rng = np.random.default_rng(3)
    cond = jnp.asarray(rng.standard_normal((2, 7, 32)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    return eng.denoise_frames(cond, cond[:1], noise,
                              num_inference_steps=steps)


def test_engine_step_cache_1_equals_exact(models):
    exact = _run(models, None)
    k1 = _run(models, 1)  # full trunk every step -> identical numerics
    np.testing.assert_allclose(k1, exact, atol=1e-5, rtol=1e-5)


def test_engine_step_cache_2_close_but_faster_graph(models):
    exact = _run(models, None)
    k2 = _run(models, 2)
    assert k2.shape == exact.shape
    assert np.isfinite(k2).all()
    assert not np.array_equal(k2, exact)  # approximation engaged
    # frames stay visually close on the tiny model
    rel = np.linalg.norm(k2 - exact) / np.linalg.norm(exact)
    assert rel < 0.5


def test_engine_step_cache_with_sdxl():
    """Step caching composes with SDXL's text_time conditioning (the
    added conds ride through both cond branches)."""
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    models = SDModels.tiny_xl()
    rng = np.random.default_rng(5)
    cond = jnp.asarray(rng.standard_normal((2, 7, 32)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)

    def run(k):
        eng = Engine(models, scheduler="ddim", step_cache=k)
        return eng.denoise_frames(cond, cond[:1], noise,
                                  num_inference_steps=4, pooled=pooled,
                                  uncond_pooled=pooled[:1])
    exact, k1, k2 = run(None), run(1), run(2)
    np.testing.assert_allclose(k1, exact, atol=1e-5, rtol=1e-5)
    assert np.isfinite(k2).all() and not np.array_equal(k2, exact)


def test_pipeline_walk_with_step_cache(tmp_path):
    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline
    pipe = StableDiffusionWalkPipeline.tiny(step_cache=2)
    out = pipe.walk(prompts=["a", "b"], seeds=[1, 2],
                    num_interpolation_steps=2, output_dir=str(tmp_path),
                    name="cached", num_inference_steps=4, fps=5,
                    batch_size=2)
    from pathlib import Path
    assert Path(out).exists() and Path(out).stat().st_size > 1000


# ---------------------------------------------------------------------------
# non-uniform ("ends") full-trunk placement — VERDICT r4 #4
# ---------------------------------------------------------------------------
def test_full_trunk_mask_budget_and_boundaries():
    """'ends' spends EXACTLY the uniform budget (ceil(len/k) per segment),
    always recomputes the segment's first step, and is denser at the
    boundaries than mid-segment."""
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    for n, k in ((50, 3), (50, 4), (25, 3), (7, 2), (4, 5)):
        segs = [(0, n, True)]
        mask = Engine._full_trunk_mask(segs, n, k)
        assert mask.sum() == min(-(-n // k), n), (n, k, mask.sum())
        assert mask[0], (n, k)
    # multi-segment (guidance_interval): each segment re-opens with a full
    # step and carries its own budget
    segs = [(0, 5, False), (5, 42, True), (42, 50, False)]
    mask = Engine._full_trunk_mask(segs, 50, 3)
    for a, b, _ in segs:
        assert mask[a]
        assert mask[a:b].sum() == -(-(b - a) // 3)
    # density: with n=50, k=4 the largest gap between consecutive full
    # steps sits mid-schedule, not at the ends
    m = Engine._full_trunk_mask([(0, 50, True)], 50, 4)
    idx = np.flatnonzero(m)
    gaps = np.diff(idx)
    mid = len(gaps) // 2
    assert gaps[mid] >= gaps[0] and gaps[mid] >= gaps[-1], (idx, gaps)


def test_engine_step_cache_ends_policy(models):
    """policy='ends' runs, approximates (k>1), and matches exact at k=1."""
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    rng = np.random.default_rng(3)
    cond = jnp.asarray(rng.standard_normal((2, 7, 32)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)

    def run(**kw):
        eng = Engine(models, scheduler="ddim", **kw)
        return eng.denoise_frames(cond, cond[:1], noise,
                                  num_inference_steps=8)

    exact = run()
    e1 = run(step_cache=1, step_cache_policy="ends")
    np.testing.assert_allclose(e1, exact, atol=1e-5, rtol=1e-5)
    e3 = run(step_cache=3, step_cache_policy="ends")
    assert np.isfinite(e3).all() and not np.array_equal(e3, exact)
    rel = np.linalg.norm(e3 - exact) / np.linalg.norm(exact)
    assert rel < 0.5
    # composes with guidance_interval (per-segment masks)
    c = run(step_cache=3, step_cache_policy="ends",
            guidance_interval=(0.1, 0.85))
    assert np.isfinite(c).all()
    with pytest.raises(ValueError):
        run(step_cache=3, step_cache_policy="nope")
