"""ToMe-SD token merging (ops/tome.py): partition/merge/unmerge algebra,
UNet integration (no new params, composes with step_cache), pipeline run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_videos_tpu.ops.tome import (bipartite_partition,
                                                  build_plan, merge,
                                                  tome_wrap, unmerge)


def test_partition_covers_all_tokens_once():
    src, dst = bipartite_partition(8, 12)
    assert len(dst) == (8 // 2) * (12 // 2)
    both = np.concatenate([src, dst])
    assert sorted(both) == list(range(8 * 12))


def test_merge_shapes_and_unmerge_positions():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 16)), jnp.float32)
    plan = build_plan(x, 8, 8, n_merge=20)
    xm = merge(x, plan)
    assert xm.shape == (2, 64 - 20, 16)
    out = unmerge(xm, plan, 64)
    assert out.shape == x.shape
    # kept src tokens pass through merge->unmerge untouched
    kept_pos = np.take(np.asarray(plan.src_idx), np.asarray(plan.kept))
    for b in range(2):
        np.testing.assert_allclose(np.asarray(out)[b, kept_pos[b]],
                                   np.asarray(x)[b, kept_pos[b]],
                                   rtol=1e-6)


def test_constant_blocks_merge_losslessly():
    """If every 2x2 region is constant, src tokens equal their dst, so
    merge->unmerge with an identity block reproduces x exactly."""
    rng = np.random.default_rng(1)
    blocks = rng.standard_normal((1, 4, 4, 8)).astype(np.float32)
    x = jnp.asarray(np.repeat(np.repeat(blocks, 2, axis=1), 2, axis=2)
                    .reshape(1, 64, 8))
    out = tome_wrap(lambda t: t, x, 8, 8, ratio=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_ratio_zero_is_identity_path():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 64, 16)), jnp.float32)
    calls = []

    def fn(t):
        calls.append(t.shape)
        return t * 2.0
    out = tome_wrap(fn, x, 8, 8, ratio=0.0)
    assert calls == [(2, 64, 16)]  # full token set, no merge machinery
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)


def test_merge_picks_most_redundant():
    """A token made identical to a dst token must merge before a token
    that is orthogonal to every dst."""
    x = np.zeros((1, 16, 4), np.float32)
    rng = np.random.default_rng(3)
    x[0] = rng.standard_normal((16, 4))
    src, dst = bipartite_partition(4, 4)
    x[0, src[0]] = x[0, dst[0]]          # duplicate -> max similarity
    plan = build_plan(jnp.asarray(x), 4, 4, n_merge=1)
    assert int(plan.merged[0, 0]) == 0   # src-list index of the duplicate
    assert int(plan.assign[0, 0]) == 0   # merged into its duplicate dst


def test_unet_tome_no_new_params_and_runs():
    from stable_diffusion_videos_tpu.models.unet import (UNet2DCondition,
                                                         UNetConfig)
    cfg = UNetConfig.tiny()
    lat = jnp.zeros((1, 8, 8, cfg.in_channels))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 7, cfg.cross_attention_dim))
    base = UNet2DCondition(cfg)
    tome = UNet2DCondition(cfg, tome=(0.4, 0))
    p1 = base.init(jax.random.PRNGKey(0), lat, t, ctx)
    p2 = tome.init(jax.random.PRNGKey(0), lat, t, ctx)
    # ToMe is weightless: identical param trees, same checkpoints load
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    rng = np.random.default_rng(4)
    lat = jnp.asarray(rng.standard_normal(lat.shape), jnp.float32)
    eps = tome.apply(p1, lat, t, ctx)
    assert eps.shape == lat.shape
    assert np.isfinite(np.asarray(eps)).all()
    # and it actually changes the computation at ratio > 0
    eps_base = base.apply(p1, lat, t, ctx)
    assert np.abs(np.asarray(eps) - np.asarray(eps_base)).max() > 0


def test_pipeline_tome_runs_and_composes_with_step_cache():
    from stable_diffusion_videos_tpu.pipeline import (
        StableDiffusionWalkPipeline)
    pipe = StableDiffusionWalkPipeline.tiny(scheduler="ddim", tome=0.4,
                                            step_cache=2)
    out = pipe(prompt="a scene", seed=1, num_inference_steps=3,
               output_type="np")
    assert out.shape[-1] == 3
    assert np.isfinite(out).all()


def test_with_tome_validation():
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    m = SDModels.tiny()
    with pytest.raises(ValueError):
        m.with_tome(1.0)
    assert m.with_tome(0.0).tome is None
    assert m.with_tome(0.3, 1).tome == (0.3, 1)


def test_tome_cli_wiring():
    from stable_diffusion_videos_tpu.__main__ import build_parser
    args = build_parser().parse_args(
        ["walk", "--prompts", "a", "b", "--seeds", "1", "2",
         "--tome", "0.4", "1"])
    assert args.tome == [0.4, 1]
