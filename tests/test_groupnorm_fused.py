"""Fused GroupNorm+SiLU kernel vs flax GroupNorm32 numerics (CPU:
pallas interpret-equivalent lowering; the on-chip speed question is
tools/tpu_probe_gnsilu.py's job)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_videos_tpu.ops.groupnorm import (_unfused,
                                                       fused_groupnorm_silu)


def _reference(x, scale, bias, groups, eps, silu):
    import flax.linen as nn

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, h):
            h = nn.GroupNorm(num_groups=groups, epsilon=eps,
                             dtype=jnp.float32, name="norm")(h)
            return h * jax.nn.sigmoid(h) if silu else h

    m = Ref()
    params = {"params": {"norm": {"scale": scale, "bias": bias}}}
    return np.asarray(m.apply(params, x.astype(jnp.float32)))


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 64), 32),   # UNet-like
    ((1, 4, 4, 96), 32),   # cg = 3
    ((3, 16, 16, 32), 8),
])
@pytest.mark.parametrize("silu", [True, False])
def test_fused_matches_flax_groupnorm(shape, groups, silu):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32) * 3 + 1
    scale = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    want = _reference(x, scale, bias, groups, 1e-5, silu)
    got = np.asarray(fused_groupnorm_silu(x, scale, bias, num_groups=groups,
                                          eps=1e-5, silu=silu))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_fused_bf16_keeps_fp32_stats():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.bfloat16)
    scale = jnp.ones(64, jnp.float32)
    bias = jnp.zeros(64, jnp.float32)
    out = fused_groupnorm_silu(x, scale, bias)
    assert out.dtype == jnp.bfloat16
    want = _reference(x.astype(jnp.float32), scale, bias, 32, 1e-5, True)
    np.testing.assert_allclose(np.asarray(out, np.float32), want,
                               atol=0.05, rtol=0.05)  # bf16 output rounding


def test_vmem_fallback_matches():
    """Oversize blocks route to the unfused path with identical numerics."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(64), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(64), jnp.float32)
    fused = np.asarray(fused_groupnorm_silu(x, scale, bias))
    unfused = np.asarray(_unfused(x, scale, bias, 32, 1e-5, True))
    np.testing.assert_allclose(fused, unfused, atol=2e-5, rtol=2e-5)


def test_unet_fused_flag_matches_default(monkeypatch):
    """SDV_FUSED_GN=1 swaps every GN+SiLU pair for the Pallas kernel with
    the SAME param tree and near-identical outputs (interpreted on CPU)."""
    from stable_diffusion_videos_tpu.models.unet import (UNet2DCondition,
                                                         UNetConfig)
    cfg = UNetConfig.tiny()
    rng = np.random.default_rng(3)
    lat = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([7.0])
    ctx = jnp.asarray(rng.standard_normal((1, 5, cfg.cross_attention_dim)),
                      jnp.float32)

    monkeypatch.delenv("SDV_FUSED_GN", raising=False)
    model = UNet2DCondition(cfg)
    params = model.init(jax.random.PRNGKey(0), lat, t, ctx)
    base = np.asarray(model.apply(params, lat, t, ctx))

    monkeypatch.setenv("SDV_FUSED_GN", "1")
    params2 = UNet2DCondition(cfg).init(jax.random.PRNGKey(0), lat, t, ctx)
    assert jax.tree.map(lambda a: a.shape, params) == \
        jax.tree.map(lambda a: a.shape, params2)
    fused = np.asarray(UNet2DCondition(cfg).apply(params, lat, t, ctx))
    np.testing.assert_allclose(fused, base, atol=2e-4, rtol=2e-4)
