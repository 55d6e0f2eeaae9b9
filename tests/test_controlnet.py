"""ControlNet: zero-init no-op invariant, residual shapes/scaling, UNet
injection, and engine/walk plumbing (models/controlnet.py).

The reference has no spatial conditioning; these tests pin the rebuild's
extension: a freshly-initialised ControlNet must be an exact no-op (zero
convs), residuals must scale linearly, and a perturbed ControlNet must
actually steer the denoise output.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stable_diffusion_videos_tpu.models.bundle import SDModels
from stable_diffusion_videos_tpu.models.controlnet import (ControlNet,
                                                           ControlNetBundle)
from stable_diffusion_videos_tpu.models.unet import UNet2DCondition, UNetConfig


@pytest.fixture(scope="module")
def tiny_ctrl():
    return ControlNetBundle.tiny()


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNetConfig.tiny()
    mod = UNet2DCondition(cfg)
    lat = jnp.zeros((2, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    ctx = jnp.zeros((2, 7, cfg.cross_attention_dim))
    params = mod.init(jax.random.PRNGKey(7), lat, jnp.zeros((2,)), ctx)
    return cfg, mod, params


def _inputs(cfg, f, b=2, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    lat = jax.random.normal(ks[0], (b, cfg.sample_size, cfg.sample_size,
                                    cfg.in_channels))
    ctx = jax.random.normal(ks[1], (b, 7, cfg.cross_attention_dim))
    cond = jax.random.uniform(ks[2], (b, cfg.sample_size * f,
                                      cfg.sample_size * f, 3))
    t = jnp.asarray([3.0, 11.0][:b])
    return lat, t, ctx, cond


def test_residual_shapes_match_unet_skips(tiny_ctrl):
    cfg = tiny_ctrl.config
    lat, t, ctx, cond = _inputs(cfg, tiny_ctrl.pixel_factor)
    down, mid = tiny_ctrl.module().apply(tiny_ctrl.params, lat, t, ctx, cond)
    # skip list: conv_in + per level (layers_per_block [+ downsample])
    n = len(cfg.block_out_channels)
    expect = 1 + n * cfg.layers_per_block + (n - 1)
    assert len(down) == expect
    assert down[0].shape == (2, cfg.sample_size, cfg.sample_size,
                             cfg.block_out_channels[0])
    assert mid.shape[-1] == cfg.block_out_channels[-1]


def test_zero_init_is_exact_noop(tiny_ctrl, tiny_unet):
    """Freshly-initialised zero convs => all residuals exactly 0 and the
    controlled UNet output is bit-identical to the bare one."""
    ucfg, unet, uparams = tiny_unet
    lat, t, ctx, cond = _inputs(ucfg, tiny_ctrl.pixel_factor)
    down, mid = tiny_ctrl.module().apply(tiny_ctrl.params, lat, t, ctx, cond)
    assert all(float(jnp.abs(d).max()) == 0.0 for d in down)
    assert float(jnp.abs(mid).max()) == 0.0
    base = unet.apply(uparams, lat, t, ctx)
    ctrl = unet.apply(uparams, lat, t, ctx, ctrl_down=down, ctrl_mid=mid)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(ctrl))


def test_conditioning_scale_is_linear(tiny_ctrl):
    bundle = ControlNetBundle.tiny(perturb=True)
    cfg = bundle.config
    lat, t, ctx, cond = _inputs(cfg, bundle.pixel_factor, seed=3)
    d1, m1 = bundle.module().apply(bundle.params, lat, t, ctx, cond,
                                   conditioning_scale=1.0)
    d2, m2 = bundle.module().apply(bundle.params, lat, t, ctx, cond,
                                   conditioning_scale=2.0)
    np.testing.assert_allclose(np.asarray(m2), 2 * np.asarray(m1),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(d1, d2):
        np.testing.assert_allclose(np.asarray(b), 2 * np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_perturbed_controlnet_steers_output(tiny_unet):
    bundle = ControlNetBundle.tiny(perturb=True)
    ucfg, unet, uparams = tiny_unet
    lat, t, ctx, cond = _inputs(ucfg, bundle.pixel_factor, seed=5)
    down, mid = bundle.module().apply(bundle.params, lat, t, ctx, cond)
    assert any(float(jnp.abs(d).max()) > 0 for d in down)
    base = unet.apply(uparams, lat, t, ctx)
    ctrl = unet.apply(uparams, lat, t, ctx, ctrl_down=down, ctrl_mid=mid)
    assert float(jnp.abs(base - ctrl).max()) > 1e-6


def test_control_image_changes_residuals():
    bundle = ControlNetBundle.tiny(perturb=True)
    cfg = bundle.config
    lat, t, ctx, cond = _inputs(cfg, bundle.pixel_factor, seed=9)
    _, mid_a = bundle.module().apply(bundle.params, lat, t, ctx, cond)
    _, mid_b = bundle.module().apply(bundle.params, lat, t, ctx,
                                     jnp.zeros_like(cond))
    assert float(jnp.abs(mid_a - mid_b).max()) > 1e-6


def test_wrong_residual_count_raises(tiny_ctrl, tiny_unet):
    ucfg, unet, uparams = tiny_unet
    lat, t, ctx, cond = _inputs(ucfg, tiny_ctrl.pixel_factor)
    down, mid = tiny_ctrl.module().apply(tiny_ctrl.params, lat, t, ctx, cond)
    with pytest.raises(ValueError, match="residuals"):
        unet.apply(uparams, lat, t, ctx, ctrl_down=down[:-1], ctrl_mid=mid)


def test_load_controlnet_dir_and_bare_file(tmp_path):
    """diffusers-layout dir (config.json + safetensors) and bare weights file
    both load; geometry inference matches the explicit config."""
    torch = pytest.importorskip("torch")
    from safetensors.numpy import save_file
    import sys, json, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from torch_sd_ref import TorchControlNet
    from stable_diffusion_videos_tpu.models.weights import load_controlnet

    cfg = UNetConfig(sample_size=8, block_out_channels=(32, 64),
                     layers_per_block=1, cross_attention_dim=32,
                     attention_head_dim=2, attn_levels=(True, False))
    cond_channels = (8, 16)
    torch.manual_seed(0)
    tm = TorchControlNet(cfg, cond_channels)
    sd = {k: np.ascontiguousarray(v.detach().numpy())
          for k, v in tm.state_dict().items()}

    root = tmp_path / "cn"
    root.mkdir()
    save_file(sd, str(root / "diffusion_pytorch_model.safetensors"))
    (root / "config.json").write_text(json.dumps({
        "block_out_channels": [32, 64], "layers_per_block": 1,
        "cross_attention_dim": 32, "attention_head_dim": 2,
        "down_block_types": ["CrossAttnDownBlock2D", "DownBlock2D"],
        "conditioning_embedding_out_channels": [8, 16],
    }))
    b1 = load_controlnet(root)
    assert b1.cond_channels == cond_channels
    assert b1.config.block_out_channels == (32, 64)
    assert b1.pixel_factor == 2

    b2 = load_controlnet(root / "diffusion_pytorch_model.safetensors")
    assert b2.cond_channels == cond_channels
    assert b2.config.block_out_channels == (32, 64)
    assert b2.config.attn_levels == (True, False)
    assert b2.config.cross_attention_dim == 32

    # loaded params drive the module (shape check end to end)
    lat = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, 32))
    cond = jnp.zeros((1, 16, 16, 3))
    down, mid = b1.module().apply(b1.params, lat, jnp.zeros((1,)), ctx, cond)
    assert len(down) == 1 + 2 * 1 + 1
