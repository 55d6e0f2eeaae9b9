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


# ---------------------------------------------------------------------------
# engine plumbing
# ---------------------------------------------------------------------------

def test_engine_control_dispatch():
    """One fused dispatch with a ControlNet: control steers the frames,
    control_scale=0 reproduces the uncontrolled program exactly, and a
    controlless dispatch on the same engine still works."""
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    models = SDModels.tiny()
    bundle = ControlNetBundle.tiny(perturb=True)
    eng = Engine(models, scheduler="ddim", controlnet=bundle)
    cond = eng.embed_text(["a forest", "a city"])
    uncond = eng.embed_text("")
    noise = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    size = models.default_size
    ctrl = jax.random.uniform(jax.random.PRNGKey(1), (2, size, size, 3))

    base = eng.denoise_frames(cond, uncond, noise, num_inference_steps=3)
    out = eng.denoise_frames(cond, uncond, noise, num_inference_steps=3,
                             control=ctrl)
    assert out.shape == base.shape
    assert float(np.abs(out - base).max()) > 1e-4

    zero = eng.denoise_frames(cond, uncond, noise, num_inference_steps=3,
                              control=ctrl, control_scale=0.0)
    np.testing.assert_allclose(zero, base, atol=1e-5)

    # single control map broadcasts over the batch
    one = eng.denoise_frames(cond, uncond, noise, num_inference_steps=3,
                             control=ctrl[:1])
    assert one.shape == base.shape


def test_engine_control_errors():
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    models = SDModels.tiny()
    eng = Engine(models, scheduler="ddim")
    cond = eng.embed_text("a")
    noise = jnp.zeros((1, 8, 8, 4))
    size = models.default_size
    with pytest.raises(ValueError, match="no ControlNet"):
        eng.denoise_frames(cond, cond, noise, num_inference_steps=2,
                           control=jnp.zeros((1, size, size, 3)))

    bundle = ControlNetBundle.tiny()
    eng2 = Engine(models, scheduler="ddim", controlnet=bundle)
    with pytest.raises(ValueError, match="resolution"):
        eng2.denoise_frames(cond, cond, noise, num_inference_steps=2,
                            control=jnp.zeros((1, size * 2, size * 2, 3)))

    eng3 = Engine(models, scheduler="ddim", controlnet=bundle, step_cache=2)
    with pytest.raises(ValueError, match="step_cache"):
        eng3.denoise_frames(cond, cond, noise, num_inference_steps=2,
                            control=jnp.zeros((1, size, size, 3)))


def test_engine_control_img2img():
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    models = SDModels.tiny()
    bundle = ControlNetBundle.tiny(perturb=True)
    eng = Engine(models, scheduler="ddim", controlnet=bundle)
    cond = eng.embed_text("a")
    size = models.default_size
    init = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4)) * 0.1
    ctrl = jax.random.uniform(jax.random.PRNGKey(3), (1, size, size, 3))
    base = eng.img2img(cond, cond, init, strength=0.6,
                       num_inference_steps=4)
    out = eng.img2img(cond, cond, init, strength=0.6,
                      num_inference_steps=4, control=ctrl)
    assert out.shape == base.shape
    assert float(np.abs(out - base).max()) > 1e-5


# ---------------------------------------------------------------------------
# pipeline plumbing
# ---------------------------------------------------------------------------

def test_walk_with_control_image(tmp_path):
    """walk(control_image=) runs end to end, persists the control settings
    in prompt_config.json, and fails fast without a controlnet."""
    import json
    from PIL import Image
    from stable_diffusion_videos_tpu.pipeline import \
        StableDiffusionWalkPipeline

    bundle = ControlNetBundle.tiny(perturb=True)
    pipe = StableDiffusionWalkPipeline(SDModels.tiny(), scheduler="ddim",
                                       controlnet=bundle)
    size = pipe.models.default_size
    ctrl_path = tmp_path / "pose.png"
    Image.fromarray(
        (np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8)
    ).save(ctrl_path)  # deliberately wrong size: loader must resize

    out = pipe.walk(prompts=["a", "b"], seeds=[1, 2],
                    num_interpolation_steps=3, output_dir=str(tmp_path),
                    name="ctrl", num_inference_steps=2, fps=5,
                    control_image=str(ctrl_path), controlnet_scale=0.7,
                    make_video=False)
    frames = sorted((tmp_path / "ctrl" / "ctrl_000000").glob("frame*.png"))
    assert len(frames) == 3
    cfg = json.loads((tmp_path / "ctrl" / "prompt_config.json").read_text())
    assert cfg["control_image"] == str(ctrl_path)
    assert cfg["controlnet_scale"] == 0.7

    plain = StableDiffusionWalkPipeline(SDModels.tiny(), scheduler="ddim")
    with pytest.raises(ValueError, match="controlnet"):
        plain.walk(prompts=["a", "b"], seeds=[1, 2],
                   num_interpolation_steps=2, output_dir=str(tmp_path),
                   name="noctrl", num_inference_steps=2,
                   control_image=str(ctrl_path))


def test_control_steers_walk_frames(tmp_path):
    """The same walk with and without control produces different frames
    (and with control_scale=0 identical ones)."""
    from stable_diffusion_videos_tpu.pipeline import \
        StableDiffusionWalkPipeline

    bundle = ControlNetBundle.tiny(perturb=True)
    pipe = StableDiffusionWalkPipeline(SDModels.tiny(), scheduler="ddim",
                                       controlnet=bundle)
    size = pipe.models.default_size
    ctrl = np.random.RandomState(1).rand(size, size, 3).astype(np.float32)

    def frames(name, **kw):
        pipe.walk(prompts=["a", "b"], seeds=[1, 2],
                  num_interpolation_steps=2, output_dir=str(tmp_path),
                  name=name, num_inference_steps=2, make_video=False, **kw)
        from PIL import Image
        return np.stack([
            np.asarray(Image.open(f)) for f in
            sorted((tmp_path / name / f"{name}_000000").glob("frame*.png"))])

    base = frames("base")
    ctrled = frames("with", control_image=ctrl)
    zeroed = frames("zero", control_image=ctrl, controlnet_scale=0.0)
    assert (ctrled != base).any()
    np.testing.assert_array_equal(zeroed, base)


def test_multi_controlnet_and_guess_mode():
    """Two ControlNets: residuals sum (scale-0 on one == dropping it), and
    guess_mode steers only the conditional CFG branch."""
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    models = SDModels.tiny()
    b1 = ControlNetBundle.tiny(perturb=True, seed=0)
    b2 = ControlNetBundle.tiny(perturb=True, seed=42)
    size = models.default_size
    noise = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    c1 = jax.random.uniform(jax.random.PRNGKey(1), (2, size, size, 3))
    c2 = jax.random.uniform(jax.random.PRNGKey(2), (2, size, size, 3))

    eng2 = Engine(models, scheduler="ddim", controlnet=[b1, b2])
    cond = eng2.embed_text(["a", "b"])
    uncond = eng2.embed_text("")
    both = eng2.denoise_frames(cond, uncond, noise, num_inference_steps=2,
                               control=[c1, c2])
    second_off = eng2.denoise_frames(cond, uncond, noise,
                                     num_inference_steps=2,
                                     control=[c1, c2],
                                     control_scale=[1.0, 0.0])
    eng1 = Engine(models, scheduler="ddim", controlnet=b1)
    only_first = eng1.denoise_frames(cond, uncond, noise,
                                     num_inference_steps=2, control=c1)
    assert float(np.abs(both - second_off).max()) > 1e-5
    np.testing.assert_allclose(second_off, only_first, atol=1e-5)

    with pytest.raises(ValueError, match="control map"):
        eng2.denoise_frames(cond, uncond, noise, num_inference_steps=2,
                            control=[c1])

    # guess mode: different program, still runs; scale-0 equals baseline
    guess = eng1.denoise_frames(cond, uncond, noise, num_inference_steps=2,
                                control=c1, guess_mode=True)
    plain = eng1.denoise_frames(cond, uncond, noise, num_inference_steps=2)
    assert float(np.abs(guess - plain).max()) > 1e-5
    guess0 = eng1.denoise_frames(cond, uncond, noise, num_inference_steps=2,
                                 control=c1, guess_mode=True,
                                 control_scale=0.0)
    np.testing.assert_allclose(guess0, plain, atol=1e-5)


def test_per_frame_control_sequence(tmp_path):
    """A directory of per-frame maps (control video) animates the structure:
    every frame gets its own map; wrong length fails fast."""
    from PIL import Image
    from stable_diffusion_videos_tpu.pipeline import \
        StableDiffusionWalkPipeline

    bundle = ControlNetBundle.tiny(perturb=True)
    pipe = StableDiffusionWalkPipeline(SDModels.tiny(), scheduler="ddim",
                                       controlnet=bundle)
    size = pipe.models.default_size
    seq_dir = tmp_path / "poseseq"
    seq_dir.mkdir()
    rs = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray((rs.rand(size, size, 3) * 255).astype(np.uint8)
                        ).save(seq_dir / f"{i:03d}.png")

    pipe.walk(prompts=["a", "b"], seeds=[1, 2], num_interpolation_steps=3,
              output_dir=str(tmp_path), name="seq", num_inference_steps=2,
              control_image=str(seq_dir), batch_size=2, make_video=False)
    frames = sorted((tmp_path / "seq" / "seq_000000").glob("frame*.png"))
    assert len(frames) == 3

    with pytest.raises(ValueError, match="control sequence"):
        pipe.walk(prompts=["a", "b"], seeds=[1, 2],
                  num_interpolation_steps=5, output_dir=str(tmp_path),
                  name="seq2", num_inference_steps=2,
                  control_image=str(seq_dir))


def test_control_sequence_varies_frames(tmp_path):
    """With identical embeds/noise per frame, a varying control sequence
    must produce varying frames (proves per-frame maps reach the engine)."""
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    models = SDModels.tiny()
    bundle = ControlNetBundle.tiny(perturb=True)
    eng = Engine(models, scheduler="ddim", controlnet=bundle)
    cond = eng.embed_text(["same", "same"])
    noise0 = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    noise = jnp.concatenate([noise0, noise0])  # identical frames
    size = models.default_size
    seq = jax.random.uniform(jax.random.PRNGKey(1), (2, size, size, 3))
    out = eng.denoise_frames(cond, eng.embed_text(""), noise,
                             num_inference_steps=2, control=seq)
    assert float(np.abs(out[0] - out[1]).max()) > 1e-5
    same = eng.denoise_frames(cond, eng.embed_text(""), noise,
                              num_inference_steps=2,
                              control=jnp.broadcast_to(seq[:1], seq.shape))
    np.testing.assert_allclose(same[0], same[1], atol=1e-5)
