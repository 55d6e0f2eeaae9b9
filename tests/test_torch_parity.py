"""Numerical parity of the Flax UNet/VAE + weight converter vs an
independent torch transcription of the diffusers SD1.x architecture.

This closes the round-1 validation gap (VERDICT "Missing #1"): CLIP and the
schedulers were cross-validated against external implementations, but the
UNet and VAE — the models that do all the work — were only ever round-trip
tested against the repo's own converter.  Here every weight flows
torch state_dict -> models/weights.py -> Flax pytree, and the two forwards
must agree, catching any transpose, ordering, padding, or eps mismatch.

cf. reference ``stable_diffusion_pipeline.py:11,418,433`` (the diffusers
modules being replaced).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stable_diffusion_videos_tpu.models import weights as W  # noqa: E402
from stable_diffusion_videos_tpu.models.unet import (UNet2DCondition,  # noqa: E402
                                                     UNetConfig)
from stable_diffusion_videos_tpu.models.vae import (AutoencoderKL,  # noqa: E402
                                                    VAEConfig)

from torch_sd_ref import (CrossAttention, Downsample2D,  # noqa: E402
                          ResnetBlock2D, TorchUNet, TorchVAE,
                          Transformer2DModel, Upsample2D, VAEAttention,
                          timestep_embedding)

TOL = dict(atol=1e-4, rtol=1e-4)


def sd_numpy(mod, prefix="m"):
    """torch module -> flat numpy state dict under a prefix."""
    return {f"{prefix}.{k}": v.detach().numpy()
            for k, v in mod.state_dict().items()}


def nhwc(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


def rand(*shape, seed=0, scale=1.0):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(*shape, generator=g) * scale


# ---------------------------------------------------------------------------
# module-level parity (localizes any failure)
# ---------------------------------------------------------------------------

def test_timestep_embedding_parity():
    from stable_diffusion_videos_tpu.models.layers import \
        timestep_embedding as flax_te
    t = torch.tensor([0.0, 1.0, 42.0, 999.0])
    ours = np.asarray(flax_te(jnp.asarray(t.numpy()), 32))
    theirs = timestep_embedding(t, 32).numpy()
    np.testing.assert_allclose(ours, theirs, **TOL)


def test_resnet_block_parity():
    from stable_diffusion_videos_tpu.models.layers import \
        ResnetBlock2D as FlaxResnet
    tm = ResnetBlock2D(32, 64, temb_dim=128)
    x, temb = rand(2, 32, 8, 8, seed=1), rand(2, 128, seed=2)
    out_t = nhwc(tm(x, temb))

    params = {"params": W._resnet(sd_numpy(tm), "m")}
    fm = FlaxResnet(64)
    out_f = np.asarray(fm.apply(jax.tree.map(jnp.asarray, params),
                                jnp.asarray(nhwc(x)),
                                jnp.asarray(temb.numpy())))
    np.testing.assert_allclose(out_f, out_t, **TOL)


def test_cross_attention_parity():
    from stable_diffusion_videos_tpu.models.layers import \
        CrossAttention as FlaxAttn
    tm = CrossAttention(32, 24, heads=2, head_dim=16)
    x, ctx = rand(2, 10, 32, seed=3), rand(2, 7, 24, seed=4)
    out_t = tm(x, ctx).detach().numpy()

    params = {"params": W._attn_inner(sd_numpy(tm), "m")}
    fm = FlaxAttn(num_heads=2, head_dim=16, out_dim=32)
    out_f = np.asarray(fm.apply(jax.tree.map(jnp.asarray, params),
                                jnp.asarray(x.numpy()),
                                jnp.asarray(ctx.numpy())))
    np.testing.assert_allclose(out_f, out_t, **TOL)


def test_transformer2d_parity():
    from stable_diffusion_videos_tpu.models.layers import SpatialTransformer
    tm = Transformer2DModel(32, ctx_dim=24, heads=2)
    x, ctx = rand(2, 32, 8, 8, seed=5), rand(2, 7, 24, seed=6)
    out_t = nhwc(tm(x, ctx))

    params = {"params": W._transformer(sd_numpy(tm), "m", depth=1)}
    fm = SpatialTransformer(num_heads=2, head_dim=16)
    out_f = np.asarray(fm.apply(jax.tree.map(jnp.asarray, params),
                                jnp.asarray(nhwc(x)),
                                jnp.asarray(ctx.numpy())))
    np.testing.assert_allclose(out_f, out_t, **TOL)


@pytest.mark.parametrize("asymmetric", [False, True],
                         ids=["unet_sym", "vae_asym"])
def test_downsample_parity(asymmetric):
    from stable_diffusion_videos_tpu.models.layers import \
        Downsample2D as FlaxDown
    tm = Downsample2D(32, asymmetric=asymmetric)
    x = rand(2, 32, 8, 8, seed=7)
    out_t = nhwc(tm(x))
    params = {"params": {"conv": W._conv(sd_numpy(tm), "m.conv")}}
    fm = FlaxDown(32, asymmetric=asymmetric)
    out_f = np.asarray(fm.apply(jax.tree.map(jnp.asarray, params),
                                jnp.asarray(nhwc(x))))
    np.testing.assert_allclose(out_f, out_t, **TOL)


def test_downsample_modes_differ():
    """The two padding modes must NOT agree (same shape, different math) —
    guards against silently collapsing them again."""
    tm_sym = Downsample2D(32, asymmetric=False)
    tm_asym = Downsample2D(32, asymmetric=True)
    tm_asym.load_state_dict(tm_sym.state_dict())
    x = rand(2, 32, 8, 8, seed=8)
    assert tm_sym(x).shape == tm_asym(x).shape
    assert not torch.allclose(tm_sym(x), tm_asym(x))


def test_upsample_parity():
    from stable_diffusion_videos_tpu.models.layers import \
        Upsample2D as FlaxUp
    tm = Upsample2D(32)
    x = rand(2, 32, 8, 8, seed=9)
    out_t = nhwc(tm(x))
    params = {"params": {"conv": W._conv(sd_numpy(tm), "m.conv")}}
    out_f = np.asarray(FlaxUp(32).apply(jax.tree.map(jnp.asarray, params),
                                        jnp.asarray(nhwc(x))))
    np.testing.assert_allclose(out_f, out_t, **TOL)


def test_vae_attention_parity():
    from stable_diffusion_videos_tpu.models.layers import VAEAttnBlock
    tm = VAEAttention(32)
    x = rand(2, 32, 8, 8, seed=10)
    out_t = nhwc(tm(x))
    params = {"params": W._vae_attn(sd_numpy(tm), "m")}
    out_f = np.asarray(VAEAttnBlock().apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(nhwc(x))))
    np.testing.assert_allclose(out_f, out_t, **TOL)


# ---------------------------------------------------------------------------
# full-model parity through the production converter
# ---------------------------------------------------------------------------

def test_unet_parity_vs_torch_impl():
    cfg = UNetConfig.tiny()
    tm = TorchUNet(cfg)
    lat = rand(2, cfg.in_channels, 8, 8, seed=11)
    t = torch.tensor([3.0, 977.0])
    ctx = rand(2, 7, cfg.cross_attention_dim, seed=12)
    out_t = nhwc(tm(lat, t, ctx))

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jax.tree.map(jnp.asarray, W.convert_unet(sd, cfg))
    fm = UNet2DCondition(cfg)
    out_f = np.asarray(fm.apply(params, jnp.asarray(nhwc(lat)),
                                jnp.asarray(t.numpy()),
                                jnp.asarray(ctx.numpy())))
    assert out_f.shape == out_t.shape
    np.testing.assert_allclose(out_f, out_t, **TOL)


def test_unet_parity_deeper_config():
    """3-level config exercises skip bookkeeping the tiny config can't."""
    cfg = UNetConfig(sample_size=8, block_out_channels=(32, 64, 64),
                     layers_per_block=2, cross_attention_dim=32,
                     attention_head_dim=2, attn_levels=(True, True, False))
    tm = TorchUNet(cfg)
    lat = rand(1, 4, 8, 8, seed=13)
    t = torch.tensor([500.0])
    ctx = rand(1, 5, 32, seed=14)
    out_t = nhwc(tm(lat, t, ctx))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jax.tree.map(jnp.asarray, W.convert_unet(sd, cfg))
    out_f = np.asarray(UNet2DCondition(cfg).apply(
        params, jnp.asarray(nhwc(lat)), jnp.asarray(t.numpy()),
        jnp.asarray(ctx.numpy())))
    np.testing.assert_allclose(out_f, out_t, **TOL)


def test_unet_parity_sdxl_config():
    """SDXL semantics vs the independent torch transcription: per-level
    transformer depth and the text_time addition embedding (6 sinusoidal
    size/crop embeddings + pooled text through a second MLP into temb)."""
    cfg = UNetConfig.tiny_xl()
    tm = TorchUNet(cfg)
    lat = rand(2, cfg.in_channels, 8, 8, seed=21)
    t = torch.tensor([3.0, 977.0])
    ctx = rand(2, 7, cfg.cross_attention_dim, seed=22)
    te = rand(2, cfg.addition_pooled_dim, seed=23)
    ti = torch.tensor([[64.0, 64, 0, 0, 64, 64], [32.0, 48, 4, 2, 32, 48]])
    out_t = nhwc(tm(lat, t, ctx, te, ti))

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jax.tree.map(jnp.asarray, W.convert_unet(sd, cfg))
    out_f = np.asarray(UNet2DCondition(cfg).apply(
        params, jnp.asarray(nhwc(lat)), jnp.asarray(t.numpy()),
        jnp.asarray(ctx.numpy()), jnp.asarray(te.numpy()),
        jnp.asarray(ti.numpy())))
    assert out_f.shape == out_t.shape
    np.testing.assert_allclose(out_f, out_t, **TOL)


def test_vae_parity_vs_torch_impl():
    cfg = VAEConfig.tiny()
    tm = TorchVAE(cfg)
    img = rand(2, 3, 16, 16, seed=15, scale=0.5)
    mean_t, logvar_t = tm.encode_moments(img)
    dec_t = tm.decode(mean_t)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jax.tree.map(jnp.asarray, W.convert_vae(sd, cfg))
    fm = AutoencoderKL(cfg)
    mean_f, logvar_f = fm.apply(params, jnp.asarray(nhwc(img)),
                                method=AutoencoderKL.encode)
    np.testing.assert_allclose(np.asarray(mean_f), nhwc(mean_t), **TOL)
    np.testing.assert_allclose(np.asarray(logvar_f), nhwc(logvar_t), **TOL)
    dec_f = fm.apply(params, mean_f, method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(dec_f), nhwc(dec_t), **TOL)


# ---------------------------------------------------------------------------
# ControlNet parity (models/controlnet.py + convert_controlnet)
# ---------------------------------------------------------------------------

def _perturbed_torch_controlnet(cfg, cond_channels, seed=0):
    """TorchControlNet with its zero-init layers re-drawn so the converter
    and tap paths carry real signal."""
    from torch_sd_ref import TorchControlNet
    torch.manual_seed(seed)
    tm = TorchControlNet(cfg, cond_channels)
    with torch.no_grad():
        for zc in list(tm.controlnet_down_blocks) + [tm.controlnet_mid_block]:
            zc.weight.normal_(0, 0.05)
            zc.bias.normal_(0, 0.05)
        tm.controlnet_cond_embedding.conv_out.weight.normal_(0, 0.05)
        tm.controlnet_cond_embedding.conv_out.bias.normal_(0, 0.05)
    return tm.eval()


def test_controlnet_parity():
    """Residuals of the Flax ControlNet (converted weights) match the torch
    transcription, and the controlled UNet forwards agree end to end."""
    from stable_diffusion_videos_tpu.models.controlnet import ControlNet
    from torch_sd_ref import TorchUNet

    cfg = UNetConfig(sample_size=8, block_out_channels=(32, 64),
                     layers_per_block=2, cross_attention_dim=32,
                     attention_head_dim=2, attn_levels=(True, False))
    cond_channels = (8, 16)  # one stride-2: control image at 2x latent res
    tm = _perturbed_torch_controlnet(cfg, cond_channels, seed=11)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jax.tree.map(jnp.asarray,
                          W.convert_controlnet(sd, cfg, cond_channels))
    fm = ControlNet(cfg, cond_channels=cond_channels)

    lat = rand(2, cfg.in_channels, 8, 8, seed=21)
    cond = torch.rand(2, 3, 16, 16,
                      generator=torch.Generator().manual_seed(22))
    ctx = rand(2, 7, cfg.cross_attention_dim, seed=23)
    t = torch.tensor([4.0, 17.0])
    scale = 0.8
    with torch.no_grad():
        down_t, mid_t = tm(lat, t, ctx, cond, conditioning_scale=scale)
    down_f, mid_f = fm.apply(
        params, jnp.asarray(nhwc(lat)), jnp.asarray(t.numpy()),
        jnp.asarray(ctx.numpy()), jnp.asarray(nhwc(cond)),
        conditioning_scale=scale)
    assert len(down_f) == len(down_t)
    for df, dt in zip(down_f, down_t):
        np.testing.assert_allclose(np.asarray(df), nhwc(dt), **TOL)
    np.testing.assert_allclose(np.asarray(mid_f), nhwc(mid_t), **TOL)

    # full controlled-UNet forward parity
    torch.manual_seed(31)
    tunet = TorchUNet(cfg).eval()
    usd = {k: v.detach().numpy() for k, v in tunet.state_dict().items()}
    uparams = jax.tree.map(jnp.asarray, W.convert_unet(usd, cfg))
    from stable_diffusion_videos_tpu.models.unet import UNet2DCondition
    funet = UNet2DCondition(cfg)
    with torch.no_grad():
        out_t = tunet(lat, t, ctx, ctrl_down=down_t, ctrl_mid=mid_t)
    out_f = funet.apply(uparams, jnp.asarray(nhwc(lat)),
                        jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()),
                        ctrl_down=down_f, ctrl_mid=mid_f)
    np.testing.assert_allclose(np.asarray(out_f), nhwc(out_t),
                               atol=2e-4, rtol=2e-4)
