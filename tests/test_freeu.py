"""FreeU (Si et al. 2023): Fourier low-pass filter parity vs a torch
transcription, neutral-factor identity, and pipeline plumbing.

Training-free re-weighting of the UNet's up path — backbone half-channels
amplified, skip low frequencies damped — applied at the two deepest up
blocks (models/unet.py ``freeu``).  Beyond the reference's feature set.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stable_diffusion_videos_tpu.models.bundle import SDModels
from stable_diffusion_videos_tpu.models.unet import (UNet2DCondition,
                                                     UNetConfig,
                                                     fourier_lowpass_scale)


def test_fourier_filter_matches_torch_transcription():
    """Our NHWC filter == an independent transcription of the published
    NCHW fourier_filter (FFT -> centred low-band scale -> iFFT)."""
    torch = pytest.importorskip("torch")

    def torch_fourier_filter(x, threshold, scale):
        B, C, H, W = x.shape
        x_freq = torch.fft.fftn(x, dim=(-2, -1))
        x_freq = torch.fft.fftshift(x_freq, dim=(-2, -1))
        mask = torch.ones_like(x_freq.real)
        crow, ccol = H // 2, W // 2
        mask[..., crow - threshold:crow + threshold,
             ccol - threshold:ccol + threshold] = scale
        x_freq = x_freq * mask
        x_freq = torch.fft.ifftshift(x_freq, dim=(-2, -1))
        return torch.fft.ifftn(x_freq, dim=(-2, -1)).real

    g = torch.Generator().manual_seed(3)
    xt = torch.randn(2, 5, 8, 8, generator=g)
    for thr, s in ((1, 0.2), (1, 0.9), (2, 0.5)):
        want = torch_fourier_filter(xt, thr, s).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(fourier_lowpass_scale(
            jnp.asarray(xt.numpy().transpose(0, 2, 3, 1)), thr, s))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = UNetConfig.tiny()
    params = UNet2DCondition(cfg).init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.sample_size, cfg.sample_size, cfg.in_channels)),
        jnp.zeros((1,)), jnp.zeros((1, 7, cfg.cross_attention_dim)))
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    lat = jax.random.normal(ks[0], (2, cfg.sample_size, cfg.sample_size,
                                    cfg.in_channels))
    ctx = jax.random.normal(ks[1], (2, 7, cfg.cross_attention_dim))
    t = jnp.asarray([5.0, 9.0])
    return cfg, params, lat, t, ctx


def test_neutral_factors_are_identity(tiny_setup):
    cfg, params, lat, t, ctx = tiny_setup
    base = UNet2DCondition(cfg).apply(params, lat, t, ctx)
    neutral = UNet2DCondition(cfg, freeu=(1.0, 1.0, 1.0, 1.0)).apply(
        params, lat, t, ctx)
    np.testing.assert_allclose(np.asarray(neutral), np.asarray(base),
                               atol=1e-4, rtol=1e-4)


def test_freeu_changes_output(tiny_setup):
    cfg, params, lat, t, ctx = tiny_setup
    base = UNet2DCondition(cfg).apply(params, lat, t, ctx)
    boosted = UNet2DCondition(cfg, freeu=(1.5, 1.6, 0.9, 0.2)).apply(
        params, lat, t, ctx)
    assert float(jnp.abs(boosted - base).max()) > 1e-4


def test_family_defaults():
    m1 = SDModels.tiny().with_freeu(True)  # SD1.x-flavoured (ctx 32)
    assert m1.freeu == (1.5, 1.6, 0.9, 0.2)
    assert m1.unet().freeu == m1.freeu
    mx = SDModels.tiny_xl().with_freeu(True)
    assert mx.freeu == (1.3, 1.4, 0.9, 0.2)
    off = m1.with_freeu(None)
    assert off.freeu is None
    with pytest.raises(ValueError, match="b1, b2"):
        SDModels.tiny().with_freeu((1.0, 2.0))


def test_pipeline_freeu_runs(tmp_path):
    from stable_diffusion_videos_tpu.pipeline import \
        StableDiffusionWalkPipeline
    pipe = StableDiffusionWalkPipeline(SDModels.tiny(), scheduler="ddim",
                                       freeu=True)
    assert pipe.models.freeu == (1.5, 1.6, 0.9, 0.2)
    pipe.walk(prompts=["a", "b"], seeds=[1, 2], num_interpolation_steps=2,
              output_dir=str(tmp_path), name="fu", num_inference_steps=2,
              make_video=False)
    assert len(list((tmp_path / "fu" / "fu_000000").glob("frame*.png"))) == 2
