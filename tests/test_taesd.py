"""TAESD tiny autoencoder: architecture/converter parity vs an independent
torch transcription of the upstream model (madebyollin/taesd — Sequential
of Clamp/conv/Block/Upsample), plus engine integration of the
``tiny_decoder=True`` decode path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_videos_tpu.models.bundle import SDModels
from stable_diffusion_videos_tpu.models.taesd import (
    TAESDConfig, TAESDDecoder, TAESDEncoder, convert_taesd_decoder,
    convert_taesd_encoder, infer_taesd_config)

torch = pytest.importorskip("torch")
tnn = torch.nn


# ----------------------------------------------------------------------
# independent torch transcription of the upstream TAESD Sequential
# ----------------------------------------------------------------------
def _conv(a, b, **kw):
    return tnn.Conv2d(a, b, 3, padding=1, **kw)


class _Clamp(tnn.Module):
    def forward(self, x):
        return torch.tanh(x / 3) * 3


class _Block(tnn.Module):
    def __init__(self, n):
        super().__init__()
        self.conv = tnn.Sequential(_conv(n, n), tnn.ReLU(), _conv(n, n),
                                   tnn.ReLU(), _conv(n, n))
        self.fuse = tnn.ReLU()

    def forward(self, x):
        return self.fuse(self.conv(x) + x)


def torch_decoder(cfg: TAESDConfig) -> tnn.Sequential:
    n = cfg.width
    layers = [_Clamp(), _conv(cfg.latent_channels, n), tnn.ReLU()]
    for _ in range(cfg.num_stages):
        layers += [_Block(n) for _ in range(cfg.blocks_per_stage)]
        layers += [tnn.Upsample(scale_factor=2), _conv(n, n, bias=False)]
    layers += [_Block(n), _conv(n, cfg.image_channels)]
    return tnn.Sequential(*layers)


def torch_encoder(cfg: TAESDConfig) -> tnn.Sequential:
    n = cfg.width
    layers = [_conv(cfg.image_channels, n), _Block(n)]
    for _ in range(cfg.num_stages):
        layers += [_conv(n, n, stride=2, bias=False)]
        layers += [_Block(n) for _ in range(cfg.blocks_per_stage)]
    layers += [_conv(n, cfg.latent_channels)]
    return tnn.Sequential(*layers)


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


@pytest.mark.parametrize("cfg", [TAESDConfig.tiny(),
                                 TAESDConfig(width=8, num_stages=3,
                                             blocks_per_stage=3)],
                         ids=["tiny", "sd-shape"])
def test_decoder_torch_parity(cfg):
    torch.manual_seed(0)
    tdec = torch_decoder(cfg)
    got_cfg, params = convert_taesd_decoder(_sd(tdec))
    assert got_cfg == cfg  # geometry inferred from the state dict alone
    z = np.random.default_rng(0).standard_normal((2, 6, 5, 4)) \
        .astype(np.float32) * 2.0
    with torch.no_grad():
        want = tdec(torch.from_numpy(z.transpose(0, 3, 1, 2))) \
            .numpy().transpose(0, 2, 3, 1)
    got = np.asarray(TAESDDecoder(cfg).apply(params, jnp.asarray(z)))
    assert got.shape == (2, 6 * cfg.scale_factor, 5 * cfg.scale_factor, 3)
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("cfg", [TAESDConfig.tiny(),
                                 TAESDConfig(width=8, num_stages=3,
                                             blocks_per_stage=3)],
                         ids=["tiny", "sd-shape"])
def test_encoder_torch_parity(cfg):
    torch.manual_seed(1)
    tenc = torch_encoder(cfg)
    _, params = convert_taesd_encoder(_sd(tenc), cfg)
    f = cfg.scale_factor
    x = np.random.default_rng(1).random((2, 6 * f, 5 * f, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        want = tenc(torch.from_numpy(x.transpose(0, 3, 1, 2))) \
            .numpy().transpose(0, 2, 3, 1)
    got = np.asarray(TAESDEncoder(cfg).apply(params, jnp.asarray(x)))
    assert got.shape == (2, 6, 5, cfg.latent_channels)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_combined_diffusers_layout():
    """A single AutoencoderTiny-style file (encoder.layers.* +
    decoder.layers.*) splits into both halves."""
    cfg = TAESDConfig.tiny()
    torch.manual_seed(2)
    sd = {f"decoder.layers.{k}": v for k, v in _sd(torch_decoder(cfg)).items()}
    sd.update({f"encoder.layers.{k}": v
               for k, v in _sd(torch_encoder(cfg)).items()})
    got_cfg, dec = convert_taesd_decoder(sd)
    assert got_cfg == cfg
    _, enc = convert_taesd_encoder(sd, cfg)
    z = jnp.ones((1, 4, 4, 4))
    img = TAESDDecoder(cfg).apply(dec, z)
    assert img.shape == (1, 8, 8, 3)
    lat = TAESDEncoder(cfg).apply(enc, img)
    assert lat.shape == (1, 4, 4, 4)


def test_infer_config_sd_geometry():
    cfg = TAESDConfig.sd()
    assert cfg.scale_factor == 8
    torch.manual_seed(3)
    small = TAESDConfig(width=8)  # SD stage structure at test width
    assert infer_taesd_config(_sd(torch_decoder(small))) == small


# ----------------------------------------------------------------------
# engine integration
# ----------------------------------------------------------------------
def _taesd_bundle():
    models = SDModels.tiny()
    cfg = TAESDConfig.tiny()
    f = models.vae_scale_factor
    assert cfg.scale_factor == f
    dec = TAESDDecoder(cfg).init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 4, 4, 4)))
    return models.with_taesd((cfg, {"taesd_decoder": dec}))


def test_engine_tiny_decoder_end_to_end():
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    models = _taesd_bundle()
    eng = Engine(models, scheduler="ddim", tiny_decoder=True)
    B, s = 4, models.unet_config.sample_size
    cond = jnp.zeros((B, 77, models.unet_config.cross_attention_dim))
    noise = jax.random.normal(jax.random.PRNGKey(1), (B, s, s, 4))
    imgs = eng.denoise_frames(cond, cond[:1], noise,
                              num_inference_steps=3)
    side = s * models.vae_scale_factor
    assert imgs.shape == (B, side, side, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # decode_latents must route through the tiny decoder too (same params)
    lat = jax.random.normal(jax.random.PRNGKey(2), (B, s, s, 4))
    via_engine = eng.decode_latents(lat)
    direct = np.clip(np.asarray(
        models.taesd_decoder().apply(models.params["taesd_decoder"], lat),
        np.float32), 0, 1)
    np.testing.assert_allclose(via_engine, direct, atol=1e-5)


def test_tiny_decoder_requires_weights():
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    with pytest.raises(ValueError, match="TAESD"):
        Engine(SDModels.tiny(), tiny_decoder=True)


def test_with_taesd_factor_mismatch():
    models = SDModels.tiny()  # VAE factor 2
    cfg = TAESDConfig.sd()    # factor 8
    dec = TAESDDecoder(cfg).init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 2, 2, 4)))
    with pytest.raises(ValueError, match="does not match"):
        models.with_taesd((cfg, {"taesd_decoder": dec}))


def test_bundle_roundtrip_keeps_taesd(tmp_path):
    models = _taesd_bundle()
    models.save(tmp_path / "b")
    loaded = SDModels.load(tmp_path / "b")
    assert loaded.taesd_config == models.taesd_config
    assert "taesd_decoder" in loaded.params
    z = jnp.ones((1, 4, 4, 4))
    np.testing.assert_allclose(
        np.asarray(loaded.taesd_decoder().apply(
            loaded.params["taesd_decoder"], z)),
        np.asarray(models.taesd_decoder().apply(
            models.params["taesd_decoder"], z)), atol=1e-6)


def test_tiny_decoder_with_vae_tile_decodes_in_program():
    """vae_tile set + tiny decoder: decode fuses in-program (no host
    tiling hop) and still matches the direct tiny decode."""
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    models = _taesd_bundle()
    eng = Engine(models, scheduler="ddim", vae_tile=4,
                 tiny_decoder=True)
    B, s = 4, models.unet_config.sample_size
    cond = jnp.zeros((B, 77, models.unet_config.cross_attention_dim))
    noise = jax.random.normal(jax.random.PRNGKey(1), (B, s, s, 4))
    imgs = eng.denoise_frames(cond, cond[:1], noise, num_inference_steps=2)
    assert imgs.shape == (B, s * 2, s * 2, 3)
