"""Weight converter tests.

1. Round-trip: our params -> diffusers-named state dict -> back must be the
   identity (names, shapes, values), for UNet, VAE and CLIP text.
2. Numerical parity: our CLIP text encoder with weights converted FROM a real
   ``transformers.CLIPTextModel`` (random-init, tiny config) must reproduce
   its hidden states — true cross-framework validation, since transformers
   IS the library the reference uses for this model (SURVEY.md §2.2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_videos_tpu.models import (AutoencoderKL, CLIPTextConfig,
                                                CLIPTextEncoder,
                                                UNet2DCondition, UNetConfig,
                                                VAEConfig)
from stable_diffusion_videos_tpu.models import weights as W


def _tree_equal(a, b, path=""):
    assert set(a.keys()) == set(b.keys()), (
        f"{path}: {set(a) ^ set(b)} differ")
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=f"{path}/{k}")


def test_unet_roundtrip():
    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                        jnp.zeros((1,)), jnp.zeros((1, 7, 32)))
    sd = W.export_unet(params, cfg)
    back = W.convert_unet(sd, cfg)
    _tree_equal(jax.tree.map(np.asarray, dict(params)), back)


def test_vae_roundtrip():
    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    sd = W.export_vae(params, cfg)
    back = W.convert_vae(sd, cfg)
    _tree_equal(jax.tree.map(np.asarray, dict(params)), back)


def test_text_encoder_roundtrip():
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    sd = W.export_text_encoder(params, cfg)
    back = W.convert_text_encoder(sd, cfg)
    _tree_equal(jax.tree.map(np.asarray, dict(params)), back)


def test_clip_text_parity_vs_transformers():
    """Convert weights from a real transformers CLIPTextModel and compare
    forward outputs — validates naming AND math against the ground truth."""
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf_model = transformers.CLIPTextModel(hf_cfg).eval()

    ids = np.array([[49406 % 100, 5, 9, 3, 49407 % 100] + [0] * 72,
                    [2, 7, 1, 49407 % 100, 0] + [0] * 72], np.int32)
    with torch.no_grad():
        want = hf_model(torch.tensor(ids, dtype=torch.long)
                        ).last_hidden_state.numpy()

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32,
                         intermediate_size=64, num_layers=2, num_heads=2)
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = W._to_jnp(W.convert_text_encoder(sd, cfg))
    got, _ = CLIPTextEncoder(cfg).apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-4)


def test_unet_config_from_json_sd14():
    cfg = W._unet_config_from_json({
        "sample_size": 64, "in_channels": 4, "out_channels": 4,
        "block_out_channels": [320, 640, 1280, 1280],
        "layers_per_block": 2, "cross_attention_dim": 768,
        "attention_head_dim": 8,
        "down_block_types": ["CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                             "CrossAttnDownBlock2D", "DownBlock2D"],
    })
    assert cfg.block_out_channels == (320, 640, 1280, 1280)
    assert cfg.attn_levels == (True, True, True, False)


def test_rrdbnet_roundtrip_shapes():
    """Converter accepts a synthetic RealESRGAN-style state dict."""
    from stable_diffusion_videos_tpu.models.rrdbnet import (RRDBNet,
                                                            RRDBNetConfig)
    cfg = RRDBNetConfig.tiny()
    # build a synthetic torch-style state dict with the official names
    rng = np.random.default_rng(0)

    def conv(o, i):
        return rng.standard_normal((o, i, 3, 3), np.float32)

    nf, g = cfg.num_feat, cfg.num_grow_ch
    sd = {"conv_first.weight": conv(nf, 3), "conv_first.bias": np.zeros(nf, np.float32)}
    for name, (o, i) in {"conv_body": (nf, nf), "conv_up1": (nf, nf),
                         "conv_up2": (nf, nf), "conv_hr": (nf, nf),
                         "conv_last": (3, nf)}.items():
        sd[f"{name}.weight"] = conv(o, i)
        sd[f"{name}.bias"] = np.zeros(o, np.float32)
    for b in range(cfg.num_block):
        for r in (1, 2, 3):
            for c in range(1, 6):
                i = nf + (c - 1) * g
                o = g if c < 5 else nf
                sd[f"body.{b}.rdb{r}.conv{c}.weight"] = conv(o, i)
                sd[f"body.{b}.rdb{r}.conv{c}.bias"] = np.zeros(o, np.float32)

    params = W._to_jnp(W.convert_rrdbnet(sd, cfg))
    ref = RRDBNet(cfg).init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    got_shapes = jax.tree.map(lambda x: x.shape, params)
    want_shapes = jax.tree.map(lambda x: x.shape, dict(ref))
    assert got_shapes == want_shapes
    out = RRDBNet(cfg).apply(params, jnp.zeros((1, 8, 8, 3)))
    assert out.shape == (1, 32, 32, 3)


@pytest.mark.parametrize("scale", [4, 2])
def test_rrdbnet_parity_vs_torch_transcription(scale):
    """RRDBNet vs an independent torch transcription of the basicsr
    architecture the reference's upsampler wraps (``upsampling.py:17-28``):
    converted random weights must reproduce the output, including the
    pixel-unshuffle input path the x2plus checkpoint relies on."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from torch import nn as tnn

    from stable_diffusion_videos_tpu.models.rrdbnet import (RRDBNet,
                                                            RRDBNetConfig)
    nf, g, nb = 16, 8, 2

    class TRDB(tnn.Module):
        def __init__(self):
            super().__init__()
            for c in range(1, 6):
                i, o = nf + (c - 1) * g, g if c < 5 else nf
                setattr(self, f"conv{c}", tnn.Conv2d(i, o, 3, 1, 1))

        def forward(self, x):
            act = lambda t: F.leaky_relu(t, 0.2)
            x1 = act(self.conv1(x))
            x2 = act(self.conv2(torch.cat([x, x1], 1)))
            x3 = act(self.conv3(torch.cat([x, x1, x2], 1)))
            x4 = act(self.conv4(torch.cat([x, x1, x2, x3], 1)))
            x5 = self.conv5(torch.cat([x, x1, x2, x3, x4], 1))
            return x5 * 0.2 + x

    class TRRDB(tnn.Module):
        def __init__(self):
            super().__init__()
            self.rdb1, self.rdb2, self.rdb3 = TRDB(), TRDB(), TRDB()

        def forward(self, x):
            return self.rdb3(self.rdb2(self.rdb1(x))) * 0.2 + x

    class TNet(tnn.Module):
        def __init__(self):
            super().__init__()
            in_ch = 3 * {4: 1, 2: 4, 1: 16}[scale]
            self.conv_first = tnn.Conv2d(in_ch, nf, 3, 1, 1)
            self.body = tnn.ModuleList(TRRDB() for _ in range(nb))
            for name, (i, o) in {"conv_body": (nf, nf), "conv_up1": (nf, nf),
                                 "conv_up2": (nf, nf), "conv_hr": (nf, nf),
                                 "conv_last": (nf, 3)}.items():
                setattr(self, name, tnn.Conv2d(i, o, 3, 1, 1))

        def forward(self, x):
            if scale == 2:
                x = F.pixel_unshuffle(x, 2)
            act = lambda t: F.leaky_relu(t, 0.2)
            feat = self.conv_first(x)
            body = feat
            for blk in self.body:
                body = blk(body)
            feat = feat + self.conv_body(body)
            up = lambda t: F.interpolate(t, scale_factor=2, mode="nearest")
            feat = act(self.conv_up1(up(feat)))
            feat = act(self.conv_up2(up(feat)))
            return self.conv_last(act(self.conv_hr(feat)))

    torch.manual_seed(scale)
    tmodel = TNet()
    # center the output inside (0,1) so the flax-side clip stays inactive
    with torch.no_grad():
        tmodel.conv_last.weight *= 0.05
        tmodel.conv_last.bias[:] = 0.5
    x = torch.rand(1, 3, 16, 16)
    with torch.no_grad():
        want = tmodel(x).clamp(0, 1).numpy().transpose(0, 2, 3, 1)
    assert ((want > 0.01) & (want < 0.99)).mean() > 0.5  # clip inactive

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    cfg = RRDBNetConfig(num_feat=nf, num_block=nb, num_grow_ch=g, scale=scale)
    params = W._to_jnp(W.convert_rrdbnet(sd, cfg))
    got = RRDBNet(cfg).apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)
    assert got.shape == (1, 16 * scale, 16 * scale, 3)


def test_clip_vision_parity_vs_transformers():
    """Safety-checker vision tower vs a real transformers CLIPVisionModel
    (random init, tiny config): converted weights must reproduce the pooled
    (pre-projection) output."""
    torch = pytest.importorskip("torch")
    import transformers

    from stable_diffusion_videos_tpu.models.safety import (CLIPVisionConfig,
                                                           CLIPVisionEncoder)

    hf_cfg = transformers.CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModel(hf_cfg).eval()

    rng = np.random.default_rng(0)
    pix = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.tensor(pix.transpose(0, 3, 1, 2))
                  ).pooler_output.numpy()

    cfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                           intermediate_size=64, num_layers=2, num_heads=2)
    sd = {f"vision_model.{k}": v.numpy() for k, v in hf.state_dict().items()}
    # reuse the safety-checker converter's vision section
    from stable_diffusion_videos_tpu.models import weights as W

    class _Cfg:
        vision = cfg
    vis_params = W.convert_safety_checker(
        {**sd,
         "visual_projection.weight": np.zeros((16, 32), np.float32),
         "concept_embeds": np.zeros((17, 16), np.float32),
         "concept_embeds_weights": np.zeros((17,), np.float32),
         "special_care_embeds": np.zeros((3, 16), np.float32),
         "special_care_embeds_weights": np.zeros((3,), np.float32)},
        _Cfg)["params"]["vision_model"]

    got = CLIPVisionEncoder(cfg).apply({"params": vis_params},
                                       jnp.asarray(pix))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=3e-4)


def test_resolve_checkpoint_hub_id(monkeypatch, tmp_path):
    """Hub-id loading path (reference from_pretrained('CompVis/...'),
    stable_diffusion_pipeline.py:856-858) behind a network guard."""
    import huggingface_hub

    calls = {}

    def fake_snapshot_download(repo_id, revision=None, cache_dir=None,
                               allow_patterns=None):
        calls["repo_id"] = repo_id
        calls["allow_patterns"] = allow_patterns
        return str(tmp_path)

    monkeypatch.setattr(huggingface_hub, "snapshot_download",
                        fake_snapshot_download)
    got = W.resolve_checkpoint("CompVis/stable-diffusion-v1-4")
    assert str(got) == str(tmp_path)
    assert calls["repo_id"] == "CompVis/stable-diffusion-v1-4"
    assert "*.safetensors" in calls["allow_patterns"]


def test_resolve_checkpoint_offline_error(monkeypatch):
    import huggingface_hub

    def boom(*a, **k):
        raise ConnectionError("no egress")

    monkeypatch.setattr(huggingface_hub, "snapshot_download", boom)
    with pytest.raises(FileNotFoundError, match="offline or repo missing"):
        W.resolve_checkpoint("CompVis/stable-diffusion-v1-4")


def test_resolve_checkpoint_local_and_bogus(tmp_path):
    assert W.resolve_checkpoint(str(tmp_path)) == tmp_path
    with pytest.raises(FileNotFoundError, match="neither a local"):
        W.resolve_checkpoint("/no/such/dir/anywhere")


def test_clip_text_gelu_parity_vs_transformers():
    """SD2.x text tower (OpenCLIP-H style: plain gelu) numerically validated
    against transformers with hidden_act='gelu'."""
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="gelu")
    torch.manual_seed(1)
    hf_model = transformers.CLIPTextModel(hf_cfg).eval()

    ids = np.array([[1, 5, 9, 3, 98] + [0] * 72], np.int32)
    with torch.no_grad():
        want = hf_model(torch.tensor(ids, dtype=torch.long)
                        ).last_hidden_state.numpy()

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32,
                         intermediate_size=64, num_layers=2, num_heads=2,
                         hidden_act="gelu")
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = W._to_jnp(W.convert_text_encoder(sd, cfg))
    got, _ = CLIPTextEncoder(cfg).apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-4)


def test_unet_config_from_json_sd21():
    """SD2.x config parses with per-level head counts preserved."""
    cfg = W._unet_config_from_json({
        "sample_size": 96, "block_out_channels": [320, 640, 1280, 1280],
        "cross_attention_dim": 1024, "attention_head_dim": [5, 10, 20, 20],
        "down_block_types": ["CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                             "CrossAttnDownBlock2D", "DownBlock2D"],
    })
    assert cfg.attention_head_dim == (5, 10, 20, 20)
    assert cfg.heads(0) == 5 and cfg.heads(3) == 20
    assert cfg.cross_attention_dim == 1024


def test_unet_sd2_style_roundtrip():
    """Tiny UNet with PER-LEVEL heads (the SD2.x shape) converts and
    round-trips through the diffusers naming."""
    import jax

    cfg = UNetConfig(sample_size=8, block_out_channels=(32, 64),
                     layers_per_block=1, cross_attention_dim=16,
                     attention_head_dim=(2, 4), attn_levels=(True, True))
    unet = UNet2DCondition(cfg)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                       jnp.zeros((1,)), jnp.zeros((1, 7, 16)))
    out = unet.apply(params, jnp.ones((2, 8, 8, 4)),
                     jnp.array([1.0, 2.0]), jnp.ones((2, 7, 16)))
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    sd = W.export_unet(params, cfg)
    back = W._to_jnp(W.convert_unet({k: np.asarray(v) for k, v in sd.items()},
                                    cfg))
    out2 = unet.apply(back, jnp.ones((2, 8, 8, 4)),
                      jnp.array([1.0, 2.0]), jnp.ones((2, 7, 16)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)
