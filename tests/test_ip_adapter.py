"""IP-Adapter: no-op invariant, steering, scale semantics, converter, and
pipeline plumbing (models/ip_adapter.py; beyond the reference's feature set).

Mirrors the ControlNet test discipline: a zero-init adapter must be an
EXACT no-op, a perturbed one must steer, and scale 0 must recover the
unconditioned output bit-for-bit."""

import numpy as np
import pytest

from stable_diffusion_videos_tpu.models.bundle import SDModels
from stable_diffusion_videos_tpu.models.ip_adapter import (
    IPAdapter, attn2_scopes, load_ip_adapter)
from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline


@pytest.fixture(scope="module")
def models():
    return SDModels.tiny()


@pytest.fixture(scope="module")
def plain(models):
    return StableDiffusionWalkPipeline(models, scheduler="ddim")


def _image():
    rng = np.random.default_rng(3)
    return (rng.uniform(0, 1, (16, 16, 3)) * 255).astype(np.uint8)


def test_attn2_scopes_counts(models):
    from stable_diffusion_videos_tpu.models.unet import UNetConfig
    # tiny: attn on level 0 only, 1 layer/block, depth 1 ->
    # 1 down + 2 up + 1 mid
    assert len(attn2_scopes(models.unet_config)) == 4
    # SD1.x: 16 cross-attentions (6 down + 9 up + 1 mid) — matches the 32
    # ip_adapter keys of the official sd15 checkpoint (16 K + 16 V)
    assert len(attn2_scopes(UNetConfig.sd_v1())) == 16
    # mid is LAST (diffusers module-registration order: down, up, mid)
    assert attn2_scopes(models.unet_config)[-1][0] == "mid_attn"


def test_zero_adapter_is_noop(models, plain):
    """Zero to_k_ip/to_v_ip -> the image attention contributes exactly 0."""
    ip = StableDiffusionWalkPipeline(models, scheduler="ddim",
                                     ip_adapter=IPAdapter.tiny())
    img = _image()
    kw = dict(strength=0.6, num_inference_steps=3, seed=5,
              guidance_scale=2.0, output_type="np")
    base = plain.img2img(img, "a scene", **kw)
    with_ip = ip.img2img(img, "a scene", ip_image=_image(), ip_scale=1.0,
                         **kw)
    np.testing.assert_array_equal(base, with_ip)


def test_perturbed_adapter_steers(models):
    pipe = StableDiffusionWalkPipeline(
        models, scheduler="ddim", ip_adapter=IPAdapter.tiny(perturb=True))
    img = _image()
    kw = dict(strength=0.6, num_inference_steps=3, seed=5,
              guidance_scale=2.0, output_type="np")
    on = pipe.img2img(img, "a scene", ip_image=_image(), ip_scale=1.0, **kw)
    off = pipe.img2img(img, "a scene", ip_image=_image(), ip_scale=0.0, **kw)
    assert np.abs(on - off).max() > 1e-5


def test_scale_zero_matches_no_adapter(models, plain):
    """ip_scale=0 recovers the plain pipeline's output (same program
    topology, the image branch multiplied out)."""
    pipe = StableDiffusionWalkPipeline(
        models, scheduler="ddim", ip_adapter=IPAdapter.tiny(perturb=True))
    img = _image()
    kw = dict(strength=0.6, num_inference_steps=3, seed=5,
              guidance_scale=2.0, output_type="np")
    base = plain.img2img(img, "a scene", **kw)
    off = pipe.img2img(img, "a scene", ip_image=_image(), ip_scale=0.0, **kw)
    np.testing.assert_allclose(base, off, atol=1e-5)


def test_no_image_dispatch_on_ip_engine(models, tmp_path):
    """An IP engine with no image prompt this request pins scale to 0 —
    txt2img/walk requests keep working unchanged."""
    pipe = StableDiffusionWalkPipeline(
        models, scheduler="ddim", ip_adapter=IPAdapter.tiny(perturb=True))
    out = pipe.walk(prompts=["a", "b"], seeds=[1, 2],
                    num_interpolation_steps=2, num_inference_steps=2,
                    make_video=False, output_dir=str(tmp_path), name="noip",
                    batch_size=2)
    assert out is not None


def test_ip_image_without_adapter_raises(plain):
    with pytest.raises(ValueError, match="ip_adapter"):
        plain.img2img(_image(), "p", ip_image=_image(),
                      num_inference_steps=2)


def test_walk_with_image_prompt(models, tmp_path):
    pipe = StableDiffusionWalkPipeline(
        models, scheduler="ddim", ip_adapter=IPAdapter.tiny(perturb=True))
    anchor = _image()
    outs = {}
    for scale in (0.0, 1.0):
        pipe.walk(prompts=["a", "b"], seeds=[1, 2],
                  num_interpolation_steps=2, num_inference_steps=2,
                  output_dir=str(tmp_path), name=f"s{scale}",
                  make_video=False, batch_size=2,
                  ip_image=anchor, ip_scale=scale)
        from PIL import Image
        outs[scale] = np.asarray(Image.open(
            next((tmp_path / f"s{scale}").glob("**/frame000000.png"))))
    assert np.abs(outs[0.0].astype(int) - outs[1.0].astype(int)).max() > 0


def test_vid2vid_with_image_prompt(models):
    pipe = StableDiffusionWalkPipeline(
        models, scheduler="ddim", ip_adapter=IPAdapter.tiny(perturb=True))
    src = [np.zeros((32, 32, 3), np.uint8)] * 2
    out = pipe.vid2vid(src, "p", strength=0.5, num_inference_steps=2,
                       batch_size=2, ip_image=_image(), ip_scale=0.8,
                       output_type="frames")
    assert len(out) == 2


def test_splice_rejects_wrong_geometry(models):
    from stable_diffusion_videos_tpu.models.unet import UNetConfig
    bad = IPAdapter.tiny(UNetConfig(
        sample_size=8, block_out_channels=(16, 48), layers_per_block=1,
        cross_attention_dim=32, attention_head_dim=2,
        attn_levels=(True, False)))
    with pytest.raises(ValueError, match="wrong adapter|level width"):
        bad.splice(models)


def test_image_tokens_shapes(models):
    ip = IPAdapter.tiny(perturb=True)
    tok = ip.image_tokens(_image())
    assert tok.shape == (1, 4, models.unet_config.cross_attention_dim)
    un = ip.uncond_tokens()
    assert un.shape == tok.shape
    # (with TRAINED weights the zero-embed projection is nonzero through the
    # bias; random init has a zero bias so only the shape is asserted here)
    # embeds path bypasses the vision tower
    tok2 = ip.image_tokens(image_embeds=np.zeros((1, ip.embed_dim),
                                                 np.float32))
    np.testing.assert_allclose(tok2, un, atol=1e-6)


def test_converter_roundtrip(models, tmp_path):
    """Official checkpoint layout (nested torch .bin) -> bundle whose
    projection matches a manual numpy evaluation, splice-compatible."""
    import torch
    ucfg = models.unet_config
    scopes = attn2_scopes(ucfg)
    rng = np.random.default_rng(0)
    embed_dim, cross, ntok = 16, ucfg.cross_attention_dim, 4
    proj_w = rng.normal(0, 0.1, (cross * ntok, embed_dim)).astype(np.float32)
    proj_b = rng.normal(0, 0.1, (cross * ntok,)).astype(np.float32)
    norm_w = rng.normal(1, 0.1, (cross,)).astype(np.float32)
    norm_b = rng.normal(0, 0.1, (cross,)).astype(np.float32)
    sd = {"image_proj": {
        "proj.weight": torch.tensor(proj_w),
        "proj.bias": torch.tensor(proj_b),
        "norm.weight": torch.tensor(norm_w),
        "norm.bias": torch.tensor(norm_b)},
        "ip_adapter": {}}
    for i, (_, _, level) in enumerate(scopes):
        inner = ucfg.block_out_channels[level]
        for nm in ("to_k_ip", "to_v_ip"):
            sd["ip_adapter"][f"{2 * i + 1}.{nm}.weight"] = torch.tensor(
                rng.normal(0, 0.1, (inner, cross)).astype(np.float32))
    path = tmp_path / "ip.bin"
    torch.save(sd, path)

    ip = load_ip_adapter(path, models)
    assert ip.embed_dim == embed_dim
    assert len(ip.attn_kernels) == len(scopes)
    spliced = ip.splice(models)
    tree = spliced.params["unet"]["params"]
    assert "to_k_ip" in tree["mid_attn"]["blocks_0"]["attn2"]

    # projection numerics: LayerNorm(reshape(W e + b)) — manual numpy
    e = rng.normal(0, 1, (1, embed_dim)).astype(np.float32)
    raw = (e @ proj_w.T + proj_b).reshape(1, ntok, cross)
    mu = raw.mean(-1, keepdims=True)
    var = raw.var(-1, keepdims=True)
    expected = (raw - mu) / np.sqrt(var + 1e-5) * norm_w + norm_b
    got = ip.image_tokens(image_embeds=e)
    np.testing.assert_allclose(got, expected, atol=1e-4)

    # wrong-geometry checkpoint is rejected with a clear error
    sd["ip_adapter"].pop("1.to_k_ip.weight")
    sd["ip_adapter"].pop("1.to_v_ip.weight")
    torch.save(sd, path)
    with pytest.raises(ValueError, match="wrong adapter"):
        load_ip_adapter(path, models)
