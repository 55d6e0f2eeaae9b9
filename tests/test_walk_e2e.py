"""End-to-end walk() tests on the tiny bundle + 8-device CPU mesh.

Mirrors the reference's three integration tests (tests/test_pipeline.py:41-81)
but CPU-runnable with numerical assertions, plus resume and determinism
checks the reference never had (SURVEY.md §4).
"""

import json
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipeline():
    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline
    return StableDiffusionWalkPipeline.tiny()


@pytest.fixture
def run_dir(tmp_path):
    return tmp_path / "dreams"


def _frame_count(mp4_path):
    import cv2
    cap = cv2.VideoCapture(str(mp4_path))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return n


def test_walk_basic(pipeline, run_dir):
    video = pipeline.walk(
        prompts=["a", "b", "c"], seeds=[42, 1337, 4321],
        num_interpolation_steps=3, num_inference_steps=3, fps=5,
        output_dir=str(run_dir), name="basic", batch_size=4)
    video = Path(video)
    assert video.exists() and video.name == "basic.mp4"
    # 2 clips x 3 frames
    frames = sorted((run_dir / "basic").glob("**/frame*.png"))
    assert len(frames) == 6
    assert _frame_count(video) == 6
    # per-clip mp4s
    assert (run_dir / "basic" / "basic_000000" / "basic_000000.mp4").exists()
    cfg = json.loads((run_dir / "basic" / "prompt_config.json").read_text())
    assert cfg["prompts"] == ["a", "b", "c"]
    assert cfg["num_interpolation_steps"] == [3, 3]


def test_walk_deterministic(pipeline, run_dir):
    from PIL import Image
    for name in ("d1", "d2"):
        pipeline.walk(prompts=["x", "y"], seeds=[7, 8],
                      num_interpolation_steps=2, num_inference_steps=2,
                      fps=2, output_dir=str(run_dir), name=name,
                      make_video=False)
    a = np.asarray(Image.open(next((run_dir / "d1").glob("**/frame000001.png"))))
    b = np.asarray(Image.open(next((run_dir / "d2").glob("**/frame000001.png"))))
    np.testing.assert_array_equal(a, b)


def test_walk_endpoint_frames_differ(pipeline, run_dir):
    from PIL import Image
    pipeline.walk(prompts=["qq", "zz"], seeds=[1, 2],
                  num_interpolation_steps=3, num_inference_steps=2, fps=2,
                  output_dir=str(run_dir), name="ends", make_video=False)
    clip = run_dir / "ends" / "ends_000000"
    f0 = np.asarray(Image.open(clip / "frame000000.png"), np.int32)
    f2 = np.asarray(Image.open(clip / "frame000002.png"), np.int32)
    assert np.abs(f0 - f2).max() > 0  # interpolation actually moves


def test_walk_with_audio(pipeline, run_dir, tmp_path):
    from stable_diffusion_videos_tpu.audio import save_wav
    sr = 22050
    t = np.arange(2 * sr) / sr
    y = 0.1 * np.sin(2 * np.pi * 220 * t)
    for beat in (0.3, 0.9, 1.5):
        i = int(beat * sr)
        y[i:i + 200] += 0.8 * np.hanning(200)
    wav = tmp_path / "beats.wav"
    save_wav(wav, y, sr)

    video = pipeline.walk(
        prompts=["m", "n"], seeds=[5, 6], num_interpolation_steps=6,
        num_inference_steps=2, fps=3, output_dir=str(run_dir), name="audio",
        audio_filepath=str(wav), audio_start_sec=0, batch_size=4)
    assert Path(video).exists()
    frames = sorted((run_dir / "audio").glob("**/frame*.png"))
    assert len(frames) == 6


def test_walk_resume(pipeline, run_dir):
    pipeline.walk(prompts=["r1", "r2", "r3"], seeds=[11, 12, 13],
                  num_interpolation_steps=2, num_inference_steps=2, fps=2,
                  output_dir=str(run_dir), name="res")
    # delete the final clip's video + one frame -> resume must regenerate
    clip1 = run_dir / "res" / "res_000001"
    (clip1 / "res_000001.mp4").unlink()
    (clip1 / "frame000001.png").unlink()
    (run_dir / "res" / "res.mp4").unlink()

    video = pipeline.walk(resume=True, output_dir=str(run_dir), name="res")
    assert Path(video).exists()
    assert (clip1 / "frame000001.png").exists()
    assert (clip1 / "res_000001.mp4").exists()


def test_walk_resume_requires_config(pipeline, run_dir):
    with pytest.raises(FileNotFoundError):
        pipeline.walk(resume=True, output_dir=str(run_dir), name="nope")


def test_walk_arg_validation(pipeline, run_dir):
    with pytest.raises(ValueError):
        pipeline.walk(prompts=["a"], seeds=[1], output_dir=str(run_dir))
    with pytest.raises(ValueError):
        pipeline.walk(prompts=["a", "b"], seeds=[1], output_dir=str(run_dir))
    with pytest.raises(ValueError):
        pipeline.walk(prompts=["a", "b", "c"], seeds=[1, 2, 3],
                      num_interpolation_steps=[2], output_dir=str(run_dir))


def test_walk_upsample(pipeline, run_dir):
    from stable_diffusion_videos_tpu.pipeline import RealESRGANModel
    pipeline.upsampler = RealESRGANModel.tiny()
    try:
        pipeline.walk(prompts=["u1", "u2"], seeds=[3, 4],
                      num_interpolation_steps=2, num_inference_steps=2,
                      fps=2, output_dir=str(run_dir), name="up",
                      upsample=True, make_video=False)
        from PIL import Image
        frame = next((run_dir / "up").glob("**/frame000000.png"))
        w, h = Image.open(frame).size
        assert (w, h) == (4 * pipeline.models.default_size,) * 2
    finally:
        pipeline.upsampler = None


def test_generate_images(pipeline, tmp_path):
    from stable_diffusion_videos_tpu.pipeline import generate_images
    paths = generate_images(pipeline, "a painting", batch_size=2,
                            num_batches=2, seeds=[1, 2, 3, 4],
                            num_inference_steps=2,
                            output_dir=str(tmp_path / "imgs"), name="run")
    assert len(paths) == 4
    assert all(Path(p).exists() for p in paths)
    names = {Path(p).stem for p in paths}
    assert names == {"1", "2", "3", "4"}


def test_call_generate_single(pipeline):
    imgs = pipeline(prompt="hello", num_inference_steps=2, output_type="np")
    assert imgs.shape[0] == 1 and imgs.shape[-1] == 3
    assert np.isfinite(imgs).all()


def test_walk_batch_size_invariance(pipeline, run_dir):
    """Frames must not depend on how they were batched into dispatches."""
    from PIL import Image
    for name, bs in (("bs1", 1), ("bs3", 3)):
        pipeline.walk(prompts=["inv-a", "inv-b"], seeds=[21, 22],
                      num_interpolation_steps=3, num_inference_steps=2,
                      fps=2, output_dir=str(run_dir), name=name,
                      batch_size=bs, make_video=False)
    for i in range(3):
        a = np.asarray(Image.open(run_dir / "bs1" / "bs1_000000"
                                  / f"frame{i:06d}.png"), np.int16)
        b = np.asarray(Image.open(run_dir / "bs3" / "bs3_000000"
                                  / f"frame{i:06d}.png"), np.int16)
        assert np.abs(a - b).max() <= 1, f"frame {i} differs across batching"


def test_walk_non_square(pipeline, run_dir):
    from PIL import Image
    pipeline.walk(prompts=["ns-a", "ns-b"], seeds=[31, 32],
                  num_interpolation_steps=2, num_inference_steps=2, fps=2,
                  height=16, width=24, output_dir=str(run_dir), name="ns",
                  make_video=False)
    frame = next((run_dir / "ns").glob("**/frame000000.png"))
    assert Image.open(frame).size == (24, 16)  # PIL size is (W, H)


def test_walk_with_safety_checker(run_dir):
    """Safety-enabled pipeline runs end to end and blacks out flagged frames
    (tiny random checker flags arbitrarily; we force flags via adjustment)."""
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline
    pipe = StableDiffusionWalkPipeline(SDModels.tiny(with_safety=True),
                                       safety=True)
    pipe.walk(prompts=["s1", "s2"], seeds=[41, 42],
              num_interpolation_steps=2, num_inference_steps=2, fps=2,
              output_dir=str(run_dir), name="safe", make_video=False)
    frames = sorted((run_dir / "safe").glob("**/frame*.png"))
    assert len(frames) == 2


def test_call_return_dict(pipeline):
    out = pipeline(prompt="hi", num_inference_steps=2, return_dict=True)
    assert set(out) == {"images", "nsfw_content_detected"}
    assert len(out["images"]) == 1
    assert out["nsfw_content_detected"] == [False]


def test_walk_sd2_flavored_bundle(run_dir):
    """End-to-end walk through an SD2.x-shaped tiny bundle: per-level head
    counts, 'gelu' text tower, v_prediction schedule — the whole product
    path, not just unit level."""
    import jax
    import jax.numpy as jnp

    from stable_diffusion_videos_tpu.core.schedulers import SchedulerConfig
    from stable_diffusion_videos_tpu.models import (CLIPTextConfig,
                                                    HashTokenizer)
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.models.clip_text import CLIPTextEncoder
    from stable_diffusion_videos_tpu.models.unet import (UNet2DCondition,
                                                         UNetConfig)
    from stable_diffusion_videos_tpu.models.vae import (AutoencoderKL,
                                                        VAEConfig)
    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline

    ucfg = UNetConfig(sample_size=8, block_out_channels=(32, 64),
                      layers_per_block=1, cross_attention_dim=32,
                      attention_head_dim=(2, 4), attn_levels=(True, True))
    vcfg = VAEConfig.tiny()
    tcfg = CLIPTextConfig(vocab_size=1000, hidden_size=32,
                          intermediate_size=64, num_layers=2, num_heads=2,
                          hidden_act="gelu")
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    img = ucfg.sample_size * vcfg.scale_factor
    params = {
        "unet": UNet2DCondition(ucfg).init(
            keys[0], jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 7, 32))),
        "vae": AutoencoderKL(vcfg).init(keys[1],
                                        jnp.zeros((1, img, img, 3))),
        "text_encoder": CLIPTextEncoder(tcfg).init(
            keys[2], jnp.zeros((1, 77), jnp.int32)),
    }
    models = SDModels(ucfg, vcfg, tcfg, params,
                      HashTokenizer(vocab_size=tcfg.vocab_size),
                      SchedulerConfig(prediction_type="v_prediction"))
    pipe = StableDiffusionWalkPipeline(models, scheduler="ddim")
    video = pipe.walk(prompts=["x", "y"], seeds=[1, 2],
                      num_interpolation_steps=2, num_inference_steps=2,
                      fps=2, output_dir=str(run_dir), name="sd2ish")
    assert Path(video).exists()
    assert _frame_count(video) == 2


def _tiny_realesrgan_pth(tmp_path):
    """Synthesise a tiny RealESRGAN-style checkpoint (official key names,
    params_ema wrapper) the geometry-inferring loader can consume."""
    import torch

    from stable_diffusion_videos_tpu.models.rrdbnet import RRDBNetConfig
    cfg = RRDBNetConfig.tiny()
    rng = np.random.default_rng(0)

    def conv(o, i):
        return torch.tensor(rng.standard_normal((o, i, 3, 3),
                                                np.float32) * 0.05)

    nf, g = cfg.num_feat, cfg.num_grow_ch
    sd = {"conv_first.weight": conv(nf, 3),
          "conv_first.bias": torch.zeros(nf)}
    for name, (o, i) in {"conv_body": (nf, nf), "conv_up1": (nf, nf),
                         "conv_up2": (nf, nf), "conv_hr": (nf, nf),
                         "conv_last": (3, nf)}.items():
        sd[f"{name}.weight"] = conv(o, i)
        sd[f"{name}.bias"] = torch.zeros(o)
    for b in range(cfg.num_block):
        for r in (1, 2, 3):
            for c in range(1, 6):
                i = nf + (c - 1) * g
                o = g if c < 5 else nf
                sd[f"body.{b}.rdb{r}.conv{c}.weight"] = conv(o, i)
                sd[f"body.{b}.rdb{r}.conv{c}.bias"] = torch.zeros(o)
    path = tmp_path / "RealESRGAN_tiny.pth"
    torch.save({"params_ema": sd}, path)
    return str(path)


def test_walk_upsample_weights_kwarg(pipeline, tmp_path):
    """walk(upsample=True, upsample_weights=...) provisions the upsampler
    from the file — the full product path VERDICT r2 flagged as broken."""
    pytest.importorskip("torch")
    weights = _tiny_realesrgan_pth(tmp_path)
    try:
        pipeline.walk(prompts=["w1", "w2"], seeds=[5, 6],
                      num_interpolation_steps=2, num_inference_steps=2,
                      fps=2, output_dir=str(tmp_path / "d"), name="upw",
                      upsample=True, upsample_weights=weights,
                      make_video=False)
        from PIL import Image
        frame = next((tmp_path / "d" / "upw").glob("**/frame000000.png"))
        assert Image.open(frame).size == \
            (4 * pipeline.models.default_size,) * 2
        # config records the weights for resume
        import json
        cfg = json.loads((tmp_path / "d" / "upw"
                          / "prompt_config.json").read_text())
        assert cfg["upsample_weights"] == weights
    finally:
        pipeline.upsampler = None


def test_walk_upsample_env_var(pipeline, tmp_path, monkeypatch):
    pytest.importorskip("torch")
    weights = _tiny_realesrgan_pth(tmp_path)
    monkeypatch.setenv("SDV_REALESRGAN", weights)
    try:
        pipeline.walk(prompts=["e1", "e2"], seeds=[7, 8],
                      num_interpolation_steps=2, num_inference_steps=2,
                      fps=2, output_dir=str(tmp_path / "d"), name="upe",
                      upsample=True, make_video=False)
        assert pipeline.upsampler is not None
    finally:
        pipeline.upsampler = None


def test_walk_upsample_fails_fast_without_weights(pipeline, tmp_path,
                                                  monkeypatch):
    """Missing weights must fail BEFORE any frames/dirs are produced, with
    an error naming every provisioning option."""
    monkeypatch.delenv("SDV_REALESRGAN", raising=False)
    out = tmp_path / "dreams"
    with pytest.raises(FileNotFoundError, match="SDV_REALESRGAN"):
        pipeline.walk(prompts=["f1", "f2"], seeds=[1, 2],
                      num_interpolation_steps=2, num_inference_steps=2,
                      output_dir=str(out), name="none", upsample=True)
    assert not (out / "none").exists()  # nothing littered
    with pytest.raises(FileNotFoundError, match="not found"):
        pipeline.walk(prompts=["f1", "f2"], seeds=[1, 2],
                      num_interpolation_steps=2, num_inference_steps=2,
                      output_dir=str(out), name="none", upsample=True,
                      upsample_weights=str(tmp_path / "missing.pth"))


def test_cli_has_upsample_weights_flag():
    from stable_diffusion_videos_tpu.__main__ import build_parser
    ap = build_parser()
    args = ap.parse_args(["walk", "--prompts", "a", "b", "--seeds", "1", "2",
                          "--upsample", "--upsample-weights", "/w.pth"])
    assert args.upsample_weights == "/w.pth"


def test_fast_preset_sets_measured_composite():
    """fast=True applies the bench-proven composite per family; explicit
    kwargs win over the preset (docs/performance.md fast mode)."""
    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline
    p = StableDiffusionWalkPipeline.tiny(fast=True)
    assert p.engine.step_cache == 3
    assert tuple(p.engine.guidance_interval) == (0.1, 0.85)
    # SDXL family: step_cache=2, no interval (latency-bound at batch 1-2)
    px = StableDiffusionWalkPipeline.tiny_xl(fast=True)
    assert px.engine.step_cache == 2
    assert px.engine.guidance_interval is None
    # explicit override beats the preset
    po = StableDiffusionWalkPipeline.tiny(fast=True, step_cache=2,
                                          guidance_interval=(0.0, 0.8))
    assert po.engine.step_cache == 2
    assert tuple(po.engine.guidance_interval) == (0.0, 0.8)


def test_fast_cli_flag_round_trip():
    from stable_diffusion_videos_tpu.__main__ import build_parser
    ap = build_parser()
    args = ap.parse_args(["walk", "--prompts", "a", "b",
                          "--seeds", "1", "2", "--fast"])
    assert args.fast is True
