"""Bundle save/load roundtrip + example-script smoke tests."""

import numpy as np
import pytest


def test_bundle_roundtrip(tmp_path):
    import jax

    from stable_diffusion_videos_tpu.models.bundle import SDModels
    m = SDModels.tiny(with_safety=True)
    out = m.save(tmp_path / "bundle")
    m2 = SDModels.load(out)

    assert m2.unet_config == m.unet_config
    assert m2.vae_config == m.vae_config
    assert m2.text_config == m.text_config
    assert m2.scheduler_config == m.scheduler_config
    assert m2.safety_config == m.safety_config
    assert set(m2.params) == set(m.params)
    for k in m.params:
        a = jax.tree.leaves(m.params[k])
        b = jax.tree.leaves(m2.params[k])
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_bundle_loaded_produces_same_frames(tmp_path):
    import jax.numpy as jnp

    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.runtime import Engine
    m = SDModels.tiny()
    m.save(tmp_path / "b")
    m2 = SDModels.load(tmp_path / "b")
    e1, e2 = Engine(m, scheduler="ddim"), Engine(m2, scheduler="ddim")
    cond = e1.embed_text(["t"])
    un = e1.embed_text("")
    noise = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 8, 8, 4), np.float32))
    np.testing.assert_array_equal(
        e1.denoise_frames(cond, un, noise, num_inference_steps=2),
        e2.denoise_frames(e2.embed_text(["t"]), e2.embed_text(""), noise,
                          num_inference_steps=2))


def test_bundle_load_dtype_override(tmp_path):
    import jax.numpy as jnp

    from stable_diffusion_videos_tpu.models.bundle import SDModels
    m = SDModels.tiny()
    m.save(tmp_path / "b")
    m2 = SDModels.load(tmp_path / "b", dtype=jnp.bfloat16)
    assert m2.dtype == jnp.bfloat16


def test_embed_cache_hits():
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.runtime import Engine
    eng = Engine(SDModels.tiny())
    a = eng.embed_text("same prompt")
    b = eng.embed_text("same prompt")
    assert a is b  # cached object
    assert len(eng._embed_cache) == 1


def test_example_music_video_main(tmp_path, monkeypatch):
    """Drive examples/make_music_video.py end to end (tiny model, tiny wav)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    import make_music_video as mmv

    from stable_diffusion_videos_tpu.audio import save_wav
    wav = tmp_path / "t.wav"
    sr = 22050
    y = 0.2 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr)
    save_wav(wav, y, sr)
    monkeypatch.setattr(sys, "argv", [
        "make_music_video.py", "--audio", str(wav), "--tiny",
        "--fps", "2", "--batch-size", "4", "--steps", "2",
        "--output-dir", str(tmp_path / "mv"),
        "--offsets", "0", "1", "2",
        "--prompts", "aa", "bb", "cc"])
    mmv.main()
    # with audio and no ffmpeg binary, the native muxer emits .avi
    vids = (list((tmp_path / "mv").glob("*/*.mp4"))
            + list((tmp_path / "mv").glob("*/*.avi")))
    assert vids, "no music video written"
