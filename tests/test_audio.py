"""Audio analysis tests (get_timesteps_arr and its DSP building blocks)."""

import numpy as np
import pytest

from stable_diffusion_videos_tpu import audio as A


@pytest.fixture(scope="module")
def click_wav(tmp_path_factory):
    """Synthesise 2 s of 4-beats-per-second clicks over a quiet hum."""
    sr = 22050
    t = np.arange(2 * sr) / sr
    y = 0.02 * np.sin(2 * np.pi * 220 * t)
    for beat in np.arange(0.25, 2.0, 0.5):
        i = int(beat * sr)
        n = 256
        y[i:i + n] += 0.9 * np.hanning(n) * np.sign(np.random.default_rng(0)
                                                    .standard_normal(n))
    path = tmp_path_factory.mktemp("audio") / "clicks.wav"
    A.save_wav(path, y, sr)
    return str(path), sr, y


def test_load_audio_roundtrip(click_wav):
    path, sr, y = click_wav
    loaded, got_sr = A.load_audio(path, sr=sr)
    assert got_sr == sr
    assert abs(len(loaded) - len(y)) <= 1
    np.testing.assert_allclose(loaded[:1000], y[:1000], atol=2e-4)


def test_load_audio_offset_duration(click_wav):
    path, sr, _ = click_wav
    y, _ = A.load_audio(path, sr=sr, offset=0.5, duration=1.0)
    assert abs(len(y) - sr) <= 1


def test_load_audio_resample(click_wav):
    path, sr, _ = click_wav
    y, got = A.load_audio(path, sr=11025)
    assert got == 11025
    assert abs(len(y) - 2 * 11025) <= 2


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(1)
    y = rng.standard_normal(22050).astype(np.float32)
    D = A.stft(y, n_fft=2048, hop_length=512)
    assert D.shape[0] == 1025
    y2 = A.istft(D, hop_length=512, length=len(y))
    np.testing.assert_allclose(y2, y, atol=1e-4)


def test_hpss_energy_split():
    sr = 22050
    t = np.arange(sr) / sr
    harmonic = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    percussive = np.zeros(sr, np.float32)
    for i in range(0, sr - 64, sr // 8):
        percussive[i:i + 64] = np.random.default_rng(2).standard_normal(64)
    D = A.stft(harmonic + percussive)
    Dh, Dp = A.hpss(D)
    yh = A.istft(Dh, length=sr)
    yp = A.istft(Dp, length=sr)
    # harmonic reconstruction correlates with the sine, percussive with clicks
    assert np.corrcoef(yh, harmonic)[0, 1] > 0.8
    assert np.corrcoef(yp, percussive)[0, 1] > 0.5


def test_mel_filterbank_shape_and_coverage():
    fb = A.mel_filterbank(22050, 2048, n_mels=128)
    assert fb.shape == (128, 1025)
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()  # every band non-empty


def test_get_timesteps_arr_properties(click_wav):
    path, _, _ = click_wav
    T = A.get_timesteps_arr(path, offset=0.0, duration=2.0, fps=30)
    assert T.shape == (60,)
    assert T[0] < 0.05 and abs(T[-1] - 1.0) < 1e-6
    assert np.all(np.diff(T) >= -1e-9)  # monotone (cumsum of nonneg)


def test_get_timesteps_arr_clusters_on_beats(click_wav):
    # T should rise fastest at the click positions: the interpolation
    # derivative at beats must beat the quiet sections.
    path, _, _ = click_wav
    T = A.get_timesteps_arr(path, offset=0.0, duration=2.0, fps=60)
    dT = np.diff(T)
    beat_frames = (np.arange(0.25, 2.0, 0.5) * 60).astype(int)
    quiet_frames = (np.arange(0.11, 2.0, 0.5) * 60).astype(int)
    beat_rate = max(dT[min(b, len(dT) - 1)] for b in beat_frames)
    quiet_rate = np.median(dT[quiet_frames])
    assert beat_rate > 2 * quiet_rate


def test_get_timesteps_arr_smooth_blends_to_linear(click_wav):
    path, _, _ = click_wav
    T = A.get_timesteps_arr(path, offset=0.0, duration=1.0, fps=30, smooth=1.0)
    np.testing.assert_allclose(T, np.linspace(0, 1, 30), atol=1e-6)


# ---------------------------------------------------------------------------
# non-WAV decode ladder (mp3/m4a/ogg via ffmpeg; AIFF via stdlib)
# ---------------------------------------------------------------------------
def _fake_ffmpeg(tmp_path, pcm: np.ndarray):
    """A stand-in `ffmpeg` executable: logs its argv and writes the given
    float32 PCM to stdout (the env has no real ffmpeg — this validates the
    subprocess plumbing end to end)."""
    import stat
    bindir = tmp_path / "bin"
    bindir.mkdir(exist_ok=True)
    pcm_path = tmp_path / "pcm.f32"
    pcm.astype(np.float32).tofile(pcm_path)
    log = tmp_path / "argv.log"
    script = bindir / "ffmpeg"
    script.write_text(
        "#!/bin/sh\n"
        f'echo "$@" > {log}\n'
        f"cat {pcm_path}\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return str(bindir), log


def test_load_audio_non_wav_uses_ffmpeg(tmp_path, monkeypatch):
    sr = 8000
    want = np.linspace(-0.5, 0.5, 4000).astype(np.float32)
    bindir, log = _fake_ffmpeg(tmp_path, want)
    monkeypatch.setenv("PATH", bindir + ":" + str(__import__("os").environ["PATH"]))
    mp3 = tmp_path / "song.mp3"
    mp3.write_bytes(b"ID3\x04\x00fake-mpeg-frames")  # not RIFF/WAVE
    y, got_sr = A.load_audio(mp3, sr=sr, offset=1.5, duration=2.0)
    assert got_sr == sr
    np.testing.assert_array_equal(y, want)
    argv = log.read_text()
    # output-side (sample-accurate) seek + bounded duration, f32le mono @ sr
    for frag in ("-ss 1.5", "-t 2.0", "f32le", "-ar 8000", "-ac 1",
                 str(mp3)):
        assert frag in argv, (frag, argv)
    # -ss must come AFTER -i (output-side): input seeking is codec-frame
    # granular and smears beat alignment
    assert argv.index("-i ") < argv.index("-ss"), argv


def test_load_audio_wav_sniff_is_extension_agnostic(click_wav, tmp_path):
    """A WAV payload behind an .mp3 name decodes via the scipy path."""
    import shutil
    path, sr, y = click_wav
    alias = tmp_path / "mislabeled.mp3"
    shutil.copy(path, alias)
    ya, _ = A.load_audio(alias, sr=sr)
    yw, _ = A.load_audio(path, sr=sr)
    np.testing.assert_array_equal(ya, yw)


def test_load_audio_non_wav_without_ffmpeg_errors(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))  # no ffmpeg reachable
    f = tmp_path / "song.ogg"
    f.write_bytes(b"OggS\x00fake")
    with pytest.raises(RuntimeError, match="ffmpeg"):
        A.load_audio(f)


def test_load_audio_missing_file_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        A.load_audio(tmp_path / "nope.mp3")


def test_load_audio_aiff_stdlib(tmp_path, monkeypatch):
    """AIFF decodes via the stdlib even with no ffmpeg on PATH."""
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import aifc
    sr = 11025
    t = np.arange(sr) / sr
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = tmp_path / "tone.aiff"
    with aifc.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes((y * 32767).astype(">i2").tobytes())
    monkeypatch.setenv("PATH", str(tmp_path))  # force the stdlib branch
    got, got_sr = A.load_audio(path, sr=sr)
    assert got_sr == sr
    np.testing.assert_allclose(got, y, atol=2e-4)
