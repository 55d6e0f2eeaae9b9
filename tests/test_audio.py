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
