"""Host-side audio analysis (audio-reactive interpolation schedules)."""

from .analysis import (get_timesteps_arr, load_audio, save_wav, stft, istft,
                       hpss, melspectrogram, mel_filterbank)

__all__ = ["get_timesteps_arr", "load_audio", "save_wav", "stft", "istft",
           "hpss", "melspectrogram", "mel_filterbank"]
