"""Native media runtime tests (C++ MJPEG/AVI sink via ctypes)."""

import struct

import numpy as np
import pytest

from stable_diffusion_videos_tpu.media.native_sink import (NativeAviSink,
                                                           native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native media lib not built")


def _parse_riff_chunks(path):
    """Return the set of fourcc chunk ids inside the movi list."""
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    riff_size = struct.unpack("<I", data[4:8])[0]
    assert riff_size == len(data) - 8, "RIFF size not patched correctly"
    movi = data.find(b"movi")
    idx = data.find(b"idx1")
    chunks = []
    pos = movi + 4
    while pos < idx - 8:
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        chunks.append((fourcc, size))
        pos += 8 + size + (size & 1)
    return chunks, data


def test_sink_video_only(tmp_path):
    path = tmp_path / "v.avi"
    with NativeAviSink(path, 32, 32, fps=10) as sink:
        for i in range(5):
            sink.add_frame(np.full((32, 32, 3), i * 40, np.uint8))
    chunks, _ = _parse_riff_chunks(path)
    assert [c for c, _ in chunks].count(b"00dc") == 5


def test_sink_with_audio_interleaved(tmp_path):
    path = tmp_path / "av.avi"
    sr = 8000
    audio = np.sin(np.arange(sr, dtype=np.float32) / 10)
    with NativeAviSink(path, 32, 32, fps=10, audio=audio,
                       audio_sr=sr) as sink:
        for i in range(10):
            sink.add_frame(np.zeros((32, 32, 3), np.uint8))
    chunks, data = _parse_riff_chunks(path)
    ids = [c for c, _ in chunks]
    assert ids.count(b"00dc") == 10
    n_audio_bytes = sum(s for c, s in chunks if c == b"01wb")
    assert n_audio_bytes == sr * 2  # 1 s of 16-bit mono
    # audio stream header present
    assert b"auds" in data


def test_sink_readable_by_cv2(tmp_path):
    import cv2
    path = tmp_path / "r.avi"
    with NativeAviSink(path, 48, 32, fps=12, quality=95) as sink:
        for i in range(6):
            frame = np.zeros((32, 48, 3), np.uint8)
            frame[:, :, 0] = i * 40  # ramp in R channel
            sink.add_frame(frame)
    cap = cv2.VideoCapture(str(path))
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
    assert cap.get(cv2.CAP_PROP_FPS) == 12
    ok, img = cap.read()
    assert ok and img.shape == (32, 48, 3)
    frames = [img]
    while True:
        ok, img = cap.read()
        if not ok:
            break
        frames.append(img)
    # R ramp survives JPEG (BGR in cv2 -> channel 2)
    reds = [int(f[:, :, 2].mean()) for f in frames]
    assert reds == sorted(reds) and reds[-1] > 150


def test_sink_out_of_order_threads_preserve_order(tmp_path):
    """Many frames through a 4-thread pool must mux in submission order."""
    import cv2
    path = tmp_path / "o.avi"
    n = 40
    with NativeAviSink(path, 64, 64, fps=30, n_threads=4) as sink:
        for i in range(n):
            frame = np.full((64, 64, 3), 0, np.uint8)
            frame[:, :, 1] = int(i * 255 / n)
            sink.add_frame(frame)
    cap = cv2.VideoCapture(str(path))
    greens = []
    while True:
        ok, img = cap.read()
        if not ok:
            break
        greens.append(int(img[:, :, 1].mean()))
    assert len(greens) == n
    assert greens == sorted(greens), "frames muxed out of order"


def test_fractional_fps_exact_in_header(tmp_path):
    """29.97 fps must survive as rational scale/rate, not truncate to 29."""
    path = tmp_path / "f.avi"
    with NativeAviSink(path, 32, 32, fps=29.97) as sink:
        for _ in range(3):
            sink.add_frame(np.zeros((32, 32, 3), np.uint8))
    data = open(path, "rb").read()
    # video strh: fourcc 'strh' + 'vids' ... scale/rate at offsets +28/+32
    # from the strh payload start (see AviWriter::write_headers_placeholder)
    pos = data.find(b"vids")
    assert pos > 0
    payload = pos  # 'vids' is the first u32 of the strh payload
    scale, rate = struct.unpack("<II", data[payload + 20:payload + 28])
    assert rate / scale == pytest.approx(29.97, abs=1e-9)
    try:
        import cv2
    except ImportError:
        return
    cap = cv2.VideoCapture(str(path))
    assert cap.get(cv2.CAP_PROP_FPS) == pytest.approx(29.97, abs=1e-3)


def test_frame_shape_validation(tmp_path):
    with NativeAviSink(tmp_path / "s.avi", 32, 32) as sink:
        with pytest.raises(ValueError):
            sink.add_frame(np.zeros((16, 16, 3), np.uint8))
        sink.add_frame(np.zeros((32, 32, 3), np.uint8))


def test_framewriter_auto_selects_native_for_audio(tmp_path):
    from stable_diffusion_videos_tpu.media.video import FrameWriter, _find_ffmpeg
    if _find_ffmpeg():
        pytest.skip("ffmpeg present; ladder prefers it")
    audio = np.zeros(1000, np.float32)
    w = FrameWriter(tmp_path / "x.mp4", fps=10, audio=audio, audio_sr=1000)
    assert w.backend == "native"
    assert w.output_filepath.endswith(".avi")
    w.add_frame(np.zeros((32, 32, 3), np.uint8))
    out = w.close()
    assert out.endswith(".avi")
