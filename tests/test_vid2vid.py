"""vid2vid tests: video decode ladder + batched img2img restyling with a
temporally frozen noise field (beyond the reference's scope — the natural
video extension of its walk; SURVEY.md §2.1 #2's img2img engine programs)."""

import numpy as np
import pytest

from stable_diffusion_videos_tpu.media.video import (
    FrameWriter, _read_native_avi, probe_video, read_video_frames)


@pytest.fixture(scope="module")
def pipeline():
    from stable_diffusion_videos_tpu.pipeline import (
        StableDiffusionWalkPipeline)
    return StableDiffusionWalkPipeline.tiny(scheduler="ddim")


def _gradient_frames(n=6, h=48, w=64):
    frames = []
    for i in range(n):
        f = np.zeros((h, w, 3), np.uint8)
        f[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        f[..., 1] = int(255 * i / max(n - 1, 1))
        frames.append(f)
    return frames


@pytest.fixture()
def video_file(tmp_path):
    path = tmp_path / "src.mp4"
    with FrameWriter(path, fps=10) as w:
        for f in _gradient_frames():
            w.add_frame(f)
    return w.output_filepath  # backend may rewrite the suffix


# ---------------------------------------------------------------------------
# decode ladder
# ---------------------------------------------------------------------------

def test_video_read_roundtrip(video_file):
    frames = list(read_video_frames(video_file))
    assert len(frames) == 6
    assert frames[0].shape == (48, 64, 3) and frames[0].dtype == np.uint8
    # lossy codec: the green ramp must still be monotone across frames
    greens = [int(f[..., 1].mean()) for f in frames]
    assert greens == sorted(greens) and greens[-1] - greens[0] > 150


def test_probe_video(video_file):
    info = probe_video(video_file)
    assert info["width"] == 64 and info["height"] == 48
    assert abs(info["fps"] - 10.0) < 0.5
    assert info["n_frames"] in (0, 6)  # some containers omit the count


def test_read_resize_skip_max(video_file):
    frames = list(read_video_frames(video_file, size=(24, 32),
                                    frame_skip=2, max_frames=2))
    assert len(frames) == 2
    assert frames[0].shape == (24, 32, 3)


def test_native_avi_pure_python_reader(tmp_path):
    from stable_diffusion_videos_tpu.media.native_sink import native_available
    if not native_available():
        pytest.skip("native media sink not built")
    path = tmp_path / "clip.avi"
    src = _gradient_frames(n=4)
    w = FrameWriter(path, fps=12, backend="native")
    for f in src:
        w.add_frame(f)
    w.close()
    fps, gen = _read_native_avi(w.output_filepath)
    frames = list(gen)
    assert abs(fps - 12.0) < 0.5
    assert len(frames) == 4 and frames[0].shape == (48, 64, 3)
    # MJPEG is lossy: compare loosely
    assert np.abs(frames[0].astype(int) - src[0].astype(int)).mean() < 12


# ---------------------------------------------------------------------------
# vid2vid
# ---------------------------------------------------------------------------

def test_vid2vid_frames_from_array(pipeline):
    src = _gradient_frames(n=5, h=32, w=32)
    out = pipeline.vid2vid(src, "a painting", strength=0.5,
                           num_inference_steps=4, batch_size=4,
                           output_type="frames")
    assert len(out) == 5
    assert out[0].size == (32, 32)


def test_vid2vid_video_file_to_video(pipeline, video_file, tmp_path):
    out_path = pipeline.vid2vid(
        video_file, "oil on canvas", strength=0.4, num_inference_steps=3,
        batch_size=4, output_filepath=str(tmp_path / "styled.mp4"))
    frames = list(read_video_frames(out_path))
    # 48x64 snaps down to the 16-px grain of the tiny bundle (f=2)
    assert len(frames) == 6
    assert frames[0].shape == (48, 64, 3)


def test_vid2vid_shared_noise_is_temporally_frozen(pipeline):
    """Identical input frames -> identical outputs under shared noise
    (the coherence property vid2vid exists for)."""
    frame = _gradient_frames(n=1, h=32, w=32)[0]
    out = pipeline.vid2vid([frame, frame], "p", strength=0.6,
                           num_inference_steps=4, batch_size=2,
                           output_type="frames")
    a, b = (np.asarray(x) for x in out)
    np.testing.assert_array_equal(a, b)


def test_vid2vid_per_frame_noise_differs(pipeline):
    frame = _gradient_frames(n=1, h=32, w=32)[0]
    out = pipeline.vid2vid([frame, frame], "p", strength=0.9,
                           num_inference_steps=4, batch_size=2,
                           shared_noise=False, output_type="frames")
    a, b = (np.asarray(x) for x in out)
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0


def test_vid2vid_deterministic(pipeline):
    src = _gradient_frames(n=3, h=32, w=32)
    outs = [pipeline.vid2vid(src, "p", strength=0.5, seed=7,
                             num_inference_steps=3, batch_size=4,
                             output_type="frames") for _ in range(2)]
    for a, b in zip(*outs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vid2vid_frame_skip_and_max(pipeline):
    src = _gradient_frames(n=6, h=32, w=32)
    out = pipeline.vid2vid(src, "p", strength=0.5, num_inference_steps=2,
                           batch_size=4, frame_skip=2, max_frames=2,
                           output_type="frames")
    assert len(out) == 2


def test_vid2vid_rejects_history_samplers():
    from stable_diffusion_videos_tpu.pipeline import (
        StableDiffusionWalkPipeline)
    pipe = StableDiffusionWalkPipeline.tiny(scheduler="pndm")
    with pytest.raises(NotImplementedError, match="img2img-capable"):
        pipe.vid2vid([np.zeros((32, 32, 3), np.uint8)], "p")


def test_vid2vid_empty_source_raises(pipeline):
    with pytest.raises(ValueError, match="no frames"):
        pipeline.vid2vid([], "p", output_type="frames")


def test_vid2vid_cli(video_file, tmp_path, capsys):
    from stable_diffusion_videos_tpu.__main__ import build_parser
    out = tmp_path / "cli.mp4"
    args = build_parser().parse_args([
        "vid2vid", "--video", str(video_file), "--prompt", "p",
        "--scheduler", "ddim", "--steps", "2", "--strength", "0.5",
        "--batch-size", "4", "--output", str(out)])
    args.fn(args)
    printed = capsys.readouterr().out.strip()
    assert printed and list(read_video_frames(printed))
