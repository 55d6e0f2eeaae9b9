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


def test_vid2vid_warmup_samplers_run():
    """pndm (the default walk sampler) can vid2vid since r4: img2img
    rebuilds truncated tables with the PLMS warm-up replayed at entry."""
    from stable_diffusion_videos_tpu.pipeline import (
        StableDiffusionWalkPipeline)
    pipe = StableDiffusionWalkPipeline.tiny(scheduler="pndm")
    out = pipe.vid2vid([np.zeros((32, 32, 3), np.uint8)] * 2, "p",
                       strength=0.6, num_inference_steps=4, batch_size=2,
                       output_type="frames")
    assert len(out) == 2


def test_vid2vid_flicker_frozen_lt_free(pipeline):
    """The coherence claim, QUANTIFIED (VERDICT r3 #4): on a static-scene
    input with mild per-frame sensor noise, frozen re-noising must measure
    LESS temporal flicker than free per-frame noise."""
    from stable_diffusion_videos_tpu.utils.metrics import temporal_flicker
    rng = np.random.default_rng(0)
    base = _gradient_frames(n=1, h=32, w=32)[0].astype(np.int16)
    src = [np.clip(base + rng.integers(-6, 7, base.shape), 0, 255)
           .astype(np.uint8) for _ in range(4)]
    kw = dict(strength=0.7, num_inference_steps=4, batch_size=4, seed=3,
              output_type="frames")
    frozen = temporal_flicker(pipeline.vid2vid(src, "p", **kw))
    free = temporal_flicker(pipeline.vid2vid(src, "p", shared_noise=False,
                                             **kw))
    assert frozen["flicker_ssim"] < free["flicker_ssim"], (frozen, free)
    assert frozen["flicker_mad"] < free["flicker_mad"], (frozen, free)


def test_vid2vid_latent_ema_reduces_flicker(pipeline):
    """latent_ema low-passes input grain: flicker strictly drops vs the
    frozen-noise baseline on a noisy static scene, and the EMA carry spans
    batch boundaries (batch_size=2 over 4 frames)."""
    from stable_diffusion_videos_tpu.utils.metrics import temporal_flicker
    rng = np.random.default_rng(1)
    base = _gradient_frames(n=1, h=32, w=32)[0].astype(np.int16)
    src = [np.clip(base + rng.integers(-10, 11, base.shape), 0, 255)
           .astype(np.uint8) for _ in range(4)]
    kw = dict(strength=0.7, num_inference_steps=4, batch_size=2, seed=3,
              output_type="frames")
    plain = temporal_flicker(pipeline.vid2vid(src, "p", **kw))
    ema = temporal_flicker(pipeline.vid2vid(src, "p", latent_ema=0.6, **kw))
    assert ema["flicker_ssim"] < plain["flicker_ssim"], (ema, plain)


def test_vid2vid_latent_ema_validation(pipeline):
    with pytest.raises(ValueError, match="latent_ema"):
        pipeline.vid2vid([np.zeros((32, 32, 3), np.uint8)], "p",
                         latent_ema=1.0, output_type="frames")


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


# ---------------------------------------------------------------------------
# ControlNet self-conditioning (control_from_source)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ctrl_pipeline():
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.models.controlnet import ControlNetBundle
    from stable_diffusion_videos_tpu.pipeline import (
        StableDiffusionWalkPipeline)
    return StableDiffusionWalkPipeline(
        SDModels.tiny(), scheduler="ddim",
        controlnet=ControlNetBundle.tiny(perturb=True))


def test_vid2vid_control_from_source_canny(ctrl_pipeline):
    src = _gradient_frames(n=3, h=32, w=32)
    out = ctrl_pipeline.vid2vid(src, "p", strength=0.5,
                                num_inference_steps=2, batch_size=4,
                                control_from_source="canny",
                                output_type="frames")
    assert len(out) == 3


def test_vid2vid_control_from_source_steers(ctrl_pipeline):
    """A perturbed ControlNet conditioned on the source frame must change
    the output vs controlnet_scale=0 (plumbing actually reaches the UNet)."""
    src = _gradient_frames(n=2, h=32, w=32)
    kw = dict(strength=0.6, num_inference_steps=2, batch_size=2,
              control_from_source="identity", output_type="frames")
    on = ctrl_pipeline.vid2vid(src, "p", controlnet_scale=1.0, **kw)
    off = ctrl_pipeline.vid2vid(src, "p", controlnet_scale=0.0, **kw)
    diff = max(np.abs(np.asarray(a).astype(int) - np.asarray(b).astype(int)
                      ).max() for a, b in zip(on, off))
    assert diff > 0


def test_vid2vid_control_args_mutually_exclusive(ctrl_pipeline):
    src = _gradient_frames(n=1, h=32, w=32)
    with pytest.raises(ValueError, match="mutually exclusive"):
        ctrl_pipeline.vid2vid(src, "p", control_video=src[0],
                              control_from_source="canny",
                              output_type="frames")


# ---------------------------------------------------------------------------
# server /vid2vid
# ---------------------------------------------------------------------------

def _req(host, port, method, path, body=None):
    import json
    from http.client import HTTPConnection
    conn = HTTPConnection(host, port, timeout=300)
    data = json.dumps(body).encode() if body is not None else None
    conn.request(method, path, body=data,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    payload = json.loads(resp.read())
    conn.close()
    return resp.status, payload


@pytest.fixture(scope="module")
def v2v_server(tmp_path_factory):
    from stable_diffusion_videos_tpu.pipeline import (
        StableDiffusionWalkPipeline)
    from stable_diffusion_videos_tpu.runtime.server import Server
    root = tmp_path_factory.mktemp("v2v_root")
    server = Server(StableDiffusionWalkPipeline.tiny(scheduler="ddim"),
                    output_root=str(root))
    host, port = server.start(port=0)
    yield host, port, server
    server.shutdown()


def _wait_job(host, port, job_id, timeout=240):
    import time
    deadline = time.time() + timeout
    while time.time() < deadline:
        _, job = _req(host, port, "GET", f"/jobs/{job_id}")
        if job["status"] in ("done", "error", "cancelled"):
            return job
        time.sleep(0.5)
    raise TimeoutError(job)


def test_server_vid2vid_upload(v2v_server, tmp_path):
    import base64
    host, port, server = v2v_server
    path = tmp_path / "up.mp4"
    with FrameWriter(path, fps=6) as w:
        for f in _gradient_frames(n=4, h=32, w=32):
            w.add_frame(f)
    raw = base64.b64encode(open(w.output_filepath, "rb").read()).decode()
    status, body = _req(host, port, "POST", "/vid2vid", {
        "video": raw, "prompt": "p", "strength": 0.5,
        "num_inference_steps": 2, "batch_size": 4, "name": "styled"})
    assert status == 202, body
    job = _wait_job(host, port, body["job_id"])
    assert job["status"] == "done", job
    assert job["result"]["video"].startswith(str(server.output_root))
    assert len(list(read_video_frames(job["result"]["video"]))) == 4
    assert job["progress"]["frames_done"] == 4
    # the uploaded temp file was cleaned up
    assert not list(server.output_root.glob(".upload_*"))


def test_server_vid2vid_validation(v2v_server):
    host, port, _ = v2v_server
    status, body = _req(host, port, "POST", "/vid2vid", {"prompt": "p"})
    assert status == 400 and "video" in body["error"]
    status, body = _req(host, port, "POST", "/vid2vid", {
        "prompt": "p", "video_path": "/etc/passwd"})
    assert status == 400 and "relative" in body["error"]
    status, body = _req(host, port, "POST", "/vid2vid", {
        "prompt": "p", "video_path": "../escape.mp4"})
    assert status == 400
    status, body = _req(host, port, "POST", "/vid2vid", {
        "prompt": "p", "video_path": "x.mp4", "output_dir": "zzz"})
    assert status == 400 and "unknown" in body["error"]
    status, body = _req(host, port, "POST", "/vid2vid", {"video_path": "x"})
    assert status == 400 and "prompt" in body["error"]


def test_server_vid2vid_video_path(v2v_server):
    host, port, server = v2v_server
    sub = server.output_root / "in"
    sub.mkdir(exist_ok=True)
    with FrameWriter(sub / "src.mp4", fps=6) as w:
        for f in _gradient_frames(n=3, h=32, w=32):
            w.add_frame(f)
    rel = str((sub / "src.mp4").relative_to(server.output_root))
    status, body = _req(host, port, "POST", "/vid2vid", {
        "video_path": rel, "prompt": "p", "num_inference_steps": 2,
        "batch_size": 4, "name": "from_path"})
    assert status == 202, body
    job = _wait_job(host, port, body["job_id"])
    assert job["status"] == "done", job
    assert len(list(read_video_frames(job["result"]["video"]))) == 3
