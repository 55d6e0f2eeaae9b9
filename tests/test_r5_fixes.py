"""Regression tests for round-5 fixes (VERDICT r4 + ADVICE r4 findings):

- HBM split-retry must slice list-valued kwargs (multi-ControlNet maps)
  and ip_tokens; the retried halves must reproduce the unsplit dispatch
  (VERDICT r4 weak #4 / next #5).
- fast=True with a ControlNet must drop step_cache at construction (keep
  the guidance interval) instead of erroring mid-walk (weak #5 / next #6).
- set_scheduler must not invalidate other samplers' compiled programs, and
  a dispatch that snapshotted (name, sched) before a concurrent switch must
  complete under the OLD sampler (ADVICE r4 medium: engine.py:192).
- walk() defaults to the family-best batch size (weak #6 / next #7).
- The native-AVI reader derives fps from the EXACT strh scale/rate
  rational, not the truncated avih usec/frame (ADVICE r4: video.py:219).
- probe_video prefers the native reader for RIFF/AVI files when cv2 is
  absent (frame count survives); the ffmpeg probe falls back to tbr and
  reports fps=None rather than fabricating 30.0 (ADVICE r4: video.py:281).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_videos_tpu.models.bundle import SDModels
from stable_diffusion_videos_tpu.models.controlnet import ControlNetBundle
from stable_diffusion_videos_tpu.runtime.engine import Engine


# ---------------------------------------------------------------------------
# OOM split-retry with structured kwargs
# ---------------------------------------------------------------------------

def test_hbm_retry_slices_control_and_ip(monkeypatch):
    """Force the RESOURCE_EXHAUSTED retry path on a real engine carrying
    multi-ControlNet maps (list kwarg) + IP-Adapter tokens; the recovered
    frames must match the unsplit dispatch exactly."""
    from stable_diffusion_videos_tpu.models.ip_adapter import IPAdapter
    models = SDModels.tiny()
    bundles = [ControlNetBundle.tiny(perturb=True),
               ControlNetBundle.tiny(seed=7, perturb=True)]
    ip = IPAdapter.tiny(unet_config=models.unet_config, perturb=True)
    eng = Engine(models, scheduler="ddim", controlnet=bundles, ip_adapter=ip)

    B = 4
    cond = eng.embed_text([f"p{i}" for i in range(B)])
    uncond = eng.embed_text("")
    noise = jax.random.normal(jax.random.PRNGKey(0), (B, 8, 8, 4))
    size = models.default_size
    ctrl = [np.asarray(jax.random.uniform(jax.random.PRNGKey(i + 1),
                                          (B, size, size, 3)))
            for i in range(2)]
    tok = np.asarray(
        jax.random.normal(jax.random.PRNGKey(9),
                          (B,) + eng.ip.uncond_tokens().shape[-2:]),
        np.float32)

    kw = dict(num_inference_steps=3, control=ctrl,
              control_scale=[1.0, 0.5], ip_tokens=tok, ip_scale=0.7,
              key=jax.random.PRNGKey(3))
    expected = eng.denoise_frames(cond, uncond, noise, **kw)

    real_async = eng.denoise_frames_async
    state = {"failed": False, "batches": []}

    def flaky(c, u, n, **k):
        if n.shape[0] == B and not state["failed"]:
            state["failed"] = True
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: fake OOM for test")
        state["batches"].append(n.shape[0])
        return real_async(c, u, n, **k)

    monkeypatch.setattr(eng, "denoise_frames_async", flaky)
    out = eng.denoise_frames(cond, uncond, noise, **kw)
    assert state["batches"] == [2, 2]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_hbm_retry_broadcast_control_untouched(monkeypatch):
    """A broadcast (1, H, W, 3) control map must NOT be sliced by the
    retry (both halves see the same map)."""
    models = SDModels.tiny()
    eng = Engine(models, scheduler="ddim",
                 controlnet=ControlNetBundle.tiny(perturb=True))
    B = 2
    cond = eng.embed_text(["a", "b"])
    uncond = eng.embed_text("")
    noise = jax.random.normal(jax.random.PRNGKey(0), (B, 8, 8, 4))
    size = models.default_size
    ctrl = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                         (1, size, size, 3)))
    kw = dict(num_inference_steps=2, control=ctrl, key=jax.random.PRNGKey(2))
    expected = eng.denoise_frames(cond, uncond, noise, **kw)

    real_async = eng.denoise_frames_async
    state = {"failed": False}

    def flaky(c, u, n, **k):
        if n.shape[0] == B and not state["failed"]:
            state["failed"] = True
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: fake OOM for test")
        assert k["control"].shape[0] == 1  # broadcast row passes through
        return real_async(c, u, n, **k)

    monkeypatch.setattr(eng, "denoise_frames_async", flaky)
    out = eng.denoise_frames(cond, uncond, noise, **kw)
    np.testing.assert_allclose(out, expected, atol=1e-5)


# ---------------------------------------------------------------------------
# fast preset x ControlNet
# ---------------------------------------------------------------------------

def test_fast_preset_drops_step_cache_with_controlnet():
    from stable_diffusion_videos_tpu.pipeline import \
        StableDiffusionWalkPipeline
    models = SDModels.tiny()
    pipe = StableDiffusionWalkPipeline(
        models, fast=True, controlnet=ControlNetBundle.tiny(perturb=True))
    assert pipe.engine.step_cache is None
    assert pipe.engine.guidance_interval == (0.1, 0.85)
    # the dispatch that used to raise mid-walk now works
    cond = pipe.engine.embed_text("a")
    noise = jnp.zeros((1, 8, 8, 4))
    size = models.default_size
    out = pipe.engine.denoise_frames(
        cond, cond, noise, num_inference_steps=2,
        control=jnp.zeros((1, size, size, 3)))
    assert np.isfinite(out).all()


def test_fast_preset_without_controlnet_unchanged():
    from stable_diffusion_videos_tpu.pipeline import \
        StableDiffusionWalkPipeline
    pipe = StableDiffusionWalkPipeline(SDModels.tiny(), fast=True)
    assert pipe.engine.step_cache == 3
    assert pipe.engine.guidance_interval == (0.1, 0.85)


def test_fast_explicit_step_cache_with_controlnet_still_rejected():
    """An EXPLICIT step_cache= with a ControlNet keeps the dispatch-time
    error (the user overrode the preset; silence would be wrong)."""
    from stable_diffusion_videos_tpu.pipeline import \
        StableDiffusionWalkPipeline
    models = SDModels.tiny()
    pipe = StableDiffusionWalkPipeline(
        models, fast=True, step_cache=2,
        controlnet=ControlNetBundle.tiny())
    cond = pipe.engine.embed_text("a")
    size = models.default_size
    with pytest.raises(ValueError, match="step_cache"):
        pipe.engine.denoise_frames(
            cond, cond, jnp.zeros((1, 8, 8, 4)), num_inference_steps=2,
            control=jnp.zeros((1, size, size, 3)))


# ---------------------------------------------------------------------------
# scheduler switching: keyed caches + atomic snapshot
# ---------------------------------------------------------------------------

def test_set_scheduler_keeps_compiled_programs():
    models = SDModels.tiny()
    eng = Engine(models, scheduler="ddim")
    cond = eng.embed_text("a")
    noise = jnp.zeros((1, 8, 8, 4))
    eng.denoise_frames(cond, cond, noise, num_inference_steps=2)
    n_ddim = len(eng._compiled)
    assert n_ddim >= 1
    assert all(k[0] == "ddim" for k in eng._compiled)

    eng.set_scheduler("euler")
    assert len(eng._compiled) == n_ddim  # programs survive the switch
    eng.denoise_frames(cond, cond, noise, num_inference_steps=2)
    assert {k[0] for k in eng._compiled} == {"ddim", "euler"}
    n_both = len(eng._compiled)

    # switching BACK is free: the ddim program is still hot
    eng.set_scheduler("ddim")
    eng.denoise_frames(cond, cond, noise, num_inference_steps=2)
    assert len(eng._compiled) == n_both


def test_dispatch_snapshot_survives_concurrent_switch():
    """A dispatch that snapshotted its sampler completes under that sampler
    even when set_scheduler runs before compile/table fetch (the ADVICE r4
    race: new program + old tables / user A under user B's sampler)."""
    models = SDModels.tiny()
    eng = Engine(models, scheduler="ddim")
    cond = eng.embed_text("a")
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    want_ddim = eng.denoise_frames(cond, cond, noise, num_inference_steps=3,
                                   key=jax.random.PRNGKey(1))

    # replay the race deterministically: snapshot, then a concurrent
    # request switches the engine, then THIS request fetches tables+program
    name, sched = eng._sched_snapshot()
    eng.set_scheduler("euler")
    tables = eng._tables(3, 0.0, sched_name=name, sched=sched)
    fn = eng._get_compiled(eng.batch_bucket, 8, 8, 3, cond.shape[1],
                           sched_name=name, sched=sched)
    from stable_diffusion_videos_tpu.parallel.mesh import batch_sharding
    bs = batch_sharding(eng.mesh)
    Bp = eng.batch_bucket
    pad = [(0, Bp - 1)] + [(0, 0)] * 2
    ctx = jax.device_put(jnp.concatenate(
        [jnp.pad(cond, pad), jnp.pad(cond, pad)], axis=0), bs)
    lat = jax.device_put(jnp.pad(noise, [(0, Bp - 1)] + [(0, 0)] * 3), bs)
    got = np.asarray(fn(eng._params, ctx, (), (), lat, jnp.float32(7.5),
                        tables, jax.random.PRNGKey(1)))[:1]
    np.testing.assert_allclose(got, want_ddim, atol=1e-5)

    # and the engine-level state moved on: new dispatches run euler
    want_euler = eng.denoise_frames(cond, cond, noise,
                                    num_inference_steps=3,
                                    key=jax.random.PRNGKey(1))
    assert float(np.abs(want_euler - want_ddim).max()) > 1e-6


# ---------------------------------------------------------------------------
# walk() batch-size default
# ---------------------------------------------------------------------------

def test_walk_defaults_to_family_best_batch(tmp_path, caplog):
    import inspect
    import logging

    from stable_diffusion_videos_tpu.pipeline import \
        StableDiffusionWalkPipeline
    sig = inspect.signature(StableDiffusionWalkPipeline.walk)
    assert sig.parameters["batch_size"].default is None

    pipe = StableDiffusionWalkPipeline.tiny(scheduler="ddim")
    with caplog.at_level(logging.INFO, logger="sdv_tpu"):
        out = pipe.walk(prompts=["a", "b"], seeds=[1, 2],
                        num_interpolation_steps=3, output_dir=str(tmp_path),
                        name="defbatch", num_inference_steps=2,
                        make_video=False)
    assert out is not None
    assert any("measured-best" in r.message for r in caplog.records)


# ---------------------------------------------------------------------------
# media: exact rational fps + probe ladder order
# ---------------------------------------------------------------------------

pytestmark_native = pytest.mark.skipif(
    not __import__(
        "stable_diffusion_videos_tpu.media.native_sink", fromlist=["x"]
    ).native_available(),
    reason="native media sink unavailable (no compiler)")


@pytestmark_native
def test_native_avi_reader_exact_fractional_fps(tmp_path):
    """29.97 must read back EXACTLY from strh scale/rate (the avih
    usec/frame field is integer-truncated by the writer)."""
    from stable_diffusion_videos_tpu.media.native_sink import NativeAviSink
    from stable_diffusion_videos_tpu.media.video import _read_native_avi
    path = tmp_path / "f.avi"
    with NativeAviSink(path, 32, 32, fps=29.97) as sink:
        for _ in range(3):
            sink.add_frame(np.zeros((32, 32, 3), np.uint8))
    fps, gen = _read_native_avi(path)
    assert fps == pytest.approx(29.97, abs=1e-9)
    assert sum(1 for _ in gen) == 3


@pytestmark_native
def test_probe_video_native_before_ffmpeg(tmp_path, monkeypatch):
    """Without cv2, our own AVIs must be probed by the native reader (real
    frame count + exact fps), not the ffmpeg rung (n_frames=0)."""
    from stable_diffusion_videos_tpu.media import video as V
    from stable_diffusion_videos_tpu.media.native_sink import NativeAviSink
    path = tmp_path / "p.avi"
    with NativeAviSink(path, 48, 32, fps=12.5) as sink:
        for _ in range(5):
            sink.add_frame(np.zeros((32, 48, 3), np.uint8))
    monkeypatch.setitem(sys.modules, "cv2", None)  # import cv2 -> ImportError
    info = V.probe_video(path)
    assert info["n_frames"] == 5
    assert info["fps"] == pytest.approx(12.5, abs=1e-9)
    assert (info["width"], info["height"]) == (48, 32)


def test_probe_video_foreign_avi_not_routed_to_native_reader(tmp_path,
                                                             monkeypatch):
    """A RIFF/AVI file with a foreign codec (XVID) must NOT short-circuit
    into the pure-Python MJPEG reader — it has to fall through to the
    ffmpeg probe rung like any other container (the native reader would
    PIL-decode its chunks and crash)."""
    from stable_diffusion_videos_tpu.media import video as V
    path = tmp_path / "foreign.avi"
    # minimal header shape: RIFF//AVI magic + a vids strh with XVID handler
    path.write_bytes(b"RIFF" + (1000).to_bytes(4, "little") + b"AVI "
                     + b"strh" + (56).to_bytes(4, "little")
                     + b"vidsXVID" + b"\0" * 48)
    assert not V._is_native_avi(path)
    monkeypatch.setitem(sys.modules, "cv2", None)
    sentinel = dict(fps=24.0, n_frames=0, width=640, height=480)
    monkeypatch.setattr(V, "_probe_via_ffmpeg", lambda p: sentinel)
    assert V.probe_video(path) is sentinel
    # and our own muxer's header IS recognised
    native = tmp_path / "native.avi"
    native.write_bytes(b"RIFF" + (1000).to_bytes(4, "little") + b"AVI "
                       + b"strh" + (56).to_bytes(4, "little")
                       + b"vidsMJPG" + b"\0" * 48)
    assert V._is_native_avi(native)


def test_ffmpeg_probe_no_fabricated_fps(monkeypatch):
    """When ffmpeg's stream line lacks fps, fall back to tbr; when neither
    is present, report fps=None — never 30.0."""
    import subprocess as sp

    from stable_diffusion_videos_tpu.media import video as V

    def fake_run(stderr):
        class R:
            pass
        r = R()
        r.stderr = stderr
        return r

    monkeypatch.setattr(V, "_find_ffmpeg", lambda: "/usr/bin/ffmpeg")
    monkeypatch.setattr(
        sp, "run", lambda *a, **k: fake_run(
            "  Stream #0:0: Video: h264, yuv420p, 640x480, 23.98 tbr\n"))
    info = V._probe_via_ffmpeg("x.mp4")
    assert info["fps"] == pytest.approx(23.98)

    monkeypatch.setattr(
        sp, "run", lambda *a, **k: fake_run(
            "  Stream #0:0: Video: h264, yuv420p, 640x480\n"))
    info = V._probe_via_ffmpeg("x.mp4")
    assert info["fps"] is None
    assert info["width"] == 640


# ---------------------------------------------------------------------------
# validate stage context: KeyboardInterrupt must propagate
# ---------------------------------------------------------------------------

def test_validate_stage_reraises_base_exceptions():
    from stable_diffusion_videos_tpu.utils.validate import _stage
    report = {"stages": {}}
    with _stage(report, "ok-stage"):
        pass
    assert report["stages"]["ok-stage"]["status"] == "ok"

    with _stage(report, "err-stage"):
        raise RuntimeError("boom")  # swallowed: stages are independent
    assert report["stages"]["err-stage"]["status"] == "error"

    with pytest.raises(KeyboardInterrupt):
        with _stage(report, "ctrl-c"):
            raise KeyboardInterrupt
    assert report["stages"]["ctrl-c"]["status"] == "error"
