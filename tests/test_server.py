"""HTTP serving tests (stdlib client against a live server, tiny model)."""

import base64
import io
import json
import time
from http.client import HTTPConnection

import numpy as np
import pytest


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline
    from stable_diffusion_videos_tpu.runtime.server import Server
    root = tmp_path_factory.mktemp("walk_root")
    server = Server(StableDiffusionWalkPipeline.tiny(),
                    output_root=str(root))
    host, port = server.start(port=0)
    yield host, port, server
    server.shutdown()


def _req(host, port, method, path, body=None):
    conn = HTTPConnection(host, port, timeout=300)
    data = json.dumps(body).encode() if body is not None else None
    conn.request(method, path, body=data,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    payload = json.loads(resp.read())
    conn.close()
    return resp.status, payload


def test_health(served):
    host, port, _ = served
    status, body = _req(host, port, "GET", "/health")
    assert status == 200
    assert body["status"] == "ok"
    assert body["devices"] >= 1


def test_generate(served):
    host, port, _ = served
    status, body = _req(host, port, "POST", "/generate", {
        "prompt": "a tiny fox", "num_inference_steps": 2, "count": 2,
        "seed": 5})
    assert status == 200
    assert len(body["images"]) == 2
    assert body["seeds"] == [5, 6]
    from PIL import Image
    img = Image.open(io.BytesIO(base64.b64decode(body["images"][0])))
    assert img.size == (16, 16)


def test_generate_validation(served):
    host, port, _ = served
    status, body = _req(host, port, "POST", "/generate", {})
    assert status == 400 and "prompt" in body["error"]
    status, body = _req(host, port, "POST", "/generate",
                        {"prompt": "x", "seeds": [1, 2]})
    assert status == 400


def test_bad_json(served):
    host, port, _ = served
    conn = HTTPConnection(host, port, timeout=60)
    conn.request("POST", "/generate", body=b"{not json",
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 400
    conn.close()


def test_unknown_routes(served):
    host, port, _ = served
    assert _req(host, port, "GET", "/nope")[0] == 404
    assert _req(host, port, "POST", "/nope")[0] == 404
    assert _req(host, port, "GET", "/jobs/zzz")[0] == 404


def test_walk_job(served, tmp_path):
    host, port, server = served
    status, body = _req(host, port, "POST", "/walk", {
        "prompts": ["a", "b"], "seeds": [1, 2],
        "num_interpolation_steps": 2, "num_inference_steps": 2,
        "fps": 2, "output_dir": "runs", "name": "served"})
    assert status == 202
    job_id = body["job_id"]
    deadline = time.time() + 240
    while time.time() < deadline:
        status, job = _req(host, port, "GET", f"/jobs/{job_id}")
        if job["status"] in ("done", "error"):
            break
        time.sleep(1)
    assert job["status"] == "done", job
    assert job["result"]["video"].endswith(".mp4")
    # confined under the server's output root
    assert job["result"]["video"].startswith(str(server.output_root))
    assert job["result"]["perf"]["frames"] >= 2
    # progress streamed into the job while it ran (final state: complete)
    assert job["progress"]["frames_done"] == job["progress"]["frames_total"] \
        == 2
    assert job["progress"]["clips_total"] == 1


def test_walk_job_error_surfaced(served):
    host, port, _ = served
    _, body = _req(host, port, "POST", "/walk", {"prompts": ["only one"],
                                                 "seeds": [1]})
    job_id = body["job_id"]
    deadline = time.time() + 60
    while time.time() < deadline:
        _, job = _req(host, port, "GET", f"/jobs/{job_id}")
        if job["status"] in ("done", "error"):
            break
        time.sleep(0.5)
    assert job["status"] == "error"
    assert "ValueError" in job["error"]


def test_concurrent_generate(served):
    import threading
    host, port, _ = served
    results = []

    def call(seed):
        status, body = _req(host, port, "POST", "/generate", {
            "prompt": "concurrent", "num_inference_steps": 2, "seed": seed})
        results.append((status, body["seeds"]))

    threads = [threading.Thread(target=call, args=(s,)) for s in (11, 22)]
    [t.start() for t in threads]
    [t.join(timeout=240) for t in threads]
    assert len(results) == 2
    assert all(status == 200 for status, _ in results)
    assert {tuple(s) for _, s in results} == {(11,), (22,)}


def test_img2img_endpoint(tmp_path):
    import io as _io

    import numpy as np
    from PIL import Image

    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.runtime.server import Server
    server = Server(StableDiffusionWalkPipeline(SDModels.tiny(),
                                                scheduler="ddim"))
    host, port = server.start(port=0)
    try:
        img = Image.fromarray(np.random.default_rng(0)
                              .integers(0, 255, (16, 16, 3)).astype(np.uint8))
        buf = _io.BytesIO()
        img.save(buf, format="PNG")
        status, body = _req(host, port, "POST", "/img2img", {
            "image": base64.b64encode(buf.getvalue()).decode(),
            "prompt": "remix", "num_inference_steps": 3, "strength": 0.6})
        assert status == 200
        out = Image.open(_io.BytesIO(base64.b64decode(body["images"][0])))
        assert out.size == (16, 16)
        # missing image -> 400
        status, body = _req(host, port, "POST", "/img2img", {"prompt": "x"})
        assert status == 400
    finally:
        server.shutdown()


def test_inpaint_endpoint():
    import io as _io

    import numpy as np
    from PIL import Image

    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline
    from stable_diffusion_videos_tpu.runtime.server import Server
    server = Server(StableDiffusionWalkPipeline(SDModels.tiny(),
                                                scheduler="ddim"))
    host, port = server.start(port=0)
    try:
        def b64(arr, mode="RGB"):
            buf = _io.BytesIO()
            Image.fromarray(arr, mode).save(buf, format="PNG")
            return base64.b64encode(buf.getvalue()).decode()

        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        mask = np.zeros((16, 16), np.uint8)
        mask[:, 8:] = 255
        status, body = _req(host, port, "POST", "/inpaint", {
            "image": b64(img), "mask": b64(mask, "L"), "prompt": "patch",
            "num_inference_steps": 3})
        assert status == 200 and len(body["images"]) == 1
        status, _ = _req(host, port, "POST", "/inpaint", {"prompt": "x"})
        assert status == 400
    finally:
        server.shutdown()


# ---------------------------------------------------------------------------
# /walk hardening (kwarg allowlist + output confinement)
# ---------------------------------------------------------------------------
def test_walk_rejects_unknown_kwargs(served):
    host, port, _ = served
    status, body = _req(host, port, "POST", "/walk", {
        "prompts": ["a", "b"], "seeds": [1, 2], "bogus_flag": True})
    assert status == 400
    assert "bogus_flag" in body["error"]


def test_walk_rejects_absolute_output_dir(served, tmp_path):
    host, port, _ = served
    status, body = _req(host, port, "POST", "/walk", {
        "prompts": ["a", "b"], "seeds": [1, 2],
        "output_dir": str(tmp_path)})
    assert status == 400
    assert "relative" in body["error"]


def test_walk_rejects_path_escape(served):
    host, port, _ = served
    status, body = _req(host, port, "POST", "/walk", {
        "prompts": ["a", "b"], "seeds": [1, 2],
        "output_dir": "../../etc"})
    assert status == 400
    assert "escape" in body["error"]


def test_walk_rejects_upsample_weights_kwarg(served):
    """Server filesystem paths are operator-configured, never
    caller-controlled."""
    host, port, _ = served
    status, body = _req(host, port, "POST", "/walk", {
        "prompts": ["a", "b"], "seeds": [1, 2],
        "upsample_weights": "/etc/passwd"})
    assert status == 400


def test_walk_audio_path_confined(served):
    host, port, _ = served
    status, body = _req(host, port, "POST", "/walk", {
        "prompts": ["a", "b"], "seeds": [1, 2],
        "audio_filepath": "/etc/passwd"})
    assert status == 400


def test_walk_clamps_steps_and_sides(served):
    """Oversized steps/height/width are clamped before reaching the job
    (same ceilings as /generate) — the walk is accepted, not 400'd."""
    host, port, server = served
    status, body = _req(host, port, "POST", "/walk", {
        "prompts": ["a", "b"], "seeds": [1, 2],
        "num_interpolation_steps": 2, "num_inference_steps": 99999,
        "fps": 2, "name": "clamped", "make_video": False})
    assert status == 202
    deadline = time.time() + 240
    while time.time() < deadline:
        _, job = _req(host, port, "GET", f"/jobs/{body['job_id']}")
        if job["status"] in ("done", "error"):
            break
        time.sleep(1)
    assert job["status"] == "done", job


# ---------------------------------------------------------------------------
# job cancellation (DELETE /jobs/<id>)
# ---------------------------------------------------------------------------
def test_walk_job_cancel(served):
    host, port, server = served
    status, body = _req(host, port, "POST", "/walk", {
        "prompts": ["c1", "c2", "c3", "c4"], "seeds": [1, 2, 3, 4],
        "num_interpolation_steps": 8, "num_inference_steps": 4,
        "fps": 2, "output_dir": "cancel_run", "name": "tokill"})
    assert status == 202
    job_id = body["job_id"]
    # wait until it is actually producing frames, then cancel
    deadline = time.time() + 120
    while time.time() < deadline:
        _, job = _req(host, port, "GET", f"/jobs/{job_id}")
        if job["status"] == "running" and job.get("progress", {}) \
                .get("frames_done", 0) > 0:
            break
        if job["status"] in ("done", "error"):
            pytest.fail(f"job finished before cancel: {job}")
        time.sleep(0.2)
    status, body = _req(host, port, "DELETE", f"/jobs/{job_id}")
    assert status == 202 and body["status"] == "cancelling"
    deadline = time.time() + 120
    while time.time() < deadline:
        _, job = _req(host, port, "GET", f"/jobs/{job_id}")
        if job["status"] in ("cancelled", "done", "error"):
            break
        time.sleep(0.5)
    assert job["status"] == "cancelled", job
    # the FINAL video must not exist, and no half-written container may be
    # left claiming completion.  A complete per-clip mp4 MAY legitimately
    # exist (the family-best batch default can finish clip 0 in a single
    # dispatch before the cancel lands; resume skips such clips) — any
    # survivor must probe as a valid container, not a truncated one.
    import pathlib

    from stable_diffusion_videos_tpu.media.video import probe_video
    run = pathlib.Path(server.output_root) / "cancel_run" / "tokill"
    assert not (run / "tokill.mp4").exists()
    assert not (run / "tokill.avi").exists()
    for clip in list(run.glob("*/*.mp4")) + list(run.glob("*/*.avi")):
        info = probe_video(clip)
        assert info["width"] > 0, f"half-written container {clip}: {info}"
    # a cancelled job cannot be re-cancelled
    status, _ = _req(host, port, "DELETE", f"/jobs/{job_id}")
    assert status == 409


def test_cancel_unknown_and_done_jobs(served):
    host, port, _ = served
    assert _req(host, port, "DELETE", "/jobs/zzz")[0] == 404
    assert _req(host, port, "DELETE", "/nope")[0] == 404


def test_warmup_sync(served):
    """POST /warmup precompiles programs for the requested samplers; a
    subsequent /generate under a prewarmed sampler hits the program cache
    (VERDICT r4 #9 — serving cold-start elimination)."""
    host, port, server = served
    eng = server.pipeline.engine
    before = len(eng._compiled)
    orig = eng.scheduler_name
    status, body = _req(host, port, "POST", "/warmup", {
        "num_inference_steps": 2, "schedulers": ["pndm", "ddim"],
        "batches": [2]})
    assert status == 200, body
    assert set(body["schedulers"]) == {"pndm", "ddim"}
    assert all(s >= 0 for s in body["schedulers"].values())
    assert body["compiled_programs"] > before
    assert eng.scheduler_name == orig  # warmup restored the sampler
    # a /generate at the warmed shape must not add a program
    warmed = len(eng._compiled)
    status, body = _req(host, port, "POST", "/generate", {
        "prompt": "warm", "num_inference_steps": 2, "count": 2})
    assert status == 200
    assert len(eng._compiled) == warmed


def test_warmup_validation(served):
    host, port, _ = served
    status, body = _req(host, port, "POST", "/warmup",
                        {"schedulers": ["nope"]})
    assert status == 400 and "nope" in body["error"]
    status, body = _req(host, port, "POST", "/warmup", {"bogus": 1})
    assert status == 400 and "bogus" in body["error"]
    status, body = _req(host, port, "POST", "/warmup",
                        {"output_dtypes": ["float64"]})
    assert status == 400
    # non-list values must 400 with a shape message, not iterate chars
    # ("unknown scheduler d") or TypeError
    status, body = _req(host, port, "POST", "/warmup", {"batches": 8})
    assert status == 400 and "list" in body["error"]
    status, body = _req(host, port, "POST", "/warmup",
                        {"schedulers": "ddim"})
    assert status == 400 and "list" in body["error"]


def test_warmup_async(served):
    host, port, _ = served
    status, body = _req(host, port, "POST", "/warmup", {
        "num_inference_steps": 2, "batches": [1], "async": True})
    assert status == 202 and "job_id" in body
    deadline = time.time() + 300
    while time.time() < deadline:
        status, job = _req(host, port, "GET", f"/jobs/{body['job_id']}")
        if job["status"] in ("done", "error"):
            break
        time.sleep(0.2)
    assert job["status"] == "done", job
    assert "schedulers" in job["result"]
