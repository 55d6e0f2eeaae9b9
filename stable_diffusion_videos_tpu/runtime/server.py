"""HTTP serving — stdlib JSON API over the walk pipeline.

Production-facing counterpart of the reference's gradio-only serving story
(reference ``app.py``): no dependencies, thread-per-connection
(``ThreadingHTTPServer``), one dispatch lock serialising device work, and a
background job manager for long walks.

Endpoints:
* ``GET  /health``            -> {status, backend, devices, jobs}
* ``POST /generate``          -> {images: [base64 PNG, ...], seeds: [...]}
    body: {prompt | prompts, negative_prompt?, seed?, num_inference_steps?,
           guidance_scale?, height?, width?, count?}
* ``POST /walk``              -> {job_id}   (async; body = walk() kwargs)
* ``POST /vid2vid``           -> {job_id}   (async video restyling;
    body: {video (base64) | video_path (relative), prompt, strength?,
           name?, fps?, frame_skip?, max_frames?, ... see VID2VID_KWARGS})
* ``POST /img2img`` / ``POST /inpaint`` -> {images: [base64 PNG]}
* ``POST /warmup``            -> {schedulers: {name: secs}, ...} (sync) or
    {job_id} with ``async: true`` — precompiles denoise programs so the
    first real request is served at steady-state latency
* ``GET  /jobs/<id>``         -> {status: queued|running|cancelling|
                                  cancelled|done|error, progress?: {clip,
                                  clips_total, frames_done, frames_total},
                                  result?, error?, perf?}
* ``DELETE /jobs/<id>``       -> 202 {status: cancelling} (at the next
                                  frame-batch boundary; the half-written
                                  video container is removed)

Start: ``python -m stable_diffusion_videos_tpu serve --checkpoint ...`` or
``Server(pipeline).serve_forever(port=8000)``.
"""

from __future__ import annotations

import base64
import io
import json
import logging
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

logger = logging.getLogger("sdv_tpu")


class JobCancelled(Exception):
    """Raised inside a job when its cancel event is set (the walk's
    cleanup path removes any half-written video container)."""


class JobManager:
    def __init__(self):
        self._jobs: dict[str, dict] = {}
        self._cancel: dict[str, threading.Event] = {}
        self._lock = threading.Lock()

    def submit(self, fn, *args, **kwargs) -> str:
        job_id = uuid.uuid4().hex[:12]
        with self._lock:
            self._jobs[job_id] = {"status": "queued"}
            self._cancel[job_id] = threading.Event()

        def run():
            with self._lock:
                if self._cancel[job_id].is_set():  # cancelled while queued
                    self._jobs[job_id]["status"] = "cancelled"
                    return
                self._jobs[job_id]["status"] = "running"
            try:
                result = fn(*args, **kwargs)
                with self._lock:
                    self._jobs[job_id].update(status="done", result=result)
            except JobCancelled:
                logger.info("job %s cancelled", job_id)
                with self._lock:
                    self._jobs[job_id]["status"] = "cancelled"
            except Exception as e:  # surfaced via the API, not swallowed
                logger.exception("job %s failed", job_id)
                with self._lock:
                    self._jobs[job_id].update(status="error",
                                              error=f"{type(e).__name__}: {e}")

        threading.Thread(target=run, daemon=True).start()
        return job_id

    def cancel(self, job_id: str) -> bool:
        """Request cancellation; takes effect at the next progress tick
        (frame-batch granularity — one sharded dispatch is never
        interrupted mid-flight)."""
        with self._lock:
            if job_id not in self._jobs:
                return False
            if self._jobs[job_id]["status"] in ("done", "error", "cancelled"):
                return False
            self._cancel[job_id].set()
            self._jobs[job_id]["status"] = "cancelling"
            return True

    def cancel_event(self, job_id: str) -> threading.Event:
        with self._lock:
            return self._cancel[job_id]

    def update(self, job_id: str, **fields):
        with self._lock:
            if job_id in self._jobs:
                self._jobs[job_id].update(fields)

    def get(self, job_id: str) -> dict | None:
        with self._lock:
            job = self._jobs.get(job_id)
            return dict(job) if job else None

    def count(self) -> dict:
        with self._lock:
            out: dict[str, int] = {}
            for j in self._jobs.values():
                out[j["status"]] = out.get(j["status"], 0) + 1
            return out


class Server:
    #: request-parameter ceilings — an unauthenticated caller must not be
    #: able to pin the accelerator with count=10^6 or steps=10^5
    MAX_COUNT = 64
    MAX_STEPS = 200
    MAX_SIDE = 2048

    #: the only /walk body keys forwarded into walk() — anything else is a
    #: 400 up front, not a TypeError inside the job.  Deliberately absent:
    #: output_dir (handled separately and confined under output_root),
    #: params/jit (engine-managed shims), upsample_weights (server
    #: filesystem path — operator-configured, not caller-controlled).
    WALK_KWARGS = frozenset({
        "prompts", "seeds", "num_interpolation_steps", "name",
        "image_file_ext", "fps", "num_inference_steps", "guidance_scale",
        "eta", "height", "width", "upsample", "batch_size", "resume",
        "audio_filepath", "audio_start_sec", "margin", "smooth",
        "negative_prompt", "make_video", "output_dir",
    })

    def __init__(self, pipeline, max_batch: int = 16,
                 batch_delay_ms: float = 25.0,
                 output_root: str = "./dreams"):
        from pathlib import Path

        from .batcher import DynamicBatcher
        self.pipeline = pipeline
        self.jobs = JobManager()
        self.dispatch_lock = threading.Lock()  # serialises long walk jobs
        #: concurrent /generate requests with the same signature merge into
        #: one sharded dispatch
        self.batcher = DynamicBatcher(pipeline, max_batch=max_batch,
                                      max_delay_ms=batch_delay_ms)
        #: all /walk output is confined under this directory
        self.output_root = Path(output_root).resolve()
        self._httpd = None

    def _confine(self, sub: str | None) -> str:
        """Resolve a client-supplied output_dir under output_root; reject
        absolute paths and .. escapes (the raw body previously reached
        walk(output_dir=...) verbatim — an arbitrary-write primitive)."""
        from pathlib import Path
        if sub is None:
            return str(self.output_root)
        p = Path(str(sub))
        if p.is_absolute():
            raise ValueError("output_dir must be relative (it is created "
                             "under the server's output root)")
        full = (self.output_root / p).resolve()
        if full != self.output_root and \
                self.output_root not in full.parents:
            raise ValueError("output_dir escapes the server output root")
        return str(full)

    def _steps(self, body: dict) -> int:
        return max(1, min(int(body.get("num_inference_steps", 50)),
                          self.MAX_STEPS))

    def _side(self, body: dict, key: str):
        v = body.get(key)
        if v is None:
            return None
        return max(64, min(int(v), self.MAX_SIDE))

    # ------------------------------------------------------------------
    def _handle_health(self):
        import jax
        return {
            "status": "ok",
            "backend": jax.default_backend(),
            "devices": jax.device_count(),
            "mesh": dict(self.pipeline.engine.mesh.shape),
            "jobs": self.jobs.count(),
            "compiled_programs": len(self.pipeline.engine._compiled),
        }

    def _handle_generate(self, body: dict):
        prompts = body.get("prompts") or [body.get("prompt")]
        if not prompts or prompts[0] is None:
            raise ValueError("missing 'prompt' or 'prompts'")
        count = int(body.get("count", 1))
        if count > self.MAX_COUNT:
            raise ValueError(f"count {count} > limit {self.MAX_COUNT}")
        if count > 1 and len(prompts) == 1:
            prompts = prompts * count
        if len(prompts) > self.MAX_COUNT:
            raise ValueError(f"{len(prompts)} prompts > limit "
                             f"{self.MAX_COUNT}")
        seed = int(body.get("seed", 0))
        seeds = body.get("seeds") or [seed + i for i in range(len(prompts))]
        if len(seeds) != len(prompts):
            raise ValueError("len(seeds) != len(prompts)")

        pipe = self.pipeline
        futures = [self.batcher.submit(
            prompt, seed,
            num_inference_steps=self._steps(body),
            guidance_scale=float(body.get("guidance_scale", 7.5)),
            eta=float(body.get("eta", 0.0)),
            height=self._side(body, "height"),
            width=self._side(body, "width"),
            negative_prompt=body.get("negative_prompt"))
            for prompt, seed in zip(prompts, seeds)]
        images = np.stack([f.result(timeout=600) for f in futures])
        out = []
        for pil in pipe._postprocess(images):
            buf = io.BytesIO()
            pil.save(buf, format="PNG")
            out.append(base64.b64encode(buf.getvalue()).decode())
        return {"images": out, "seeds": list(map(int, seeds)),
                "format": "png;base64"}

    def _handle_img2img(self, body: dict):
        if "image" not in body or "prompt" not in body:
            raise ValueError("img2img requires 'image' (base64 PNG/JPEG) "
                             "and 'prompt'")
        from PIL import Image
        img = Image.open(io.BytesIO(base64.b64decode(body["image"])))
        ip_kw = {}
        if body.get("ip_image"):
            # image prompt (base64) — requires a server pipeline built with
            # ip_adapter=; the pipeline raises a clear ValueError otherwise
            ip_kw = dict(
                ip_image=Image.open(
                    io.BytesIO(base64.b64decode(body["ip_image"]))),
                ip_scale=float(body.get("ip_scale", 1.0)))
        with self.dispatch_lock:
            pils = self.pipeline.img2img(
                img, body["prompt"],
                strength=float(body.get("strength", 0.75)),
                num_inference_steps=self._steps(body),
                guidance_scale=float(body.get("guidance_scale", 7.5)),
                negative_prompt=body.get("negative_prompt"),
                seed=int(body.get("seed", 0)), **ip_kw)
        buf = io.BytesIO()
        pils[0].save(buf, format="PNG")
        return {"images": [base64.b64encode(buf.getvalue()).decode()],
                "format": "png;base64"}

    def _handle_inpaint(self, body: dict):
        for k in ("image", "mask", "prompt"):
            if k not in body:
                raise ValueError(f"inpaint requires '{k}'")
        from PIL import Image
        img = Image.open(io.BytesIO(base64.b64decode(body["image"])))
        mask = Image.open(io.BytesIO(base64.b64decode(body["mask"])))
        with self.dispatch_lock:
            pils = self.pipeline.inpaint(
                img, mask, body["prompt"],
                num_inference_steps=self._steps(body),
                guidance_scale=float(body.get("guidance_scale", 7.5)),
                negative_prompt=body.get("negative_prompt"),
                seed=int(body.get("seed", 0)))
        buf = io.BytesIO()
        pils[0].save(buf, format="PNG")
        return {"images": [base64.b64encode(buf.getvalue()).decode()],
                "format": "png;base64"}

    #: /warmup body allowlist
    WARMUP_KWARGS = frozenset({
        "num_inference_steps", "height", "width", "batches", "schedulers",
        "scheduler", "output_dtypes", "async",
    })

    def _handle_warmup(self, body: dict):
        """Precompile the denoise program(s) so the FIRST real request is
        served at steady-state latency (cold-start elimination).

        body: {num_inference_steps?, height?, width?, batches?: [int|null],
               scheduler? | schedulers?: [name], output_dtypes?: [str],
               async?: bool}

        Synchronous by default (the reply carries per-scheduler compile
        seconds); pass ``async: true`` to get a job_id instead — on a cold
        TPU a 50-step program compile is minutes, longer than most LB
        timeouts.  Programs are cached per (sampler, shape) so a prewarmed
        sampler stays hot across ``set_scheduler`` switches.
        """
        unknown = sorted(set(body) - self.WARMUP_KWARGS)
        if unknown:
            raise ValueError(f"unknown warmup parameters: {unknown} "
                             f"(allowed: {sorted(self.WARMUP_KWARGS)})")
        eng = self.pipeline.engine
        for field in ("schedulers", "batches", "output_dtypes"):
            v = body.get(field)
            if v is not None and not isinstance(v, list):
                raise ValueError(f"'{field}' must be a JSON list, got "
                                 f"{type(v).__name__}")
        schedulers = body.get("schedulers") or (
            [body["scheduler"]] if body.get("scheduler")
            else [eng.scheduler_name])
        if len(schedulers) > 8:
            raise ValueError("at most 8 schedulers per warmup call")
        from ..core.schedulers import get_scheduler
        for s in schedulers:
            try:
                get_scheduler(s)  # unknown name -> 400 before any compile
            except KeyError as e:
                raise ValueError(str(e.args[0] if e.args else e)) from e
        batches = body.get("batches") or [None]
        if len(batches) > 4:
            raise ValueError("at most 4 batch shapes per warmup call")
        batches = tuple(
            None if b is None else max(1, min(int(b), self.MAX_COUNT))
            for b in batches)
        dtypes = body.get("output_dtypes") or ["float32"]
        if not set(dtypes) <= {"float32", "uint8"}:
            raise ValueError("output_dtypes entries must be float32|uint8")
        steps = self._steps(body)
        height = self._side(body, "height")
        width = self._side(body, "width")

        def run():
            report: dict = {"schedulers": {}}
            with self.dispatch_lock:
                orig = eng.scheduler_name
                try:
                    for name in schedulers:
                        eng.set_scheduler(name)
                        secs = 0.0
                        for dt in dtypes:
                            secs += eng.warmup(
                                num_inference_steps=steps, height=height,
                                width=width, batches=batches,
                                output_dtype=dt)
                        report["schedulers"][name] = round(secs, 3)
                finally:
                    eng.set_scheduler(orig)
            report["compiled_programs"] = len(eng._compiled)
            report["num_inference_steps"] = steps
            report["batches"] = [b or eng.batch_bucket for b in batches]
            return report

        if body.get("async"):
            return {"job_id": self.jobs.submit(run)}
        return run()

    def _handle_walk(self, body: dict):
        unknown = sorted(set(body) - self.WALK_KWARGS)
        if unknown:
            raise ValueError(f"unknown walk parameters: {unknown} "
                             f"(allowed: {sorted(self.WALK_KWARGS)})")
        body = dict(body)
        body["output_dir"] = self._confine(body.get("output_dir"))
        if "audio_filepath" in body and body["audio_filepath"] is not None:
            # server-side file read: keep it inside the output root too
            body["audio_filepath"] = self._confine(body["audio_filepath"])
        if "num_inference_steps" in body:
            body["num_inference_steps"] = self._steps(body)
        for k in ("height", "width"):
            if body.get(k) is not None:
                body[k] = self._side(body, k)
        holder: dict = {}

        def run():
            def hook(p):
                # holder["id"] is assigned right after submit(); the first
                # progress tick can race it, hence the guard
                if "id" in holder:
                    self.jobs.update(holder["id"], progress=p)
                    if self.jobs.cancel_event(holder["id"]).is_set():
                        raise JobCancelled(holder["id"])
            with self.dispatch_lock:
                self.pipeline.on_progress = hook
                try:
                    result = self.pipeline.walk(**body)
                finally:
                    self.pipeline.on_progress = None
            return {"video": result,
                    "perf": self.pipeline.timer.summary()}

        holder["id"] = self.jobs.submit(run)
        return {"job_id": holder["id"]}

    #: /vid2vid body allowlist (mirrors WALK_KWARGS discipline).  The video
    #: arrives as base64 bytes ('video') or as a path relative to the
    #: output root ('video_path'); 'name' is the output file stem.
    VID2VID_KWARGS = frozenset({
        "video", "video_path", "video_format", "prompt", "strength",
        "num_inference_steps", "guidance_scale", "negative_prompt", "seed",
        "height", "width", "fps", "batch_size", "frame_skip", "max_frames",
        "name", "audio_filepath", "per_frame_noise", "ip_image", "ip_scale",
    })
    #: frame ceiling per job — an unauthenticated caller must not submit a
    #: 2-hour movie
    MAX_VID_FRAMES = 2048

    def _handle_vid2vid(self, body: dict):
        import uuid
        from pathlib import Path
        unknown = sorted(set(body) - self.VID2VID_KWARGS)
        if unknown:
            raise ValueError(f"unknown vid2vid parameters: {unknown} "
                             f"(allowed: {sorted(self.VID2VID_KWARGS)})")
        if not body.get("prompt"):
            raise ValueError("vid2vid requires 'prompt'")
        if ("video" in body) == ("video_path" in body):
            raise ValueError("vid2vid requires exactly one of 'video' "
                             "(base64 bytes) or 'video_path' (relative to "
                             "the server output root)")
        self.output_root.mkdir(parents=True, exist_ok=True)
        cleanup = None
        if "video" in body:
            fmt = str(body.get("video_format", "mp4")).lstrip(".")
            if not fmt.isalnum():
                raise ValueError(f"bad video_format {fmt!r}")
            src = self.output_root / f".upload_{uuid.uuid4().hex}.{fmt}"
            src.write_bytes(base64.b64decode(body["video"]))
            cleanup = src
        else:
            p = Path(str(body["video_path"]))
            if p.is_absolute():
                raise ValueError("video_path must be relative (resolved "
                                 "under the server's output root)")
            src = Path(self._confine(str(p)))
            if not src.is_file():
                raise ValueError(f"video_path not found under output root")
        name = Path(str(body.get("name") or
                        f"vid2vid_{uuid.uuid4().hex[:8]}")).name
        out = self.output_root / f"{name}.mp4"
        max_frames = min(int(body.get("max_frames", self.MAX_VID_FRAMES)),
                         self.MAX_VID_FRAMES)
        kwargs = dict(
            strength=float(body.get("strength", 0.5)),
            num_inference_steps=self._steps(body),
            guidance_scale=float(body.get("guidance_scale", 7.5)),
            negative_prompt=body.get("negative_prompt"),
            seed=int(body.get("seed", 0)),
            height=self._side(body, "height"),
            width=self._side(body, "width"),
            fps=(float(body["fps"]) if body.get("fps") else None),
            batch_size=(int(body["batch_size"])
                        if body.get("batch_size") else None),
            frame_skip=max(1, int(body.get("frame_skip", 1))),
            max_frames=max_frames,
            output_filepath=str(out),
            audio_filepath=(self._confine(body["audio_filepath"])
                            if body.get("audio_filepath") else None),
            shared_noise=not bool(body.get("per_frame_noise", False)))
        if body.get("ip_image"):
            from PIL import Image as PILImage
            kwargs["ip_image"] = PILImage.open(
                io.BytesIO(base64.b64decode(body["ip_image"])))
            kwargs["ip_scale"] = float(body.get("ip_scale", 1.0))
        holder: dict = {}

        def run():
            def hook(p):
                if "id" in holder:
                    self.jobs.update(holder["id"], progress=p)
                    if self.jobs.cancel_event(holder["id"]).is_set():
                        raise JobCancelled(holder["id"])
            with self.dispatch_lock:
                self.pipeline.on_progress = hook
                try:
                    result = self.pipeline.vid2vid(
                        str(src), body["prompt"], **kwargs)
                finally:
                    self.pipeline.on_progress = None
                    if cleanup is not None:
                        cleanup.unlink(missing_ok=True)
            return {"video": result,
                    "perf": self.pipeline.timer.summary()}

        holder["id"] = self.jobs.submit(run)
        return {"job_id": holder["id"]}

    # ------------------------------------------------------------------
    def make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                logger.debug("http: " + fmt, *args)

            def _reply(self, code: int, payload: dict):
                data = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/health":
                    return self._reply(200, server_self._handle_health())
                if self.path.startswith("/jobs/"):
                    job = server_self.jobs.get(self.path.split("/")[-1])
                    if job is None:
                        return self._reply(404, {"error": "unknown job"})
                    return self._reply(200, job)
                return self._reply(404, {"error": f"no route {self.path}"})

            def do_DELETE(self):
                if self.path.startswith("/jobs/"):
                    job_id = self.path.split("/")[-1]
                    if server_self.jobs.cancel(job_id):
                        return self._reply(202, {"status": "cancelling"})
                    job = server_self.jobs.get(job_id)
                    if job is None:
                        return self._reply(404, {"error": "unknown job"})
                    return self._reply(409, {"error": "not cancellable",
                                             "status": job["status"]})
                return self._reply(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    body = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError as e:
                    return self._reply(400, {"error": f"bad json: {e}"})
                try:
                    if self.path == "/generate":
                        return self._reply(
                            200, server_self._handle_generate(body))
                    if self.path == "/img2img":
                        return self._reply(
                            200, server_self._handle_img2img(body))
                    if self.path == "/inpaint":
                        return self._reply(
                            200, server_self._handle_inpaint(body))
                    if self.path == "/warmup":
                        out = server_self._handle_warmup(body)
                        return self._reply(202 if "job_id" in out else 200,
                                           out)
                    if self.path == "/walk":
                        return self._reply(202, server_self._handle_walk(body))
                    if self.path == "/vid2vid":
                        return self._reply(
                            202, server_self._handle_vid2vid(body))
                except (ValueError, TypeError, NotImplementedError) as e:
                    return self._reply(400, {"error": str(e)})
                except Exception as e:
                    logger.exception("request failed")
                    return self._reply(
                        500, {"error": f"{type(e).__name__}: {e}"})
                return self._reply(404, {"error": f"no route {self.path}"})
        return Handler

    def start(self, host: str = "127.0.0.1", port: int = 8000):
        """Start in a background thread; returns (host, actual_port)."""
        self._httpd = ThreadingHTTPServer((host, port), self.make_handler())
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        logger.info("serving on %s:%d", host, self._httpd.server_port)
        return host, self._httpd.server_port

    def serve_forever(self, host: str = "127.0.0.1", port: int = 8000):
        self._httpd = ThreadingHTTPServer((host, port), self.make_handler())
        logger.info("serving on %s:%d", host, port)
        self._httpd.serve_forever()

    def shutdown(self):
        self.batcher.stop()
        if self._httpd:
            self._httpd.shutdown()
            self._httpd = None
