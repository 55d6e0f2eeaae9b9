"""Dynamic batching — merge concurrent generate requests into one dispatch.

Serving feature the reference (gradio, one request at a time) has no
equivalent of: requests that share a compile signature (steps, size,
guidance, eta, negative prompt) are collected for up to ``max_delay_ms`` or
``max_batch`` frames and denoised in a single sharded XLA dispatch, then
results fan back out to per-request futures.  Throughput scales with batch
utilisation instead of request count.
"""

from __future__ import annotations

import logging
import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

logger = logging.getLogger("sdv_tpu")


@dataclass
class _Request:
    prompt: str
    seed: int
    signature: tuple  # (steps, guidance, eta, height, width, negative)
    future: Future = field(default_factory=Future)


class DynamicBatcher:
    def __init__(self, pipeline, max_batch: int = 16,
                 max_delay_ms: float = 25.0):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.max_delay = max_delay_ms / 1000.0
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._started = False
        self._drain = True
        self._lock = threading.Lock()

    def start(self):
        with self._lock:
            if not self._started:
                self._started = True
                # a fresh Thread every start: a joined thread can't restart
                self._thread = threading.Thread(target=self._loop, daemon=True,
                                                name="dynamic-batcher")
                self._thread.start()
        return self

    def stop(self, drain: bool = True, timeout: float = 120.0):
        """Graceful shutdown.  ``drain=True`` (default) finishes every
        request already queued before exiting; ``drain=False`` fails their
        futures immediately with RuntimeError so no client blocks forever."""
        if self._started:
            self._drain = drain
            self._q.put(None)
            self._thread.join(timeout=timeout)
            self._started = False

    # ------------------------------------------------------------------
    def submit(self, prompt: str, seed: int, num_inference_steps: int = 50,
               guidance_scale: float = 7.5, eta: float = 0.0,
               height: Optional[int] = None, width: Optional[int] = None,
               negative_prompt: Optional[str] = None) -> Future:
        """Returns a Future resolving to one float [0,1] (H,W,3) frame."""
        if not self._started:
            self.start()
        height = height or self.pipeline.models.default_size
        width = width or self.pipeline.models.default_size
        sig = (int(num_inference_steps), float(guidance_scale), float(eta),
               int(height), int(width), negative_prompt or "")
        req = _Request(prompt=prompt, seed=int(seed), signature=sig)
        self._q.put(req)
        return req.future

    # ------------------------------------------------------------------
    def _collect(self) -> list[_Request]:
        """Block for the first request, then gather same-signature peers for
        up to max_delay; non-matching requests go back to the queue."""
        first = self._q.get()
        if first is None:
            return []
        batch = [first]
        deferred = []
        import time
        deadline = time.monotonic() + self.max_delay
        while len(batch) < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                req = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if req is None:
                self._q.put(None)  # re-post shutdown marker
                break
            if req.signature == first.signature:
                batch.append(req)
            else:
                deferred.append(req)
        for req in deferred:
            self._q.put(req)
        return batch

    def _loop(self):
        while True:
            batch = self._collect()
            if not batch:
                self._shutdown_pending()
                return
            try:
                self._run_batch(batch)
            except Exception as e:
                logger.exception("batched dispatch failed")
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(e)

    def _shutdown_pending(self):
        """The shutdown marker was consumed: requests still queued are
        either drained to completion (graceful, default) or failed fast —
        never silently abandoned with forever-pending futures."""
        rest: list[_Request] = []
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                break
            if r is not None:
                rest.append(r)
        if not rest:
            return
        if not self._drain:
            err = RuntimeError("batcher stopped before request ran")
            for req in rest:
                if not req.future.done():
                    req.future.set_exception(err)
            return
        logger.info("batcher draining %d pending request(s)", len(rest))
        while rest:
            sig = rest[0].signature
            batch = [r for r in rest if r.signature == sig][:self.max_batch]
            batch_ids = {id(r) for r in batch}
            rest = [r for r in rest if id(r) not in batch_ids]
            try:
                self._run_batch(batch)
            except Exception as e:
                logger.exception("batched dispatch failed during drain")
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(e)

    def _run_batch(self, batch: list[_Request]):
        pipe = self.pipeline
        steps, guidance, eta, height, width, negative = batch[0].signature
        logger.info("dynamic batch: %d request(s), steps=%d %dx%d",
                    len(batch), steps, height, width)
        embeds = pipe.engine.embed_text([r.prompt for r in batch])
        uncond = pipe.engine.embed_text(negative)
        xl_kw = {}
        if pipe.models.is_xl:
            xl_kw = dict(
                pooled=pipe.engine.embed_text_pooled(
                    [r.prompt for r in batch]),
                uncond_pooled=pipe.engine.embed_text_pooled(negative))
        shape = pipe._latent_shape(height, width)
        noise = np.concatenate([pipe.init_noise(r.seed, shape)
                                for r in batch])
        images = pipe.engine.denoise_frames(
            embeds, uncond, noise, num_inference_steps=steps,
            guidance_scale=guidance, eta=eta, **xl_kw)
        for req, img in zip(batch, images):
            req.future.set_result(img)
