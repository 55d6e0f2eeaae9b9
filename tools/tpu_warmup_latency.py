"""Serving cold-start vs prewarmed first-request latency (VERDICT r4 #9).

Starts the HTTP server twice against full SD1.x-geometry bf16 random
weights on the real chip:

  1. **cold** — POST /generate immediately; the request pays the XLA
     compile of the denoise program.
  2. **warm** — POST /warmup first (precompiles the same (sampler, shape)
     program), then the SAME /generate; the request must hit the program
     cache and run at steady-state latency.

Appends {cold_first_request_s, warmup_s, warm_first_request_s} to
tools/probe_r05.json; quoted in docs/serving.md.

Run:  python tools/tpu_warmup_latency.py
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "tools", "probe_r05.json")

STEPS = 50
BATCH = 8


def _request(host, port, method, path, body=None, timeout=1800):
    from http.client import HTTPConnection
    conn = HTTPConnection(host, port, timeout=timeout)
    data = json.dumps(body).encode() if body is not None else None
    conn.request(method, path, body=data,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    payload = json.loads(resp.read())
    conn.close()
    assert resp.status in (200, 202), (resp.status, payload)
    return payload


def _pipeline():
    import jax
    import jax.numpy as jnp

    from stable_diffusion_videos_tpu.core.schedulers import SchedulerConfig
    from stable_diffusion_videos_tpu.models import (CLIPTextConfig,
                                                    HashTokenizer)
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.models.clip_text import CLIPTextEncoder
    from stable_diffusion_videos_tpu.models.unet import (UNet2DCondition,
                                                         UNetConfig)
    from stable_diffusion_videos_tpu.models.vae import (AutoencoderKL,
                                                        VAEConfig)
    from stable_diffusion_videos_tpu.pipeline import \
        StableDiffusionWalkPipeline

    # /generate really embeds the prompt, so the text tower's hidden size
    # must match the UNet's cross_attention_dim (768); keep it SHALLOW so
    # the compile under test stays the denoise program, not CLIP
    tcfg = CLIPTextConfig(hidden_size=768, intermediate_size=1536,
                          num_layers=2, num_heads=12, vocab_size=1000)
    # shared bench scaffold: SD1.x geometry, 0.02-scale random bf16 params
    # drawn in-dtype (models/bundle.py random_bench)
    models = SDModels.random_bench("sd1", text_config=tcfg)
    return StableDiffusionWalkPipeline(models, scheduler="pndm",
                                       batch_bucket=BATCH, safety=False)


def main() -> None:
    import jax
    try:
        jax.devices("axon")
    except Exception:
        print("axon unavailable", file=sys.stderr)
        sys.exit(7)

    from stable_diffusion_videos_tpu.runtime.server import Server

    pipe = _pipeline()
    server = Server(pipe, max_batch=BATCH)
    host, port = server.start(port=0)
    gen = {"prompt": "a lighthouse at dusk", "num_inference_steps": STEPS,
           "seed": 3}
    results = {"steps": STEPS, "batch_bucket": BATCH}

    # ---- 1. cold: the first request pays the compile -------------------
    t0 = time.perf_counter()
    _request(host, port, "POST", "/generate", gen)
    results["cold_first_request_s"] = round(time.perf_counter() - t0, 1)
    print("cold first request:", results["cold_first_request_s"], "s",
          flush=True)

    # steady-state for reference
    t0 = time.perf_counter()
    _request(host, port, "POST", "/generate", dict(gen, seed=4))
    results["steady_state_request_s"] = round(time.perf_counter() - t0, 1)
    print("steady-state request:", results["steady_state_request_s"], "s",
          flush=True)

    # ---- 2. warm: a FRESH engine (new program cache), /warmup first ----
    server.shutdown()
    pipe2 = _pipeline()
    server2 = Server(pipe2, max_batch=BATCH)
    host, port = server2.start(port=0)
    t0 = time.perf_counter()
    # warm the batch the server actually dispatches: the batcher pads
    # every request group to the engine's batch bucket (= max_batch)
    w = _request(host, port, "POST", "/warmup",
                 {"num_inference_steps": STEPS, "batches": [BATCH]})
    results["warmup_s"] = round(time.perf_counter() - t0, 1)
    print("warmup:", results["warmup_s"], "s", w, flush=True)
    t0 = time.perf_counter()
    _request(host, port, "POST", "/generate", gen)
    results["warm_first_request_s"] = round(time.perf_counter() - t0, 1)
    print("warm first request:", results["warm_first_request_s"], "s",
          flush=True)
    server2.shutdown()

    results["first_request_speedup"] = round(
        results["cold_first_request_s"] / results["warm_first_request_s"], 1)
    allr = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            allr = json.load(f)
    allr["serving_warmup_latency"] = results
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
