"""Cold / warm / no-cache compile measurement for the persistent cache.

Root-causes the r4 cold-compile regression (VERDICT r4 #2: BENCH_r04
``compile_plus_first_run_s`` 229.5 s vs r3's 87.4 s, and the r4 probe's
warm-vs-cold showing warm SLOWER than cold: 418 s vs 173 s).

Three child processes, one fresh cache dir:
  1. ``nocache`` — SDV_COMPILE_CACHE=0 control: pure remote-compile time,
     isolates tunnel/remote-compile-server variance from cache behaviour.
  2. ``cold``    — cache enabled, empty dir: compile + serialize + write.
  3. ``warm``    — cache enabled, populated dir: must replay from disk.

Each child logs jax's persistent-cache events (hit / miss / write /
deserialize error) so a silent miss or a failing deserialize is visible in
the committed JSON, not guessed at.  Appends to tools/probe_r05.json.

Usage:  python tools/tpu_compile_cache.py            # orchestrator
        python tools/tpu_compile_cache.py child DIR  # one measured process
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)  # `python tools/...py` puts tools/ first, not ROOT
OUT = os.path.join(ROOT, "tools", "probe_r05.json")


def child(cache_dir: str) -> None:
    import logging
    import time

    # surface persistent-cache decisions on stderr (parsed by main())
    logging.basicConfig(stream=sys.stderr, level=logging.WARNING)
    for name in ("jax._src.compilation_cache", "jax._src.compiler",
                 "jax._src.cache_key"):
        logging.getLogger(name).setLevel(logging.DEBUG)

    import jax
    try:
        jax.devices("axon")
    except Exception:
        print(json.dumps({"error": "axon unavailable"}))
        sys.exit(7)
    # the library path under test: Engine enables the cache itself via
    # SDV_COMPILE_CACHE_DIR (set by the orchestrator)
    import jax.numpy as jnp
    import numpy as np

    from stable_diffusion_videos_tpu.core.schedulers import SchedulerConfig
    from stable_diffusion_videos_tpu.models import (CLIPTextConfig,
                                                    HashTokenizer)
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.models.clip_text import CLIPTextEncoder
    from stable_diffusion_videos_tpu.models.unet import (UNet2DCondition,
                                                         UNetConfig)
    from stable_diffusion_videos_tpu.models.vae import (AutoencoderKL,
                                                        VAEConfig)
    from stable_diffusion_videos_tpu.runtime.engine import Engine

    ucfg, vcfg, tcfg = UNetConfig.sd_v1(), VAEConfig.sd_v1(), \
        CLIPTextConfig.tiny()
    dtype = jnp.bfloat16

    def init_zeros(model, *args):
        shapes = jax.eval_shape(lambda k: model.init(k, *args),
                                jax.random.PRNGKey(0))
        key = [jax.random.PRNGKey(1)]

        def mk(s):
            key[0], sub = jax.random.split(key[0])
            return (jax.random.normal(sub, s.shape, jnp.float32) * 0.02
                    ).astype(dtype if s.dtype == jnp.float32 else s.dtype)
        return jax.tree.map(mk, shapes)

    unet = UNet2DCondition(ucfg, dtype=dtype)
    vae = AutoencoderKL(vcfg, dtype=dtype)
    enc = CLIPTextEncoder(tcfg, dtype=dtype)
    params = {
        "unet": init_zeros(unet, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                           jnp.zeros((1, 77, ucfg.cross_attention_dim))),
        "vae": init_zeros(vae, jnp.zeros((1, 64, 64, 3))),
        "text_encoder": init_zeros(enc, jnp.zeros((1, 77), jnp.int32)),
    }
    models = SDModels(ucfg, vcfg, tcfg, params,
                      HashTokenizer(vocab_size=tcfg.vocab_size),
                      SchedulerConfig(), dtype=dtype)
    engine = Engine(models, scheduler="pndm", batch_bucket=8)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((8, 77, ucfg.cross_attention_dim),
                                           np.float32))
    noise = jnp.asarray(rng.standard_normal((8, 64, 64, 4), np.float32))
    t0 = time.perf_counter()
    imgs, _ = engine.denoise_frames_async(cond, cond[:1], noise,
                                          num_inference_steps=50)
    np.asarray(jax.device_get(imgs[(0,) * imgs.ndim]))
    print(json.dumps({"compile_plus_first_run_s":
                      round(time.perf_counter() - t0, 1)}))


def _cache_events(stderr: str) -> dict:
    """Count persistent-cache events in a child's debug log."""
    ev = {"hits": 0, "misses": 0, "writes": 0, "errors": 0}
    for ln in stderr.splitlines():
        low = ln.lower()
        if "cache" not in low:
            continue
        if "persistent compilation cache hit" in low or \
                "retrieved" in low or "hit for" in low:
            ev["hits"] += 1
        elif "miss" in low or "not found in" in low:
            ev["misses"] += 1
        elif "writing" in low or "wrote" in low or "saved" in low or \
                "persisting" in low:
            ev["writes"] += 1
        if "error" in low or "failed" in low or "exception" in low:
            ev["errors"] += 1
    return ev


def main() -> None:
    import tempfile
    cache_dir = tempfile.mkdtemp(prefix="sdv_cache_probe_")
    results: dict = {}
    runs = (("nocache", {"SDV_COMPILE_CACHE": "0"}),
            ("cold", {"SDV_COMPILE_CACHE_DIR": cache_dir}),
            ("warm", {"SDV_COMPILE_CACHE_DIR": cache_dir}))
    for name, extra in runs:
        env = dict(os.environ)
        env.pop("SDV_COMPILE_CACHE", None)
        env.update(extra)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "child", cache_dir],
            capture_output=True, text=True, timeout=1800, env=env, cwd=ROOT)
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("{")]
        if proc.returncode != 0 or not line:
            print(f"{name} FAILED: {proc.stderr[-800:]}", flush=True)
            sys.exit(1)
        results[name + "_s"] = json.loads(line[-1])[
            "compile_plus_first_run_s"]
        if name != "nocache":
            results[name + "_cache_events"] = _cache_events(proc.stderr)
        print(name, results[name + "_s"], "s",
              results.get(name + "_cache_events", ""), flush=True)
    results["warm_speedup_vs_cold"] = round(
        results["cold_s"] / results["warm_s"], 2)
    results["cache_overhead_vs_nocache_s"] = round(
        results["cold_s"] - results["nocache_s"], 1)
    results["cache_dir_mb"] = round(sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(cache_dir) for f in fs) / 2 ** 20, 1)
    allr = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            allr = json.load(f)
    allr["compile_cache_probe"] = results
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2])
    else:
        main()
