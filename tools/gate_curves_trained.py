"""Quality-gate curves on TRAINED weights (VERDICT r4 #3).

Loads the committed structured-overfit checkpoint
(``tests/goldens/structured_bundle``, produced by
``tools/train_structured.py``) and measures every approximation lever
against the exact program on IDENTICAL prompts/noise:

  - DeepCache step_cache k = 2, 3, 4
  - limited-interval CFG guidance_interval (0.1, 0.85) and (0.0, 0.8)
  - the fast preset composite (k=3 x (0.1, 0.85))
  - the k=4 composite (candidate for a faster fast mode, VERDICT r4 #4)
  - ToMe-SD token merging 0.3
  - few-step sampling: dpm 20 / 25 steps vs the 50-step exact

On random weights all of these gate at ~92 dB PSNR (saturated — the r4
finding); on trained weights the configs must SEPARATE, giving the repo
its first non-saturated quality evidence.  Writes
``tools/gate_trained_r05.json``; referenced from docs/performance.md.

Run:  python tools/gate_curves_trained.py   (TPU or CPU)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("SDV_GATE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
else:
    try:
        jax.devices()
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
    except Exception:
        jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUNDLE = os.path.join(REPO, "tests", "goldens", "structured_bundle")
OUT = os.path.join(REPO, "tools", "gate_trained_r05.json")
STEPS = 50
GUIDANCE = 3.0


def main():
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    from stable_diffusion_videos_tpu.training import make_structured_dataset
    from stable_diffusion_videos_tpu.utils.metrics import quality_vs_exact

    models = SDModels.load(BUNDLE)
    _, prompts = make_structured_dataset(32)
    n = len(prompts)
    h = models.unet_config.sample_size
    noise = jnp.asarray(np.random.default_rng(7).standard_normal(
        (n, h, h, 4), np.float32))
    key = jax.random.PRNGKey(0)

    def run(scheduler="pndm", steps=STEPS, **engine_kw):
        eng = Engine(models, scheduler=scheduler, batch_bucket=n,
                     **engine_kw)
        return eng.denoise_frames(
            eng.embed_text(prompts), eng.embed_text(""), noise,
            num_inference_steps=steps, guidance_scale=GUIDANCE, key=key)

    exact = run()
    report = {"backend": jax.default_backend(), "bundle": BUNDLE,
              "steps": STEPS, "guidance": GUIDANCE, "sampler": "pndm",
              "configs": {}}
    # MERGE into an existing table (other tools append their own gates —
    # e.g. distill_lcm.py's lcmN_vs_teacher_dpm50 — which a rerun of this
    # sweep must not drop)
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                report["configs"] = json.load(f)["configs"]
        except (OSError, KeyError, json.JSONDecodeError):
            pass

    def gate(name, frames, vs=exact):
        g = quality_vs_exact(np.asarray(frames, np.float32),
                             np.asarray(vs, np.float32))
        report["configs"][name] = g
        print(name, json.dumps(g), flush=True)
        with open(OUT, "w") as f:  # incremental: a crash keeps the partial
            json.dump(report, f, indent=1)

    for k in (2, 3, 4):
        gate(f"step_cache={k}", run(step_cache=k))
    gate("guidance_interval=(0.1,0.85)", run(guidance_interval=(0.1, 0.85)))
    gate("guidance_interval=(0.0,0.8)", run(guidance_interval=(0.0, 0.8)))
    gate("fast_preset(k=3 x (0.1,0.85))",
         run(step_cache=3, guidance_interval=(0.1, 0.85)))
    gate("k=4 x (0.1,0.85)",
         run(step_cache=4, guidance_interval=(0.1, 0.85)))
    # non-uniform DeepCache: same budget, boundary-dense placement
    for k in (3, 4, 5):
        gate(f"step_cache={k},ends",
             run(step_cache=k, step_cache_policy="ends"))
    gate("k=4 ends x (0.1,0.85)",
         run(step_cache=4, step_cache_policy="ends",
             guidance_interval=(0.1, 0.85)))
    gate("k=3 ends x (0.1,0.85)",
         run(step_cache=3, step_cache_policy="ends",
             guidance_interval=(0.1, 0.85)))

    import dataclasses
    tome_models = models.with_tome(0.3)
    eng_t = Engine(tome_models, scheduler="pndm", batch_bucket=n)
    gate("tome=0.3", eng_t.denoise_frames(
        eng_t.embed_text(prompts), eng_t.embed_text(""), noise,
        num_inference_steps=STEPS, guidance_scale=GUIDANCE, key=key))

    # few-step: dpm at 20/25 vs dpm at 50 (its own exact; a different
    # operating point, not an approximation of pndm-50)
    dpm50 = run(scheduler="dpm")
    for s in (25, 20):
        gate(f"dpm{s}_vs_dpm50", run(scheduler="dpm", steps=s), vs=dpm50)
    # dpm-25 composites: can the approximation levers stack on the
    # few-step operating point without falling off the quality cliff?
    gate("dpm25+k2_vs_dpm50",
         run(scheduler="dpm", steps=25, step_cache=2), vs=dpm50)
    gate("dpm25+k2ends_vs_dpm50",
         run(scheduler="dpm", steps=25, step_cache=2,
             step_cache_policy="ends"), vs=dpm50)
    gate("dpm25+k3_vs_dpm50",
         run(scheduler="dpm", steps=25, step_cache=3), vs=dpm50)
    gate("dpm25+k2+gi_vs_dpm50",
         run(scheduler="dpm", steps=25, step_cache=2,
             guidance_interval=(0.1, 0.85)), vs=dpm50)
    gate("dpm20+k2ends_vs_dpm50",
         run(scheduler="dpm", steps=20, step_cache=2,
             step_cache_policy="ends"), vs=dpm50)

    # separation check: the gate is only evidence if configs differ —
    # spread is computed PER reference (plain names vs the exact program,
    # "*_vs_dpm50" vs the dpm-50 run), never pooled across references
    from stable_diffusion_videos_tpu.utils.metrics import \
        psnr_spread_by_reference
    report.update(psnr_spread_by_reference(report["configs"]))
    spread = report["psnr_spread_db"]
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(f"psnr spread {spread:.2f} dB; saturated={report['saturated']}")
    print("wrote", OUT)


if __name__ == "__main__":
    main()
