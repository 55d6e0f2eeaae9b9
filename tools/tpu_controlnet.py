"""ControlNet on-TPU cost probe: 512^2/50-step CFG walk dispatch, batch 8,
full SD1.x geometry, with vs without a full-geometry ControlNet.

The ControlNet trunk is the UNet's down+mid path (~60% of UNet step FLOPs at
SD1.x), so the expected controlled throughput is ~0.6x the plain walk's —
this measures what it actually costs end to end through the fused scan.
Writes "controlnet" into controlnet_r03.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

try:
    jax.devices("axon")
except Exception:
    print("AXON UNAVAILABLE - aborting", flush=True)
    sys.exit(7)

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "controlnet_r03.json")
STEPS, SIDE = 50, 512
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
#: "plain" / "controlled" / "both" — each mode's compile takes minutes
#: through the remote-compile tunnel; run one at a time to fit a window
MODE = sys.argv[2] if len(sys.argv) > 2 else "both"
UNET_FLOP_512 = 0.34e12
CTRL_FLOP_512 = 0.20e12  # down+mid trunk + cond embedding, rough
VAE_FLOP_512 = 1.4e12


def main():
    from stable_diffusion_videos_tpu.core.schedulers import SchedulerConfig
    from stable_diffusion_videos_tpu.models import (CLIPTextConfig,
                                                    HashTokenizer)
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.models.clip_text import CLIPTextEncoder
    from stable_diffusion_videos_tpu.models.controlnet import (
        ControlNet, ControlNetBundle)
    from stable_diffusion_videos_tpu.models.unet import (UNet2DCondition,
                                                         UNetConfig)
    from stable_diffusion_videos_tpu.models.vae import (AutoencoderKL,
                                                        VAEConfig)
    from stable_diffusion_videos_tpu.runtime.engine import Engine

    ucfg, vcfg = UNetConfig.sd_v1(), VAEConfig.sd_v1()
    tcfg = CLIPTextConfig.tiny()
    dtype = jnp.bfloat16

    def init_rand(model, *args):
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
        "unet": init_rand(unet, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                          jnp.zeros((1, 77, ucfg.cross_attention_dim))),
        "vae": init_rand(vae, jnp.zeros((1, 64, 64, 3))),
        "text_encoder": init_rand(enc, jnp.zeros((1, 77), jnp.int32)),
    }
    models = SDModels(ucfg, vcfg, tcfg, params,
                      HashTokenizer(vocab_size=tcfg.vocab_size),
                      SchedulerConfig(), dtype=dtype)

    cn_mod = ControlNet(ucfg)  # full SD1.5 controlnet geometry
    cn_params = init_rand(
        cn_mod, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, ucfg.cross_attention_dim)),
        jnp.zeros((1, 64, 64, 3)))
    bundle = ControlNetBundle(ucfg, cn_params)

    engine = Engine(models, scheduler="pndm", batch_bucket=BATCH,
                    controlnet=bundle)

    rng = np.random.default_rng(0)
    h = w = SIDE // vcfg.scale_factor
    cond = jnp.asarray(rng.standard_normal(
        (BATCH, 77, ucfg.cross_attention_dim), np.float32))
    noise = jnp.asarray(rng.standard_normal((BATCH, h, w, 4), np.float32))
    ctrl = jnp.asarray(rng.random((BATCH, SIDE, SIDE, 3), np.float32))

    allr = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            allr = json.load(f)
    results = allr.get(f"b{BATCH}",
                       {"steps": STEPS, "side": SIDE, "batch": BATCH})
    modes = [("plain", {}), ("controlled", {"control": ctrl})]
    if MODE != "both":
        modes = [m for m in modes if m[0] == MODE]
    for name, kw in modes:
        t0 = time.perf_counter()
        out = engine.denoise_frames(cond, cond[:1], noise,
                                    num_inference_steps=STEPS, **kw)
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = engine.denoise_frames(cond, cond[:1], noise,
                                        num_inference_steps=STEPS, **kw)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        fl = STEPS * 2 * (UNET_FLOP_512
                          + (CTRL_FLOP_512 if kw else 0)) + VAE_FLOP_512
        results[name] = {
            "compile_plus_first_s": round(compile_s, 1),
            "s_per_dispatch": round(dt, 2),
            "frames_per_s_chip": round(BATCH / dt, 4),
            "implied_tflops": round(BATCH / dt * fl / 1e12, 1),
            "out_shape": list(out.shape)}
        print(name, json.dumps(results[name]), flush=True)

    if "plain" in results and "controlled" in results:
        results["controlled_vs_plain"] = round(
            results["controlled"]["frames_per_s_chip"]
            / results["plain"]["frames_per_s_chip"], 3)
        print(json.dumps({"controlled_vs_plain":
                          results["controlled_vs_plain"]}))
    allr[f"b{BATCH}"] = results
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)


if __name__ == "__main__":
    main()
