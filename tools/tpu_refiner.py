"""SDXL-refiner on-TPU probe: the img2img polish pass at native 1024^2.

The refiner's production use (examples/sdxl_walk.py) is a strength~0.3
img2img over a base-model frame: encode -> ~15 of 50 schedule steps ->
decode.  This measures that dispatch with random bf16 weights at the
``UNetConfig.sd_xl_refiner()`` geometry (2.07B params; real checkpoints
derive their exact geometry from config.json at load).  Its depth-4
transformers at D=64 ride the same materialization-aware flash routing as
SD2/SDXL-base.

Appends "refiner" to tools/probe_r03.json.
Usage: python tools/tpu_refiner.py [refine_steps]
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
                   "probe_r03.json")
SIDE = 1024
REFINE_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 15
# refiner UNet fwd ~= 6.3 TFLOP per 1024^2 sample (2.07B geometry)
UNET_FLOP = 6.3e12
VAE_FLOP = 5.6e12


def main():
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

    ucfg = UNetConfig.sd_xl_refiner()
    vcfg = VAEConfig.sd_v1()
    tcfg = CLIPTextConfig.tiny()
    # refiner context is the bigG tower alone; a tiny projected tower with
    # the right output widths keeps the embed path runnable
    tcfg2 = CLIPTextConfig(vocab_size=1000, hidden_size=ucfg.
                           cross_attention_dim, intermediate_size=64,
                           num_layers=2, num_heads=2,
                           penultimate_hidden=True,
                           projection_dim=ucfg.addition_pooled_dim)
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
    enc2 = CLIPTextEncoder(tcfg2, dtype=dtype)
    params = {
        "unet": init_rand(unet, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                          jnp.zeros((1, 7, ucfg.cross_attention_dim)),
                          jnp.zeros((1, ucfg.addition_pooled_dim)),
                          jnp.zeros((1, ucfg.addition_num_ids))),
        "vae": init_rand(vae, jnp.zeros((1, 64, 64, 3))),
        "text_encoder": init_rand(enc, jnp.zeros((1, 77), jnp.int32)),
        "text_encoder_2": init_rand(enc2, jnp.zeros((1, 77), jnp.int32)),
    }
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params["unet"]))
    print(f"# refiner unet params: {n/1e9:.2f}B", flush=True)
    models = SDModels(ucfg, vcfg, tcfg, params,
                      HashTokenizer(vocab_size=tcfg.vocab_size),
                      SchedulerConfig(), dtype=dtype, text_config_2=tcfg2)
    assert models.is_xl and ucfg.addition_num_ids == 5

    pipe = StableDiffusionWalkPipeline(models, scheduler="ddim",
                                       batch_bucket=1)
    pipe.engine.vae_tile = 64
    pipe.engine.vae_tile_overlap = 16
    rng = np.random.default_rng(0)
    base_frame = rng.uniform(0, 255, (SIDE, SIDE, 3)).astype(np.uint8)
    from PIL import Image
    img = Image.fromarray(base_frame)

    strength = REFINE_STEPS / 50.0
    entry = {"side": SIDE, "refine_steps": REFINE_STEPS,
             "strength": round(strength, 3),
             "unet_params_b": round(n / 1e9, 2)}
    t0 = time.perf_counter()
    out = pipe.img2img(img, "polish", strength=strength,
                       num_inference_steps=50, seed=0, output_type="np")
    entry["compile_plus_first_s"] = round(time.perf_counter() - t0, 1)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        out = pipe.img2img(img, "polish", strength=strength,
                           num_inference_steps=50, seed=0, output_type="np")
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    fl = REFINE_STEPS * 2 * UNET_FLOP + 2 * VAE_FLOP  # encode + decode
    entry.update({"s_per_frame": round(dt, 2),
                  "frames_per_s_chip": round(1 / dt, 4),
                  "implied_tflops": round(fl / dt / 1e12, 1),
                  "out_shape": list(np.asarray(out).shape)})
    print(json.dumps({"refiner": entry}), flush=True)

    try:
        with open(OUT) as f:
            allr = json.load(f)
    except FileNotFoundError:
        allr = {}
    allr["refiner"] = entry
    with open(OUT, "w") as f:
        json.dump(allr, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
