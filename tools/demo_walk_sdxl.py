"""End-to-end SDXL walk demo on the real chip at native 1024^2.

The full product path with the SDXL-base geometry: dual-tower embed
(pooled trajectory interpolated alongside the context), text_time
conditioning, 50-step CFG dispatches with step_cache=2, tiled VAE decode,
threaded saves, muxing.  Weights are random bf16 (cost-identical to
trained).  Writes tools/demo_walk_sdxl.json.
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
    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline

    dtype = jnp.bfloat16
    ucfg, vcfg, _, _ = SDModels.sd_xl_configs()
    # shallow towers at the REAL widths (768 + 1280 -> 2048 context,
    # 1280-wide projected pooled) so every conditioning shape is
    # production-exact; tower depth only affects the negligible embed cost
    tcfg = CLIPTextConfig(vocab_size=1000, hidden_size=768,
                          intermediate_size=256, num_layers=2, num_heads=4,
                          penultimate_hidden=True)
    tcfg2 = CLIPTextConfig(vocab_size=1000, hidden_size=1280,
                           intermediate_size=256, num_layers=2, num_heads=4,
                           penultimate_hidden=True, projection_dim=1280)

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
    params = {
        "unet": init_rand(unet, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                          jnp.zeros((1, 77, ucfg.cross_attention_dim)),
                          jnp.zeros((1, ucfg.addition_pooled_dim)),
                          jnp.zeros((1, 6))),
        "vae": init_rand(vae, jnp.zeros((1, 64, 64, 3))),
        "text_encoder": init_rand(CLIPTextEncoder(tcfg, dtype=dtype),
                                  jnp.zeros((1, 77), jnp.int32)),
        "text_encoder_2": init_rand(CLIPTextEncoder(tcfg2, dtype=dtype),
                                    jnp.zeros((1, 77), jnp.int32)),
    }
    models = SDModels(ucfg, vcfg, tcfg, params,
                      HashTokenizer(vocab_size=tcfg.vocab_size),
                      SchedulerConfig(), dtype=dtype, text_config_2=tcfg2)
    assert models.is_xl
    pipe = StableDiffusionWalkPipeline(models, scheduler="pndm",
                                       batch_bucket=1, step_cache=2)
    pipe.engine.vae_tile = 64  # 1024^2 decode in 512^2 latent tiles

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    outdir = "/tmp/demo_walk_xl"
    t0 = time.perf_counter()
    video = pipe.walk(
        prompts=["a cathedral of ice", "a forest of neon"],
        seeds=[42, 1337], num_interpolation_steps=n_frames,
        fps=6, batch_size=1, num_inference_steps=50,
        height=1024, width=1024, output_dir=outdir, name="demoxl")
    wall = time.perf_counter() - t0

    result = {
        "video": video, "bytes": os.path.getsize(video),
        "wall_s": round(wall, 1), "frames": n_frames,
        "config": "SDXL-base 2.57B, 1024^2, 50 steps PNDM CFG, batch 1, "
                  "step_cache=2, tiled VAE, random bf16 weights",
        "frames_per_sec_e2e": round(n_frames / wall, 3),
        "stage_summary": pipe.timer.summary(),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "demo_walk_sdxl.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
