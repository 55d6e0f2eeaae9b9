"""End-to-end walk demo on the real chip: full SD geometry, audio-reactive.

Exercises the WHOLE product path on TPU hardware — tokenize/embed, the
audio-onset interpolation schedule, sharded 50-step CFG denoise dispatches,
device->host streaming, threaded PNG saves, and video muxing — at 512^2 with
the production batch size.  Weights are random bf16 (identical FLOP/byte
cost; the imagery is noise but every stage is the production code).

Covers BASELINE.md graded configs 2 (512^2/50-step CFG walk, batch>1 per
dispatch) and 3 (audio beat-synced schedule) on hardware.  Writes
tools/demo_walk_r02.json with the per-stage timing summary.
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from stable_diffusion_videos_tpu.audio.analysis import save_wav
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
    ucfg, vcfg = UNetConfig.sd_v1(), VAEConfig.sd_v1()
    # small-depth text encoder with the REAL 768 embed width so the UNet
    # cross-attention geometry is production-exact (embed cost is negligible)
    tcfg = CLIPTextConfig(vocab_size=1000, hidden_size=768,
                          intermediate_size=256, num_layers=2, num_heads=4)
    unet = UNet2DCondition(ucfg, dtype=dtype)
    vae = AutoencoderKL(vcfg, dtype=dtype)
    enc = CLIPTextEncoder(tcfg, dtype=dtype)

    key = [jax.random.PRNGKey(0)]

    def init_rand(model, *args):
        shapes = jax.eval_shape(lambda k: model.init(k, *args),
                                jax.random.PRNGKey(0))

        def mk(s):
            key[0], sub = jax.random.split(key[0])
            return (jax.random.normal(sub, s.shape, jnp.float32) * 0.02
                    ).astype(dtype if s.dtype == jnp.float32 else s.dtype)
        return jax.tree.map(mk, shapes)

    params = {
        "unet": init_rand(unet, jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,)),
                          jnp.zeros((1, 77, ucfg.cross_attention_dim))),
        "vae": init_rand(vae, jnp.zeros((1, 512, 512, 3))),
        "text_encoder": init_rand(enc, jnp.zeros((1, 77), jnp.int32)),
    }
    models = SDModels(ucfg, vcfg, tcfg, params,
                      HashTokenizer(vocab_size=tcfg.vocab_size),
                      SchedulerConfig(), dtype=dtype)

    # argv: [steps_per_clip] [n_prompts] [batch] [step_cache] [tag]
    argv = sys.argv[1:]
    steps_per_clip = int(argv[0]) if len(argv) > 0 else 24
    n_prompts = int(argv[1]) if len(argv) > 1 else 2
    batch = int(argv[2]) if len(argv) > 2 else 16
    step_cache = (int(argv[3]) or None) if len(argv) > 3 else None
    tag = argv[4] if len(argv) > 4 else "r02"
    n_frames = steps_per_clip * (n_prompts - 1)

    pipe = StableDiffusionWalkPipeline(models, scheduler="pndm",
                                       batch_bucket=batch,
                                       step_cache=step_cache)

    # click track: onsets every 0.5 s -> frames bunch on beats
    fps = 12
    sr, dur = 22050, n_frames / fps
    t = np.arange(int(sr * dur)) / sr
    clicks = np.zeros_like(t)
    for beat in np.arange(0.25, dur, 0.5):
        idx = int(beat * sr)
        clicks[idx:idx + 300] += np.hanning(300) * np.sin(
            2 * np.pi * 880 * t[:300])
    wav = "/tmp/demo_click.wav"
    save_wav(wav, clicks.astype(np.float32), sr)

    all_prompts = ["a cathedral of ice", "a forest of neon",
                   "a desert of glass", "an ocean of clouds",
                   "a city of brass"]
    outdir = "/tmp/demo_walk"
    t0 = time.perf_counter()
    video = pipe.walk(
        prompts=all_prompts[:n_prompts],
        seeds=list(range(42, 42 + n_prompts)),
        num_interpolation_steps=steps_per_clip,
        audio_filepath=wav, audio_start_sec=0, fps=fps,
        batch_size=batch, num_inference_steps=50,
        output_dir=outdir, name=f"demo512_{tag}")
    wall = time.perf_counter() - t0

    summary = pipe.timer.summary()
    size = os.path.getsize(video)
    result = {
        "video": video, "bytes": size, "wall_s": round(wall, 1),
        "frames": n_frames,
        "config": f"512^2, 50 steps PNDM CFG, batch {batch}, "
                  f"{n_prompts} prompts, audio-reactive schedule, "
                  f"step_cache={step_cache}, random bf16 weights",
        "frames_per_sec_e2e": round(n_frames / wall, 3),
        "stage_summary": summary,
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"demo_walk_{tag}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
