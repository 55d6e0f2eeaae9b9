"""One-shot comprehensive TPU profile (single process; never kill this)."""
import os, time, json, traceback
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, sys
try:
    jax.devices("axon")
except Exception:
    print("AXON UNAVAILABLE - aborting (no CPU fallback)", flush=True)
    sys.exit(7)
import jax.numpy as jnp, numpy as np

def timeit(f, *args, n=10):
    jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n

def section(name):
    print(f"\n===== {name} =====", flush=True)

try:
    section("attention micro (xla vs flash)")
    from stable_diffusion_videos_tpu.ops.attention import xla_attention
    from stable_diffusion_videos_tpu.ops.flash_attention import flash_attention
    for (B, S, H, D) in [(16, 4096, 8, 40), (16, 1024, 8, 80),
                         (16, 256, 8, 160), (2, 4096, 1, 512)]:
        k = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(k[0], (B, S, H, D), jnp.bfloat16)
        kk = jax.random.normal(k[1], (B, S, H, D), jnp.bfloat16)
        v = jax.random.normal(k[2], (B, S, H, D), jnp.bfloat16)
        xt = timeit(jax.jit(xla_attention), q, kk, v)
        line = f"B{B} S{S} H{H} D{D}: xla {xt*1e3:.2f}ms"
        for tq, tk in [(256, 512), (512, 1024), (128, 4096 if S >= 4096 else S)]:
            try:
                ft = timeit(jax.jit(lambda q, k, v, tq=tq, tk=tk:
                                    flash_attention(q, k, v, tile_q=tq, tile_k=tk)),
                            q, kk, v)
                line += f" | flash[{tq},{tk}] {ft*1e3:.2f}ms"
            except Exception as e:
                line += f" | flash[{tq},{tk}] ERR {type(e).__name__}"
        print(line, flush=True)
except Exception:
    traceback.print_exc()

try:
    section("UNet single CFG step + VAE decode (SD geometry, bf16)")
    from stable_diffusion_videos_tpu.models import UNet2DCondition, UNetConfig
    from stable_diffusion_videos_tpu.models.vae import AutoencoderKL, VAEConfig
    ucfg, vcfg = UNetConfig.sd_v1(), VAEConfig.sd_v1()
    unet = UNet2DCondition(ucfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(vcfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda k: unet.init(
        k, jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, 768))), jax.random.PRNGKey(0))
    key = [jax.random.PRNGKey(1)]
    def mk(s):
        key[0], sub = jax.random.split(key[0])
        return (jax.random.normal(sub, s.shape, jnp.float32) * 0.02).astype(
            jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype)
    uparams = jax.tree.map(mk, shapes)
    vshapes = jax.eval_shape(lambda k: vae.init(k, jnp.zeros((1, 512, 512, 3))),
                             jax.random.PRNGKey(2))
    vparams = jax.tree.map(mk, vshapes)

    for B in (8, 16, 24):
        lat = jax.random.normal(jax.random.PRNGKey(3), (2 * B, 64, 64, 4), jnp.bfloat16)
        ctx = jax.random.normal(jax.random.PRNGKey(4), (2 * B, 77, 768), jnp.bfloat16)
        f = jax.jit(lambda p, l, t, c: unet.apply(p, l, t, c))
        try:
            dt = timeit(f, uparams, lat, jnp.ones((2 * B,)), ctx, n=5)
            # SD1.x UNet ~339 GFLOP per 512^2 forward sample
            tf = 0.339e12 * 2 * B / dt / 1e12
            print(f"unet CFG step B={B}: {dt*1e3:.1f}ms ({tf:.1f} TFLOP/s)",
                  flush=True)
        except Exception as e:
            print(f"unet B={B} ERR: {e}", flush=True)

    z = jax.random.normal(jax.random.PRNGKey(5), (8, 64, 64, 4), jnp.bfloat16)
    fd = jax.jit(lambda p, z: vae.apply(p, z, method=AutoencoderKL.decode))
    dt = timeit(fd, vparams, z, n=3)
    print(f"vae decode B=8 @512^2: {dt*1e3:.1f}ms", flush=True)
except Exception:
    traceback.print_exc()

try:
    section("full dispatch batch scaling (engine, pndm 50 steps)")
    import importlib, runpy, sys
    # reuse bench machinery with different batch sizes
    from stable_diffusion_videos_tpu.core.schedulers import SchedulerConfig
    from stable_diffusion_videos_tpu.models import CLIPTextConfig, HashTokenizer
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.models.clip_text import CLIPTextEncoder
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    tcfg = CLIPTextConfig.tiny()
    enc = CLIPTextEncoder(tcfg, dtype=jnp.bfloat16)
    eshapes = jax.eval_shape(lambda k: enc.init(k, jnp.zeros((1, 77), jnp.int32)),
                             jax.random.PRNGKey(6))
    eparams = jax.tree.map(mk, eshapes)
    models = SDModels(ucfg, vcfg, tcfg,
                      {"unet": uparams, "vae": vparams, "text_encoder": eparams},
                      HashTokenizer(vocab_size=tcfg.vocab_size),
                      SchedulerConfig(), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    for B in (8, 16):
        eng = Engine(models, scheduler="pndm", batch_bucket=B)
        cond = jnp.asarray(rng.standard_normal((B, 77, 768), np.float32))
        noise = jnp.asarray(rng.standard_normal((B, 64, 64, 4), np.float32))
        t0 = time.time()
        eng.denoise_frames(cond, cond[:1], noise, num_inference_steps=50)
        print(f"B={B} compile+first: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        n = 2
        for _ in range(n):
            fut, _ = eng.denoise_frames_async(cond, cond[:1], noise,
                                              num_inference_steps=50)
        jax.block_until_ready(fut)
        dt = (time.time() - t0) / n
        print(f"B={B}: {dt:.2f}s/dispatch = {B/dt:.3f} frames/s", flush=True)
except Exception:
    traceback.print_exc()

print("\nDONE", flush=True)
