"""Inpainting tests (masked denoise with known-region re-injection)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipe():
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline
    return StableDiffusionWalkPipeline(SDModels.tiny(), scheduler="ddim")


@pytest.fixture()
def image():
    return (np.random.default_rng(0).uniform(0, 1, (16, 16, 3)) * 255) \
        .astype(np.uint8)


def test_inpaint_runs_and_shapes(pipe, image):
    mask = np.zeros((16, 16), np.float32)
    mask[:, 8:] = 1.0  # regenerate the right half
    out = pipe.inpaint(image, mask, "new right half",
                       num_inference_steps=4, output_type="np")
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(out).all()


def test_inpaint_mask_zero_keeps_image(pipe, image):
    """An all-zero mask must reproduce the VAE roundtrip of the input
    (nothing regenerated)."""
    mask = np.zeros((16, 16), np.float32)
    out = pipe.inpaint(image, mask, "ignored prompt",
                       num_inference_steps=4, output_type="np")[0]
    # pure VAE roundtrip of the input (tiny random VAE is lossy, so compare
    # against its own roundtrip, not the raw image)
    import jax.numpy as jnp

    from stable_diffusion_videos_tpu.models.vae import AutoencoderKL
    arr = np.asarray(image, np.float32)[None] / 255.0
    lat = pipe.engine.encode_image(arr * 2 - 1)
    vae = pipe.models.vae()
    dec = vae.apply(pipe.models.params["vae"],
                    lat / pipe.models.vae_config.scaling_factor,
                    method=AutoencoderKL.decode)
    want = np.clip(np.asarray(dec, np.float32) / 2 + 0.5, 0, 1)[0]
    np.testing.assert_allclose(out, want, atol=5e-3)


def test_inpaint_half_mask_differs_from_keep_all(pipe, image):
    """A half mask regenerates content (vs the zero-mask roundtrip).

    NOTE: pixel-space locality cannot be asserted here — the VAE decoder's
    GroupNorm statistics couple the whole frame, so regenerating one half
    shifts the other slightly even though the LATENT projection is exact
    (proven by test_inpaint_mask_zero_keeps_image)."""
    mask_half = np.zeros((16, 16), np.float32)
    mask_half[:, 8:] = 1.0
    out_half = pipe.inpaint(image, mask_half, "zzz", seed=3,
                            num_inference_steps=4, output_type="np")[0]
    out_keep = pipe.inpaint(image, np.zeros((16, 16), np.float32), "zzz",
                            seed=3, num_inference_steps=4,
                            output_type="np")[0]
    assert np.abs(out_half[:, 8:] - out_keep[:, 8:]).max() > 0.01
    assert np.isfinite(out_half).all()


def test_inpaint_pndm_runs(pipe, image):
    """pndm (the default sampler) can inpaint since r4 — the projection
    reads the post-step level from timesteps[i+1] (the duplicated warm-up
    entry makes that exact); warm-up samplers covered in test_img2img.py."""
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline
    p = StableDiffusionWalkPipeline(SDModels.tiny(), scheduler="pndm")
    out = p.inpaint(image, np.ones((16, 16), np.float32), "x",
                    num_inference_steps=4, output_type="np")
    assert np.isfinite(out).all()
