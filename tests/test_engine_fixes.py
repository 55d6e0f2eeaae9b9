"""Regression tests for round-3 engine fixes (ADVICE r2 findings):

- HBM-exhaustion split retry must slice batch-aligned kwargs
  (pooled/uncond_pooled) along with cond/noise (engine.denoise_frames).
- SDXL-refiner time_ids use negative_aesthetic_score (2.5) for the uncond
  CFG half, 6.0 for the cond half (upstream pipeline behavior).
- Tiled VAE encode/decode must handle non-square frames where one latent
  axis is smaller than the tile.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_videos_tpu.models.bundle import SDModels
from stable_diffusion_videos_tpu.runtime.engine import Engine


def test_hbm_retry_slices_batch_kwargs(monkeypatch):
    """On RESOURCE_EXHAUSTED, the half-batch retry must slice pooled/
    uncond_pooled (B-aligned) but leave broadcast rows and keys alone."""
    models = SDModels.tiny()
    eng = Engine(models, scheduler="ddim")
    B, S, D = 4, 7, models.unet_config.cross_attention_dim
    calls = []

    def fake_async(cond, uncond, noise, **kw):
        if noise.shape[0] > 2:
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: fake OOM for test")
        calls.append((np.asarray(cond), np.asarray(uncond), kw))
        b = noise.shape[0]
        return jnp.zeros((b, 8, 8, 3)), b

    monkeypatch.setattr(eng, "denoise_frames_async", fake_async)
    cond = jnp.arange(B * S * D, dtype=jnp.float32).reshape(B, S, D)
    uncond = cond + 1000.0
    noise = jnp.zeros((B, 4, 4, models.unet_config.in_channels))
    pooled = jnp.arange(B * 5, dtype=jnp.float32).reshape(B, 5)
    uncond_pooled = jnp.ones((1, 5))
    key = jax.random.PRNGKey(3)

    out = eng.denoise_frames(cond, uncond, noise, pooled=pooled,
                             uncond_pooled=uncond_pooled, key=key)
    assert out.shape == (B, 8, 8, 3)
    assert len(calls) == 2
    (c0, u0, k0), (c1, u1, k1) = calls
    np.testing.assert_array_equal(c0, np.asarray(cond[:2]))
    np.testing.assert_array_equal(c1, np.asarray(cond[2:]))
    # per-item uncond must be split the same way
    np.testing.assert_array_equal(u0, np.asarray(uncond[:2]))
    np.testing.assert_array_equal(u1, np.asarray(uncond[2:]))
    np.testing.assert_array_equal(np.asarray(k0["pooled"]),
                                  np.asarray(pooled[:2]))
    np.testing.assert_array_equal(np.asarray(k1["pooled"]),
                                  np.asarray(pooled[2:]))
    # broadcast (1, Dp) rows and the PRNG key pass through untouched
    assert k0["uncond_pooled"].shape == (1, 5)
    assert k1["uncond_pooled"].shape == (1, 5)
    np.testing.assert_array_equal(np.asarray(k0["key"]), np.asarray(key))


def test_refiner_timeids_cfg_halves():
    """addition_num_ids == 5 (refiner): uncond rows carry aesthetic 2.5,
    cond rows 6.0 — matching upstream negative_aesthetic_score handling."""
    models = SDModels.tiny_xl()
    models.unet_config = models.unet_config.replace(addition_num_ids=5)
    eng = Engine(models, scheduler="ddim")
    Bp = 8  # divisible by the test mesh's 8-way data axis
    pooled = jnp.ones((Bp, models.unet_config.addition_pooled_dim))
    uncond_pooled = jnp.zeros((1, models.unet_config.addition_pooled_dim))

    def pad(x):
        x = jnp.asarray(x)
        if x.shape[0] == Bp:
            return x
        return jnp.pad(x, [(0, Bp - x.shape[0])] + [(0, 0)] * (x.ndim - 1))

    h = w = models.unet_config.sample_size
    (_, tids) = eng._added_conds(pad, pooled, uncond_pooled, Bp, Bp, h, w)
    tids = np.asarray(tids)
    assert tids.shape == (2 * Bp, 5)
    np.testing.assert_array_equal(tids[:Bp, 4], 2.5)  # uncond half
    np.testing.assert_array_equal(tids[Bp:, 4], 6.0)  # cond half
    f = models.vae_scale_factor
    np.testing.assert_array_equal(tids[:, 0], h * f)
    np.testing.assert_array_equal(tids[:, 1], w * f)


@pytest.fixture(scope="module")
def tiled_engine():
    return Engine(SDModels.tiny(), scheduler="ddim", vae_tile=8,
                  vae_tile_overlap=4)


def test_tiled_encode_nonsquare(tiled_engine):
    """One latent axis below the tile, the other above: positions() must
    clamp to a single whole-axis tile instead of a negative origin."""
    eng = tiled_engine
    f = eng.models.vae_scale_factor
    rng = np.random.default_rng(0)
    # latent 4 x 24 with tile 8: h < tile < w
    img = jnp.asarray(rng.standard_normal((1, 4 * f, 24 * f, 3)), jnp.float32)
    z = np.asarray(eng.encode_image(img))
    assert z.shape == (1, 4, 24, eng.models.unet_config.in_channels)
    assert np.isfinite(z).all()


def test_tiled_decode_nonsquare(tiled_engine):
    eng = tiled_engine
    f = eng.models.vae_scale_factor
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, 4, 24, 4)), jnp.float32)
    img = eng.decode_latents_tiled(lat)
    assert img.shape == (1, 4 * f, 24 * f, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_embed_cache_lru_pins_uncond():
    """LRU eviction keeps the uncond ("") entry hot under diverse-prompt
    churn (a clear-all used to wipe it every 256 prompts)."""
    models = SDModels.tiny()
    eng = Engine(models, scheduler="ddim")
    eng.embed_text("")
    uncond_entry = eng._embed_cache[("",)]
    for i in range(300):
        eng.embed_text(f"prompt {i}")
    assert len(eng._embed_cache) <= 257
    assert ("",) in eng._embed_cache
    assert eng._embed_cache[("",)] is uncond_entry
    # most-recent prompts survive, oldest evicted
    assert (f"prompt 299",) in eng._embed_cache
    assert (f"prompt 0",) not in eng._embed_cache
