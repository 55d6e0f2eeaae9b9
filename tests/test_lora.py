"""LoRA adapter training tests (tiny models, 8-device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_videos_tpu.models.bundle import SDModels
from stable_diffusion_videos_tpu.training import (LoRATrainer,
                                                  init_lora_params,
                                                  merge_lora)


@pytest.fixture(scope="module")
def models():
    return SDModels.tiny()


def _data(models, b=8):
    rng = np.random.default_rng(0)
    cfg = models.unet_config
    lat = rng.standard_normal((b, cfg.sample_size, cfg.sample_size,
                               cfg.in_channels)).astype(np.float32) * 0.1
    ctx = rng.standard_normal((b, 7, cfg.cross_attention_dim)) \
        .astype(np.float32)
    return lat, ctx


def test_init_targets_attention_and_ff(models):
    lora = init_lora_params(models.params["unet"], rank=4)
    names = sorted(lora)
    assert any("to_q/kernel" in n for n in names)
    assert any("ff/proj_in/kernel" in n for n in names)
    assert all(v["a"].shape[1] == 4 and v["b"].shape[0] == 4
               for v in lora.values())
    # B starts at zero -> delta is exactly zero
    assert all(float(jnp.abs(v["b"]).max()) == 0.0 for v in lora.values())


def test_merge_identity_at_init(models):
    """Freshly initialised adapters reproduce the base model bit-exactly."""
    lora = init_lora_params(models.params["unet"], rank=4)
    merged = merge_lora(models.params["unet"], lora, 1.0)
    for a, b in zip(jax.tree.leaves(models.params["unet"]),
                    jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_trains_and_base_frozen(models):
    lat, ctx = _data(models)
    tr = LoRATrainer(models, rank=4, learning_rate=1e-2)
    base_before = jax.tree.map(lambda x: np.asarray(x).copy(), tr.base)
    losses = [tr.step(lat, ctx, key=jax.random.PRNGKey(i))
              for i in range(12)]
    assert all(np.isfinite(losses))
    # adapters moved
    assert any(float(jnp.abs(v["b"]).max()) > 0 for v in tr.lora.values())
    # base untouched
    for a, b in zip(jax.tree.leaves(base_before),
                    jax.tree.leaves(tr.base)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # same-noise loss improves vs step 0 (overfitting a fixed batch)
    assert min(losses[6:]) < losses[0]


def test_lora_changes_inference_output(models):
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    lat, ctx = _data(models)
    tr = LoRATrainer(models, rank=4, learning_rate=5e-2)
    for i in range(5):
        tr.step(lat, ctx)
    merged = tr.export_params()
    base_unet = models.unet()
    x = jnp.asarray(lat[:1])
    t = jnp.asarray([10.0])
    c = jnp.asarray(ctx[:1])
    out_base = base_unet.apply(models.params["unet"], x, t, c)
    out_lora = base_unet.apply(merged["unet"], x, t, c)
    assert not np.allclose(np.asarray(out_base), np.asarray(out_lora),
                           atol=1e-6)


def test_lora_save_load_roundtrip(models, tmp_path):
    tr = LoRATrainer(models, rank=4, alpha=8.0)
    lat, ctx = _data(models)
    tr.step(lat, ctx)
    p = tmp_path / "style_lora.npz"
    tr.save_lora(p)
    lora, rank, alpha = LoRATrainer.load_lora(p)
    assert rank == 4 and alpha == 8.0
    assert sorted(lora) == sorted(tr.lora)
    for name in tr.lora:
        np.testing.assert_allclose(np.asarray(lora[name]["a"]),
                                   np.asarray(tr.lora[name]["a"]),
                                   atol=1e-7)
    # merged output identical to the live trainer's export
    m1 = merge_lora(models.params["unet"], lora, alpha / rank)
    m2 = tr.export_params()["unet"]
    for a, b in zip(jax.tree.leaves(m1), jax.tree.leaves(m2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_lora_v_prediction_objective(models):
    lat, ctx = _data(models)
    tr = LoRATrainer(models, rank=2, objective="v_prediction")
    assert np.isfinite(tr.step(lat, ctx))
    with pytest.raises(ValueError, match="objective"):
        LoRATrainer(models, rank=2, objective="x0")
