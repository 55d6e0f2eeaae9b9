"""Training-step tests: sharded fine-tune on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_videos_tpu.models.bundle import SDModels
from stable_diffusion_videos_tpu.training import TrainConfig, UNetTrainer


@pytest.fixture(scope="module")
def trainer():
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.training import TrainConfig, UNetTrainer
    return UNetTrainer(SDModels.tiny(),
                       config=TrainConfig(learning_rate=1e-3))


def test_train_step_runs_and_loss_finite(trainer):
    lat = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (8, 7, 32))
    loss = trainer.step(lat, ctx)
    assert np.isfinite(loss) and loss > 0


def test_overfit_loss_decreases(trainer):
    lat = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (8, 7, 32))
    losses = [trainer.step(lat, ctx, key=jax.random.PRNGKey(10 + i))
              for i in range(30)]
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_params_change_and_export(trainer):
    before = jax.tree.leaves(trainer.models.params["unet"])[0]
    after_tree = trainer.export_params()
    after = jax.tree.leaves(after_tree["unet"])[0]
    assert after.dtype == before.dtype
    assert np.abs(np.asarray(after, np.float32)
                  - np.asarray(before, np.float32)).max() > 0


def test_finetune_convenience(trainer):
    imgs = np.random.default_rng(0).uniform(-1, 1, (4, 16, 16, 3)) \
        .astype(np.float32)
    losses = trainer.finetune(imgs, ["a", "b", "c", "d"], num_steps=3,
                              log_every=0)
    assert len(losses) == 3 and all(np.isfinite(losses))


def test_remat_matches_plain_gradients():
    """jax.checkpoint rematerialisation must not change the training math:
    same seed + same data => same loss sequence as the plain step."""
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.training import TrainConfig, UNetTrainer

    models = SDModels.tiny()
    lat = np.random.default_rng(0).standard_normal((8, 8, 8, 4)) \
        .astype(np.float32)
    ctx = np.random.default_rng(1).standard_normal((8, 7, 32)) \
        .astype(np.float32)

    import jax
    losses = {}
    for remat in (False, True):
        tr = UNetTrainer(SDModels.tiny(),
                         config=TrainConfig(learning_rate=1e-3, remat=remat))
        seq = [tr.step(lat, ctx, key=jax.random.PRNGKey(5)) for _ in range(2)]
        losses[remat] = seq
    np.testing.assert_allclose(losses[False], losses[True],
                               rtol=1e-5, atol=1e-6)


def _tiny_data(models, b=8):
    rng = np.random.default_rng(0)
    cfg = models.unet_config
    lat = rng.standard_normal((b, cfg.sample_size, cfg.sample_size,
                               cfg.in_channels)).astype(np.float32) * 0.1
    ctx = rng.standard_normal((b, 7, cfg.cross_attention_dim)) \
        .astype(np.float32)
    return lat, ctx


def test_v_prediction_objective_differs():
    models = SDModels.tiny()
    lat, ctx = _tiny_data(models)
    t_eps = UNetTrainer(models, config=TrainConfig(learning_rate=0.0))
    t_v = UNetTrainer(models, config=TrainConfig(learning_rate=0.0,
                                                 objective="v_prediction"))
    key = jax.random.PRNGKey(0)
    l_eps = t_eps.step(lat, ctx, key=key)
    l_v = t_v.step(lat, ctx, key=key)
    assert np.isfinite(l_eps) and np.isfinite(l_v)
    assert abs(l_eps - l_v) > 1e-6  # different targets, same inputs


def test_objective_validation():
    with pytest.raises(ValueError, match="objective"):
        UNetTrainer(SDModels.tiny(), config=TrainConfig(objective="x0"))


def test_min_snr_weighting_changes_loss():
    models = SDModels.tiny()
    lat, ctx = _tiny_data(models)
    key = jax.random.PRNGKey(1)
    plain = UNetTrainer(models, config=TrainConfig(learning_rate=0.0))
    snr = UNetTrainer(models, config=TrainConfig(learning_rate=0.0,
                                                 snr_gamma=5.0))
    l_plain = plain.step(lat, ctx, key=key)
    l_snr = snr.step(lat, ctx, key=key)
    assert np.isfinite(l_snr)
    assert abs(l_plain - l_snr) > 1e-8


def test_ema_tracks_and_exports():
    models = SDModels.tiny()
    lat, ctx = _tiny_data(models)
    tr = UNetTrainer(models, config=TrainConfig(learning_rate=1e-3,
                                                ema_decay=0.5))
    p0 = jax.tree.leaves(tr.params)[0].copy()
    for i in range(3):
        tr.step(lat, ctx)
    live = jax.tree.leaves(tr.params)[0]
    ema = jax.tree.leaves(tr.ema_params)[0]
    # EMA lags the live params but has moved off the init
    assert not np.allclose(np.asarray(live), np.asarray(ema))
    assert not np.allclose(np.asarray(ema), np.asarray(p0))
    exported = tr.export_params(ema=True)["unet"]
    assert np.allclose(np.asarray(jax.tree.leaves(exported)[0],
                                  np.float32), np.asarray(ema), atol=1e-6)
    exported_live = tr.export_params(ema=False)["unet"]
    assert np.allclose(np.asarray(jax.tree.leaves(exported_live)[0],
                                  np.float32), np.asarray(live), atol=1e-6)


def test_checkpoint_save_restore_resumes(tmp_path):
    models = SDModels.tiny()
    lat, ctx = _tiny_data(models)
    tr = UNetTrainer(models, config=TrainConfig(learning_rate=1e-3,
                                                ema_decay=0.9))
    for _ in range(2):
        tr.step(lat, ctx)
    tr.save_checkpoint(tmp_path / "ckpt")

    # fresh trainer restores and continues deterministically
    tr2 = UNetTrainer(SDModels.tiny(), config=TrainConfig(
        learning_rate=1e-3, ema_decay=0.9))
    tr2.restore_checkpoint(tmp_path / "ckpt")
    assert tr2.step_count == 2
    l_a = tr.step(lat, ctx)
    l_b = tr2.step(lat, ctx)
    assert l_a == pytest.approx(l_b, rel=1e-5)
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(tr.params)[0]),
                               np.asarray(jax.tree.leaves(tr2.params)[0]),
                               atol=1e-6)
