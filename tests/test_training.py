"""Training-step tests: sharded fine-tune on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


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
