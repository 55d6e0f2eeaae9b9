"""img2img tests: index-aligned samplers slice the schedule mid-way;
warm-up samplers (pndm/lms/unipc) rebuild truncated tables with the
multistep warm-up replayed at the entry point."""

import numpy as np
import pytest

ALL_SCHEDS = ("ddim", "euler", "euler_ancestral", "dpm", "lcm",
              "pndm", "lms", "unipc")


@pytest.fixture(scope="module")
def pipelines():
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline
    m = SDModels.tiny()
    return {name: StableDiffusionWalkPipeline(m, scheduler=name)
            for name in ALL_SCHEDS}


@pytest.fixture()
def image(tmp_path):
    rng = np.random.default_rng(0)
    return (rng.uniform(0, 1, (16, 16, 3)) * 255).astype(np.uint8)


@pytest.mark.parametrize("sched", ALL_SCHEDS)
def test_img2img_runs(pipelines, image, sched):
    out = pipelines[sched].img2img(image, "a tiny scene", strength=0.6,
                                   num_inference_steps=4, output_type="np")
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(out).all()
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_img2img_strength_slices_schedule(pipelines):
    """strength controls how many loop steps actually run."""
    eng = pipelines["ddim"].engine
    tables = eng._tables(10, 0.0)
    sliced = eng._sliced_tables(tables, 7)  # strength 0.3
    assert eng.sched.num_loop_steps(sliced) == 3
    assert float(sliced["init_noise_sigma"]) == 1.0
    # sliced timesteps are the TAIL of the full schedule
    np.testing.assert_array_equal(np.asarray(sliced["timesteps"]),
                                  np.asarray(tables["timesteps"])[7:])


def test_img2img_strengths_differ(pipelines, image):
    pipe = pipelines["ddim"]
    near = pipe.img2img(image, "pp", strength=0.25, num_inference_steps=8,
                        guidance_scale=1.0, output_type="np")
    far = pipe.img2img(image, "pp", strength=1.0, num_inference_steps=8,
                       guidance_scale=1.0, output_type="np")
    assert np.abs(near - far).max() > 1e-4


def test_img2img_strength_validation(pipelines, image):
    with pytest.raises(ValueError):
        pipelines["ddim"].img2img(image, "x", strength=0.0,
                                  num_inference_steps=4)


def test_pndm_truncated_tables_replay_warmup():
    """start_index drops the highest timesteps and restarts the PLMS
    warm-up (duplicated second entry, order ramp) at the truncated head."""
    from stable_diffusion_videos_tpu.core.schedulers import (SchedulerConfig,
                                                             get_scheduler)
    cfg = SchedulerConfig()
    sched = get_scheduler("pndm")
    full = sched.make_tables(cfg, 10)
    trunc = sched.make_tables(cfg, 10, start_index=3)
    # full plain descending schedule: strip the duplicated warm-up entry
    plain = np.asarray(full["timesteps"])[np.concatenate(
        [[0], np.arange(2, 11)])]
    sub = np.asarray(trunc["timesteps"])
    assert len(sub) == (10 - 3) + 1  # +1 = replayed duplicate entry
    assert sub[1] == sub[2]  # warm-up re-eval duplicated at the NEW head
    np.testing.assert_array_equal(np.unique(sub)[::-1], plain[3:])
    # order ramp restarts: euler row, then mean-of-2 row
    W = np.asarray(trunc["weights"])
    np.testing.assert_allclose(W[0], [1, 0, 0, 0, 0])
    np.testing.assert_allclose(W[1], [0.5, 0.5, 0, 0, 0])


def test_unipc_truncated_tables_restart_order_ramp():
    from stable_diffusion_videos_tpu.core.schedulers import (SchedulerConfig,
                                                             get_scheduler)
    cfg = SchedulerConfig()
    sched = get_scheduler("unipc")
    full = sched.make_tables(cfg, 10)
    trunc = sched.make_tables(cfg, 10, start_index=4)
    np.testing.assert_array_equal(np.asarray(trunc["timesteps"]),
                                  np.asarray(full["timesteps"])[4:])
    assert float(trunc["rp0"][0]) == 0.0      # predictor opens at order 1
    assert not bool(trunc["use_corr"][0])      # corrector off at entry


def test_lms_truncated_tables_rebuild_coeffs():
    """Truncated LMS coefficients are the warm-up ramp over the truncated
    sigma grid — NOT a slice of the full-schedule coefficient matrix."""
    from stable_diffusion_videos_tpu.core.schedulers import (SchedulerConfig,
                                                             get_scheduler)
    cfg = SchedulerConfig()
    sched = get_scheduler("lms")
    full = sched.make_tables(cfg, 10)
    trunc = sched.make_tables(cfg, 10, start_index=4)
    np.testing.assert_array_equal(np.asarray(trunc["sigmas"]),
                                  np.asarray(full["sigmas"])[4:])
    cf, ct = np.asarray(full["lms_coeffs"]), np.asarray(trunc["lms_coeffs"])
    assert ct.shape[0] == cf.shape[0] - 4
    # head row is order-1 (single Lagrange coefficient), unlike the
    # interior full-schedule rows it replaces
    assert np.count_nonzero(ct[0]) == 1
    assert np.count_nonzero(cf[4]) == 4
    # once history refills, coefficients re-converge to the full schedule
    np.testing.assert_allclose(ct[4:], cf[8:], rtol=1e-5)


@pytest.mark.parametrize("sched", ["pndm", "lms", "unipc"])
def test_inpaint_warmup_samplers_run(pipelines, image, sched):
    mask = np.zeros((16, 16), np.float32)
    mask[4:12, 4:12] = 1.0
    out = pipelines[sched].inpaint(image, mask, "a tiny scene",
                                   num_inference_steps=4, output_type="np")
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(out).all()


def test_img2img_deterministic(pipelines, image):
    pipe = pipelines["euler"]
    a = pipe.img2img(image, "dd", seed=5, num_inference_steps=4,
                     output_type="np")
    b = pipe.img2img(image, "dd", seed=5, num_inference_steps=4,
                     output_type="np")
    np.testing.assert_array_equal(a, b)


def test_tiled_encode_matches_whole():
    """encode_image with vae_tile: seam-blended tiles approximate the
    whole-frame encode (exact away from seams on a conv-local encoder)."""
    import jax.numpy as jnp
    import numpy as np

    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.runtime.engine import Engine

    models = SDModels.tiny()
    whole = Engine(models, scheduler="ddim")
    tiled = Engine(models, scheduler="ddim", vae_tile=8, vae_tile_overlap=4)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    zw = np.asarray(whole.encode_image(img))
    zt = np.asarray(tiled.encode_image(img))
    assert zt.shape == zw.shape
    # NOT exact anywhere: the encoder's GroupNorm statistics are computed
    # over each tile instead of the whole frame (the standard tiled-VAE
    # approximation, cf. diffusers enable_vae_tiling) — but the latents
    # must stay strongly correlated with the whole-frame encode
    corr = np.corrcoef(zt.ravel(), zw.ravel())[0, 1]
    assert corr > 0.8, corr
    assert np.isfinite(zt).all()
