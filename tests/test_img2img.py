"""img2img tests (ddim/euler/dpm via mid-schedule table slicing)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipelines():
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline
    m = SDModels.tiny()
    return {name: StableDiffusionWalkPipeline(m, scheduler=name)
            for name in ("ddim", "euler", "euler_ancestral", "dpm")}


@pytest.fixture()
def image(tmp_path):
    rng = np.random.default_rng(0)
    return (rng.uniform(0, 1, (16, 16, 3)) * 255).astype(np.uint8)


@pytest.mark.parametrize("sched", ["ddim", "euler", "euler_ancestral", "dpm"])
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


def test_img2img_pndm_rejected(image):
    from stable_diffusion_videos_tpu.models.bundle import SDModels
    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline
    pipe = StableDiffusionWalkPipeline(SDModels.tiny(), scheduler="pndm")
    with pytest.raises(NotImplementedError):
        pipe.img2img(image, "x", num_inference_steps=4)


def test_img2img_deterministic(pipelines, image):
    pipe = pipelines["euler"]
    a = pipe.img2img(image, "dd", seed=5, num_inference_steps=4,
                     output_type="np")
    b = pipe.img2img(image, "dd", seed=5, num_inference_steps=4,
                     output_type="np")
    np.testing.assert_array_equal(a, b)
