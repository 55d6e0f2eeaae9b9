"""Unit tests for slerp/lerp/trajectory (the reference left these untested —
SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_videos_tpu.core import interp


def _np_slerp_reference(t, v0, v1, thr=0.9995):
    """Straight numpy transcription of the documented semantics
    (reference utils.py:42-66) for cross-checking the device version."""
    dot = np.sum(v0 * v1 / (np.linalg.norm(v0) * np.linalg.norm(v1)))
    if np.abs(dot) > thr:
        return (1 - t) * v0 + t * v1
    theta_0 = np.arccos(dot)
    s0 = np.sin(theta_0 * (1 - t)) / np.sin(theta_0)
    s1 = np.sin(theta_0 * t) / np.sin(theta_0)
    return s0 * v0 + s1 * v1


def test_slerp_matches_reference_math(rng):
    v0 = rng.standard_normal((4, 8)).astype(np.float32)
    v1 = rng.standard_normal((4, 8)).astype(np.float32)
    for t in [0.0, 0.25, 0.5, 0.9, 1.0]:
        got = np.asarray(interp.slerp(t, jnp.asarray(v0), jnp.asarray(v1)))
        want = _np_slerp_reference(t, v0, v1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_slerp_endpoints(rng):
    v0 = rng.standard_normal((2, 3, 5)).astype(np.float32)
    v1 = rng.standard_normal((2, 3, 5)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(interp.slerp(0.0, v0, v1)), v0,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(interp.slerp(1.0, v0, v1)), v1,
                               rtol=1e-5, atol=1e-6)


def test_slerp_colinear_falls_back_to_lerp(rng):
    v0 = rng.standard_normal((16,)).astype(np.float32)
    v1 = 2.0 * v0  # dot == 1 -> lerp branch, and no NaNs from theta_0=0
    got = np.asarray(interp.slerp(0.5, v0, v1))
    np.testing.assert_allclose(got, 1.5 * v0, rtol=1e-5)
    assert np.isfinite(got).all()


def test_slerp_batched_t_equals_loop(rng):
    v0 = rng.standard_normal((3, 4)).astype(np.float32)
    v1 = rng.standard_normal((3, 4)).astype(np.float32)
    ts = np.linspace(0, 1, 7).astype(np.float32)
    batched = np.asarray(interp.slerp(ts, v0, v1))
    assert batched.shape == (7, 3, 4)
    for i, t in enumerate(ts):
        np.testing.assert_allclose(
            batched[i], np.asarray(interp.slerp(float(t), v0, v1)),
            rtol=1e-5, atol=1e-6)


def test_slerp_preserves_norm_on_sphere(rng):
    # slerp of unit-norm gaussian latents should stay ~unit norm (the reason
    # the walk uses slerp for noise at all)
    v0 = rng.standard_normal((4096,)).astype(np.float32)
    v1 = rng.standard_normal((4096,)).astype(np.float32)
    v0 /= np.linalg.norm(v0)
    v1 /= np.linalg.norm(v1)
    mid = np.asarray(interp.slerp(0.5, v0, v1))
    assert abs(np.linalg.norm(mid) - 1.0) < 1e-3


def test_lerp_batched(rng):
    v0 = rng.standard_normal((2, 2)).astype(np.float32)
    v1 = rng.standard_normal((2, 2)).astype(np.float32)
    ts = np.array([0.0, 0.5, 1.0], np.float32)
    out = np.asarray(interp.lerp(ts, v0, v1))
    np.testing.assert_allclose(out[0], v0, rtol=1e-6)
    np.testing.assert_allclose(out[1], 0.5 * (v0 + v1), rtol=1e-6)
    np.testing.assert_allclose(out[2], v1, rtol=1e-6)


@pytest.mark.parametrize("embed_interp,noise_interp",
                         [("lerp", "slerp"), ("slerp", "slerp")])
def test_trajectory_shapes(rng, embed_interp, noise_interp):
    ea = rng.standard_normal((1, 77, 32)).astype(np.float32)
    eb = rng.standard_normal((1, 77, 32)).astype(np.float32)
    na = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    nb = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    ts = np.linspace(0, 1, 5).astype(np.float32)
    embeds, noise = interp.trajectory(ts, ea, eb, na, nb,
                                      embed_interp=embed_interp,
                                      noise_interp=noise_interp)
    assert embeds.shape == (5, 1, 77, 32)
    assert noise.shape == (5, 1, 8, 8, 4)
