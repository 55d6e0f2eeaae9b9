"""Parity metric tests (PSNR/SSIM + frame-dir comparison)."""

import numpy as np
import pytest
from PIL import Image

from stable_diffusion_videos_tpu.utils.metrics import (compare_frame_dirs,
                                                       psnr, ssim)


def test_psnr_identity_and_noise(rng):
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.float64)
    assert psnr(img, img) == float("inf")
    noisy = img + rng.normal(0, 5, img.shape)
    p = psnr(img, noisy)
    assert 25 < p < 45


def test_ssim_bounds(rng):
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.float64)
    assert ssim(img, img) == pytest.approx(1.0, abs=1e-9)
    inverted = 255 - img
    assert ssim(img, inverted) < 0.3
    slightly = np.clip(img + rng.normal(0, 2, img.shape), 0, 255)
    assert ssim(img, slightly) > 0.9


def test_compare_frame_dirs(tmp_path, rng):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(); b.mkdir()
    for i in range(3):
        img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
        Image.fromarray(img).save(a / f"frame{i:06d}.png")
        jitter = np.clip(img.astype(int) + rng.integers(-2, 3, img.shape),
                         0, 255).astype(np.uint8)
        Image.fromarray(jitter).save(b / f"frame{i:06d}.png")
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(b / "frame9.png")
    out = compare_frame_dirs(a, b, glob="frame*.png")
    assert out["frames"] == 3
    assert out["psnr_mean"] > 35
    assert out["ssim_mean"] > 0.9
    assert out["missing_in_a"] == ["frame9.png"]


def test_compare_frame_dirs_no_overlap(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(); b.mkdir()
    with pytest.raises(ValueError):
        compare_frame_dirs(a, b)


def test_quality_vs_exact():
    from stable_diffusion_videos_tpu.utils.metrics import quality_vs_exact
    rng = np.random.default_rng(0)
    exact = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    same = quality_vs_exact(exact.copy(), exact)
    assert same["rel_err"] == 0.0
    assert same["ssim_mean"] == 1.0
    approx = np.clip(exact + rng.normal(0, 0.02, exact.shape), 0, 1)
    q = quality_vs_exact(approx.astype(np.float32), exact)
    assert 0 < q["rel_err"] < 0.2
    assert 0.5 < q["ssim_min"] <= q["ssim_mean"] < 1.0
    assert q["psnr_min"] <= q["psnr_mean"]
    assert "lpips_mean" not in q  # no weights supplied


def test_psnr_spread_by_reference_groups():
    """Spread/saturation must be computed per shared reference: pooling
    PSNRs measured against different baselines can fake separation (a
    saturated sweep hiding behind a cross-reference gap)."""
    from stable_diffusion_videos_tpu.utils.metrics import (
        psnr_spread_by_reference)
    configs = {
        # saturated group vs exact (spread 0.1 dB)
        "step_cache=2": {"psnr_mean": 92.0},
        "step_cache=3": {"psnr_mean": 91.9},
        # far-away reference group (would fake a 52 dB pooled spread)
        "dpm25_vs_dpm50": {"psnr_mean": 40.0},
        "dpm20_vs_dpm50": {"psnr_mean": 38.0},
        # singleton group: no spread computable
        "lcm4_vs_teacher_dpm50": {"psnr_mean": 20.0, "ident_acc": 1.0},
        # non-gate entry is ignored
        "meta": {"note": "x"},
    }
    out = psnr_spread_by_reference(configs)
    assert out["spreads_db"] == {"exact": 0.1, "dpm50": 2.0}
    assert out["psnr_spread_db"] == 2.0
    # the exact group IS saturated -> the flag must say so even though a
    # pooled max-min across groups would be ~72 dB
    assert out["saturated"] is True
    assert psnr_spread_by_reference({})["saturated"] is False
