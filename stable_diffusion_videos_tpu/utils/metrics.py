"""Frame-parity metrics: PSNR + SSIM (numpy) + LPIPS (Flax, see lpips.py).

BASELINE.md gates parity on LPIPS; ``utils/lpips.py`` owns the AlexNet/VGG
feature-distance architecture + torch-checkpoint converter (pretrained
weights cannot be fetched here — no egress — so until a checkpoint is
supplied via ``--lpips-weights``/``SDV_LPIPS_WEIGHTS``, SSIM >= 0.92 is the
documented stand-in threshold).  ``compare_frame_dirs`` scores two
directories of generated frames (e.g. this framework vs the reference
pipeline run elsewhere) frame by frame.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from scipy.ndimage import uniform_filter


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 255.0,
         win: int = 7, k1: float = 0.01, k2: float = 0.03) -> float:
    """Mean structural similarity (uniform window, per-channel averaged)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    vals = []
    for ch in range(a.shape[-1]):
        x, y = a[..., ch], b[..., ch]
        mx = uniform_filter(x, win)
        my = uniform_filter(y, win)
        mxx = uniform_filter(x * x, win)
        myy = uniform_filter(y * y, win)
        mxy = uniform_filter(x * y, win)
        vx = mxx - mx * mx
        vy = myy - my * my
        cxy = mxy - mx * my
        s = ((2 * mx * my + c1) * (2 * cxy + c2)) / (
            (mx ** 2 + my ** 2 + c1) * (vx + vy + c2))
        pad = win // 2
        vals.append(s[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))


def compare_frame_dirs(dir_a, dir_b, glob: str = "**/frame*.png",
                       lpips_weights: str | None = None,
                       lpips_net: str = "alex") -> dict:
    """Match frames by filename; returns per-metric mean/min + worst frame.

    ``lpips_weights`` (or env ``SDV_LPIPS_WEIGHTS``): path to a torch
    .pth/.npz of AlexNet/VGG + lin-head weights — enables the BASELINE.md
    LPIPS parity gate (lower = closer; <0.1 is the customary "same image
    modulo fp noise" bound)."""
    import os

    from PIL import Image
    lpips_weights = lpips_weights or os.environ.get("SDV_LPIPS_WEIGHTS")
    lpips_params = None
    if lpips_weights:
        from .lpips import load_lpips_weights
        lpips_params = load_lpips_weights(lpips_weights, net=lpips_net)
    a_frames = {p.name: p for p in Path(dir_a).glob(glob)}
    b_frames = {p.name: p for p in Path(dir_b).glob(glob)}
    common = sorted(a_frames.keys() & b_frames.keys())
    if not common:
        raise ValueError("no common frame filenames between the two dirs")
    psnrs, ssims, lpipss = [], [], []
    for name in common:
        ia = np.asarray(Image.open(a_frames[name]).convert("RGB"))
        ib = np.asarray(Image.open(b_frames[name]).convert("RGB"))
        if ia.shape != ib.shape:
            raise ValueError(f"{name}: shape {ia.shape} vs {ib.shape}")
        psnrs.append(psnr(ia, ib))
        ssims.append(ssim(ia, ib))
        if lpips_params is not None:
            from .lpips import lpips_distance
            lpipss.append(float(lpips_distance(ia, ib, lpips_params,
                                               net=lpips_net)[0]))
    worst = int(np.argmin(ssims))
    out = {
        "frames": len(common),
        "psnr_mean": round(float(np.mean(psnrs)), 3),
        "psnr_min": round(float(np.min(psnrs)), 3),
        "ssim_mean": round(float(np.mean(ssims)), 5),
        "ssim_min": round(float(np.min(ssims)), 5),
        "worst_frame": common[worst],
        "missing_in_a": sorted(b_frames.keys() - a_frames.keys())[:5],
        "missing_in_b": sorted(a_frames.keys() - b_frames.keys())[:5],
    }
    if lpipss:
        out["lpips_mean"] = round(float(np.mean(lpipss)), 5)
        out["lpips_max"] = round(float(np.max(lpipss)), 5)
        out["lpips_net"] = lpips_net
    return out


def quality_vs_exact(frames: np.ndarray, exact: np.ndarray,
                     lpips_weights: str | None = None,
                     lpips_net: str = "alex") -> dict:
    """Quality gate for approximations (step caching, quantisation):
    per-frame SSIM/PSNR + relative error of ``frames`` vs the ``exact``
    batch (float [0,1] (B,H,W,3)); adds LPIPS when weights are supplied
    (arg or env ``SDV_LPIPS_WEIGHTS``).  A speedup number should never be
    quoted without this dict next to it."""
    import os

    frames = np.asarray(frames, np.float32)
    exact = np.asarray(exact, np.float32)
    rel = float(np.linalg.norm(frames - exact)
                / max(np.linalg.norm(exact), 1e-12))
    ssims = [ssim(frames[i], exact[i], data_range=1.0)
             for i in range(frames.shape[0])]
    psnrs = [psnr(frames[i], exact[i], data_range=1.0)
             for i in range(frames.shape[0])]
    out = {
        "rel_err": round(rel, 5),
        "ssim_mean": round(float(np.mean(ssims)), 5),
        "ssim_min": round(float(np.min(ssims)), 5),
        "psnr_mean": round(float(np.mean(psnrs)), 2),
        "psnr_min": round(float(np.min(psnrs)), 2),
    }
    lpips_weights = lpips_weights or os.environ.get("SDV_LPIPS_WEIGHTS")
    if lpips_weights:
        from .lpips import load_lpips_weights, lpips_distance
        params = load_lpips_weights(lpips_weights, net=lpips_net)
        d = lpips_distance(frames, exact, params, net=lpips_net)
        out["lpips_mean"] = round(float(np.mean(d)), 5)
        out["lpips_max"] = round(float(np.max(d)), 5)
        out["lpips_net"] = lpips_net
    return out


def psnr_spread_by_reference(configs: dict) -> dict:
    """Saturation check for a table of ``quality_vs_exact`` gate entries:
    max−min ``psnr_mean`` computed PER shared reference, where a config's
    reference is its ``_vs_<ref>`` name suffix (entries without one were
    gated against the exact program).  PSNRs measured against DIFFERENT
    references are incomparable — one pooled spread would let a genuinely
    saturated sweep hide behind a cross-reference gap.  Returns
    ``{"spreads_db": {ref: dB}, "psnr_spread_db": <max>, "saturated":
    all-groups-with->=2-entries-under-3dB}``."""
    groups: dict[str, list[float]] = {}
    for name, g in configs.items():
        if "psnr_mean" not in g:
            continue
        ref = name.rsplit("_vs_", 1)[1] if "_vs_" in name else "exact"
        groups.setdefault(ref, []).append(float(g["psnr_mean"]))
    spreads = {ref: round(max(ps) - min(ps), 2)
               for ref, ps in groups.items() if len(ps) >= 2}
    return {
        "spreads_db": spreads,
        "psnr_spread_db": max(spreads.values()) if spreads else 0.0,
        "saturated": bool(spreads) and all(s < 3.0
                                           for s in spreads.values()),
    }


def temporal_flicker(frames, data_range: float = 1.0,
                     lpips_weights: str | None = None,
                     lpips_net: str = "alex") -> dict:
    """Temporal-coherence metric for generated video: statistics of the
    CONSECUTIVE-frame differences of ``frames`` ((T,H,W,3) float [0,1] or a
    list of arrays/PIL images).

    * ``flicker_ssim`` — mean (1 - SSIM) between consecutive frames; 0 on a
      perfectly steady video, grows with frame-to-frame shimmer.
    * ``flicker_mad`` — mean absolute pixel difference (same units as the
      frames); the blunt companion that also catches large jumps SSIM's
      local statistics can forgive.
    * ``flicker_lpips_mean`` — mean consecutive-frame LPIPS when weights
      are available (arg or env ``SDV_LPIPS_WEIGHTS``); the perceptual
      version of the same statistic.

    On a STATIC input video any nonzero value is pure pipeline flicker,
    which makes this the quality gate for vid2vid coherence levers
    (``shared_noise``, ``latent_ema`` — pipeline/walk.py vid2vid)."""
    import os

    arr = [np.asarray(f, np.float32) for f in frames]
    arr = [a / 255.0 if a.max() > 1.5 else a for a in arr]
    frames = np.stack(arr)
    if frames.shape[0] < 2:
        raise ValueError("temporal_flicker needs >= 2 frames")
    d_ssim = [1.0 - ssim(frames[i], frames[i + 1], data_range=data_range)
              for i in range(frames.shape[0] - 1)]
    mad = [float(np.mean(np.abs(frames[i + 1] - frames[i])))
           for i in range(frames.shape[0] - 1)]
    out = {
        "flicker_ssim": round(float(np.mean(d_ssim)), 6),
        "flicker_ssim_max": round(float(np.max(d_ssim)), 6),
        "flicker_mad": round(float(np.mean(mad)), 6),
        "n_frames": int(frames.shape[0]),
    }
    lpips_weights = lpips_weights or os.environ.get("SDV_LPIPS_WEIGHTS")
    if lpips_weights:
        from .lpips import load_lpips_weights, lpips_distance
        params = load_lpips_weights(lpips_weights, net=lpips_net)
        d = lpips_distance(frames[:-1], frames[1:], params, net=lpips_net)
        out["flicker_lpips_mean"] = round(float(np.mean(d)), 5)
        out["flicker_lpips_max"] = round(float(np.max(d)), 5)
    return out
