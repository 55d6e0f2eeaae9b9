"""RealESRGANModel — 4x frame upsampling on TPU.

API-compatible rebuild of the reference wrapper (``upsampling.py:13-99``)
minus its torch/CUDA dependency and BGR churn (``upsampling.py:43-47``):
frames stay RGB NHWC end to end, inference is jitted and spatially tiled so
512 -> 2048 fits in HBM (the reference leaned on RealESRGANer's tiling,
``upsampling.py:14,27``).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..models.rrdbnet import RRDBNet, RRDBNetConfig

logger = logging.getLogger("sdv_tpu")


class RealESRGANModel:
    def __init__(self, config: RRDBNetConfig, params, tile: int = 0,
                 tile_pad: int = 10, dtype=jnp.float32):
        self.config = config
        self.model = RRDBNet(config, dtype=dtype)
        self.params = params
        self.tile = tile
        self.tile_pad = tile_pad
        self._apply = jax.jit(self.model.apply)

    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained(cls, path: Optional[str] = None,
                        tile: int = 0, tile_pad: int = 10) -> "RealESRGANModel":
        """Load converted RealESRGAN_x4plus weights from a local ``.pth`` /
        ``.safetensors`` file.  (The reference pulls them from the HF hub,
        ``upsampling.py:31-41``; this environment has no network egress, so a
        local path is required.)"""
        if path is None:
            raise FileNotFoundError(
                "RealESRGAN weights are required for upsampling: pass "
                "from_pretrained(path_to_RealESRGAN_x4plus.pth). (No network "
                "egress in this environment — the reference would download "
                "nateraw/real-esrgan.)")
        from ..models.weights import load_realesrgan
        config, params = load_realesrgan(path)
        return cls(config, params, tile=tile, tile_pad=tile_pad)

    @classmethod
    def tiny(cls, seed: int = 0, **kw) -> "RealESRGANModel":
        """Random tiny model (tests / smoke runs)."""
        cfg = RRDBNetConfig.tiny()
        params = RRDBNet(cfg).init(jax.random.PRNGKey(seed),
                                   jnp.zeros((1, 8, 8, 3)))
        return cls(cfg, params, **kw)

    # ------------------------------------------------------------------
    def _run(self, batch: np.ndarray) -> np.ndarray:
        """(B,H,W,3) [0,1] -> (B,4H,4W,3) [0,1], tiled if configured."""
        if not self.tile:
            return np.asarray(self._apply(self.params, jnp.asarray(batch)))
        b, h, w, c = batch.shape
        s = self.config.scale
        out = np.zeros((b, h * s, w * s, c), np.float32)
        for y0 in range(0, h, self.tile):
            for x0 in range(0, w, self.tile):
                y1, x1 = min(y0 + self.tile, h), min(x0 + self.tile, w)
                yp0, xp0 = max(y0 - self.tile_pad, 0), max(x0 - self.tile_pad, 0)
                yp1, xp1 = min(y1 + self.tile_pad, h), min(x1 + self.tile_pad, w)
                tile_out = np.asarray(self._apply(
                    self.params, jnp.asarray(batch[:, yp0:yp1, xp0:xp1])))
                oy, ox = (y0 - yp0) * s, (x0 - xp0) * s
                out[:, y0 * s:y1 * s, x0 * s:x1 * s] = tile_out[
                    :, oy:oy + (y1 - y0) * s, ox:ox + (x1 - x0) * s]
        return out

    def __call__(self, image: Union[Image.Image, np.ndarray]):
        """PIL -> PIL (x4) or float array (B,H,W,3) -> array, as given."""
        if isinstance(image, Image.Image):
            arr = np.asarray(image.convert("RGB"), np.float32)[None] / 255.0
            out = self._run(arr)[0]
            return Image.fromarray((out * 255).round().astype(np.uint8))
        return self._run(np.asarray(image, np.float32))

    forward = __call__

    def upsample_imagefolder(self, in_dir, out_dir, suffix: str = "out"):
        """Batch-upsample a folder of images (reference
        ``upsample_imagefolder``, ``upsampling.py:83-99``)."""
        in_dir, out_dir = Path(in_dir), Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        exts = {".png", ".jpg", ".jpeg", ".webp"}
        paths = sorted(p for p in in_dir.iterdir() if p.suffix.lower() in exts)
        for p in paths:
            out = self(Image.open(p))
            stem = f"{p.stem}_{suffix}" if suffix else p.stem
            out.save(out_dir / f"{stem}{p.suffix}")
        logger.info("upsampled %d images -> %s", len(paths), out_dir)
