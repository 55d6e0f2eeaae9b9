"""LPIPS perceptual distance — from-scratch Flax AlexNet/VGG16 feature nets.

BASELINE.md gates frame parity on LPIPS.  The metric (Zhang et al. 2018) is:
scale the two RGB images into the backbone's input statistics, run an
ImageNet-pretrained feature net (AlexNet ``features`` or VGG16 conv stack),
unit-normalize each tapped activation along channels, square the difference,
project each layer's squared diff to a scalar map with a learned 1x1 conv
("lin" head), spatially average, and sum over the tapped layers.

No network egress exists here, so the pretrained weights cannot be fetched;
this module owns the *architecture* and a converter from the standard torch
checkpoints (torchvision ``alexnet``/``vgg16`` ``features.*`` keys + the
``lpips`` package's ``lin*.model.1.weight`` heads, either naming scheme) so
the gate works the moment weights are present.  The forward is numerically
validated against an independent torch transcription in
``tests/test_lpips.py`` with random weights — same pattern as the UNet/VAE
parity tests.

Replaces the reference's implicit reliance on eyeballing frames (it ships no
quality metric at all — SURVEY.md §6).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (out_channels, kernel, stride, padding, maxpool_before_conv)
_ALEX_CONVS = [
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]
# taps after every conv's relu
_ALEX_TAPS = [0, 1, 2, 3, 4]
# torchvision alexnet ``features`` indices of the 5 convs
_ALEX_TORCH_IDX = [0, 3, 6, 8, 10]

_VGG_CHANNELS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512,
                 512]
_VGG_CONVS = [(c, 3, 1, 1, i in (2, 4, 7, 10)) for i, c in
              enumerate(_VGG_CHANNELS)]
# taps: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_VGG_TAPS = [1, 3, 6, 9, 12]
_VGG_TORCH_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]

# lpips ScalingLayer constants (maps [-1,1] RGB into backbone statistics)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _net_spec(net: str):
    # (convs, taps, torch feature indices, maxpool window): torchvision
    # AlexNet pools are 3x3/stride-2, VGG16's are 2x2/stride-2
    if net == "alex":
        return _ALEX_CONVS, _ALEX_TAPS, _ALEX_TORCH_IDX, 3
    if net == "vgg":
        return _VGG_CONVS, _VGG_TAPS, _VGG_TORCH_IDX, 2
    raise ValueError(f"unknown LPIPS backbone {net!r} (alex|vgg)")


class LPIPS(nn.Module):
    """lpips(a, b): (B,H,W,3) pairs in [-1,1] -> (B,) perceptual distance."""

    net: str = "alex"

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        convs, taps, _, pk = _net_spec(self.net)
        x = (jnp.concatenate([a, b], axis=0) - _SHIFT) / _SCALE

        feats = []
        for i, (ch, k, s, p, pool) in enumerate(convs):
            if pool:
                x = nn.max_pool(x, (pk, pk), strides=(2, 2))
            x = nn.Conv(ch, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                        name=f"conv{i}")(x)
            x = nn.relu(x)
            if i in taps:
                feats.append(x)

        total = 0.0
        for j, f in enumerate(feats):
            # lpips.normalize_tensor: x / (||x||_ch + 1e-10)
            f = f / (jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True)) + 1e-10)
            fa, fb = jnp.split(f, 2, axis=0)
            d = (fa - fb) ** 2
            w = self.param(f"lin{j}", nn.initializers.ones,
                           (d.shape[-1],), jnp.float32)
            total = total + jnp.mean(d @ w, axis=(1, 2))
        return total


def convert_lpips_torch(state: dict[str, Any], net: str = "alex") -> dict:
    """Torch state dict -> LPIPS flax params.

    Accepts torchvision backbone keys (``features.N.weight/bias``) and/or
    the ``lpips`` package's full-model keys (``net.sliceK.N.weight``,
    ``lin{j}.model.1.weight``).  Values may be torch tensors or numpy.
    """
    def arr(v):
        return np.asarray(getattr(v, "numpy", lambda: v)())

    # normalize lpips-package backbone names to torchvision's features.N
    norm = {}
    for key, v in state.items():
        k = key
        if k.startswith("net.slice"):
            k = "features." + k.split(".", 2)[2]
        norm[k] = v

    convs, taps, torch_idx, _pk = _net_spec(net)
    params: dict[str, Any] = {}
    for i, ti in enumerate(torch_idx):
        w = arr(norm[f"features.{ti}.weight"])  # (O,I,kh,kw)
        params[f"conv{i}"] = {
            "kernel": w.transpose(2, 3, 1, 0).astype(np.float32),
            "bias": arr(norm[f"features.{ti}.bias"]).astype(np.float32),
        }
    for j in range(len(taps)):
        lin = None
        for cand in (f"lin{j}.model.1.weight", f"lins.{j}.model.1.weight",
                     f"lin{j}.weight"):
            if cand in norm:
                lin = arr(norm[cand])
                break
        if lin is None:
            raise KeyError(f"no lin{j} head in state dict")
        params[f"lin{j}"] = lin.reshape(-1).astype(np.float32)
    return {"params": params}


def load_lpips_weights(path: str, net: str = "alex") -> dict:
    """Load a .pth/.pt (torch.save'd state dict) or .npz of LPIPS weights."""
    if path.endswith(".npz"):
        state = dict(np.load(path))
    else:
        import torch
        state = torch.load(path, map_location="cpu", weights_only=True)
    return convert_lpips_torch(state, net=net)


def lpips_distance(a: np.ndarray, b: np.ndarray, params: dict,
                   net: str = "alex") -> np.ndarray:
    """uint8/float [0,255] or [0,1] (B,H,W,3) images -> (B,) LPIPS."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if a.ndim == 3:
        a, b = a[None], b[None]
    scale = 255.0 if a.max() > 1.5 or b.max() > 1.5 else 1.0
    a = a / scale * 2.0 - 1.0
    b = b / scale * 2.0 - 1.0
    model = LPIPS(net=net)
    return np.asarray(jax.jit(model.apply)(params, jnp.asarray(a),
                                           jnp.asarray(b)))
