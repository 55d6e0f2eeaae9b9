"""LPIPS numerical parity vs an independent torch transcription.

Same validation pattern as tests/test_torch_parity.py (UNet/VAE) and the
scheduler reference impls: transcribe the torch forward (torchvision
backbone slices + lpips lin heads, from the published architecture)
independently in torch, feed both implementations the SAME random weights
through ``convert_lpips_torch``, and assert output parity.  This catches any
transpose/padding/tap-point mismatch without needing the pretrained
checkpoint (no egress).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from stable_diffusion_videos_tpu.utils.lpips import (  # noqa: E402
    LPIPS, convert_lpips_torch, lpips_distance)

_ALEX = dict(
    idx=[0, 3, 6, 8, 10],
    shapes=[(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
            (256, 384, 3, 3), (256, 256, 3, 3)],
    stride=[4, 1, 1, 1, 1], pad=[2, 2, 1, 1, 1],
    pool_before=[False, True, True, False, False],
)
_VGG = dict(
    idx=[0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28],
    shapes=[(64, 3, 3, 3), (64, 64, 3, 3), (128, 64, 3, 3), (128, 128, 3, 3),
            (256, 128, 3, 3), (256, 256, 3, 3), (256, 256, 3, 3),
            (512, 256, 3, 3), (512, 512, 3, 3), (512, 512, 3, 3),
            (512, 512, 3, 3), (512, 512, 3, 3), (512, 512, 3, 3)],
    stride=[1] * 13, pad=[1] * 13,
    pool_before=[False, False, True, False, True, False, False, True,
                 False, False, True, False, False],
    taps=[1, 3, 6, 9, 12],  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
    pool_k=2,  # torchvision VGG16: MaxPool2d(kernel_size=2, stride=2)
)
_ALEX["taps"] = [0, 1, 2, 3, 4]
_ALEX["pool_k"] = 3  # torchvision AlexNet: MaxPool2d(kernel_size=3, stride=2)


def _random_state(spec, rng):
    state = {}
    for ti, shp in zip(spec["idx"], spec["shapes"]):
        state[f"features.{ti}.weight"] = torch.tensor(
            rng.standard_normal(shp, np.float32) * 0.1)
        state[f"features.{ti}.bias"] = torch.tensor(
            rng.standard_normal(shp[0], np.float32) * 0.1)
    for j, t in enumerate(spec["taps"]):
        ch = spec["shapes"][t][0]
        state[f"lin{j}.model.1.weight"] = torch.tensor(
            np.abs(rng.standard_normal((1, ch, 1, 1), np.float32)))
    return state


def _torch_lpips(a, b, state, spec):
    """Independent transcription of lpips.LPIPS.forward (alex/vgg,
    spatial=False): ScalingLayer -> backbone taps -> normalize_tensor ->
    squared diff -> 1x1 lin -> spatial mean -> sum."""
    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)
    x = (torch.cat([a, b], 0) - shift) / scale
    feats = []
    for i, ti in enumerate(spec["idx"]):
        if spec["pool_before"][i]:
            x = F.max_pool2d(x, spec["pool_k"], stride=2)
        x = F.conv2d(x, state[f"features.{ti}.weight"],
                     state[f"features.{ti}.bias"],
                     stride=spec["stride"][i], padding=spec["pad"][i])
        x = F.relu(x)
        if i in spec["taps"]:
            feats.append(x)
    total = 0.0
    for j, f in enumerate(feats):
        norm = torch.sqrt(torch.sum(f ** 2, dim=1, keepdim=True))
        f = f / (norm + 1e-10)
        fa, fb = torch.chunk(f, 2, dim=0)
        d = (fa - fb) ** 2
        val = F.conv2d(d, state[f"lin{j}.model.1.weight"])
        total = total + val.mean(dim=(2, 3)).squeeze(1)
    return total


@pytest.mark.parametrize("net,spec", [("alex", _ALEX), ("vgg", _VGG)])
def test_lpips_parity_vs_torch_impl(net, spec):
    rng = np.random.default_rng(0)
    state = _random_state(spec, rng)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    want = _torch_lpips(torch.tensor(a).permute(0, 3, 1, 2),
                        torch.tensor(b).permute(0, 3, 1, 2),
                        state, spec).numpy()

    params = convert_lpips_torch(state, net=net)
    got = np.asarray(LPIPS(net=net).apply(params, a, b))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_lpips_package_key_naming():
    """The lpips pip package saves backbone keys as net.sliceK.N.*; the
    converter must accept that naming too."""
    rng = np.random.default_rng(1)
    state = _random_state(_ALEX, rng)
    renamed = {}
    slice_of = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}
    for k, v in state.items():
        if k.startswith("features."):
            ti = int(k.split(".")[1])
            renamed[f"net.slice{slice_of[ti]}.{ti}." + k.split(".")[2]] = v
        else:
            renamed[k] = v
    p1 = convert_lpips_torch(state, net="alex")
    p2 = convert_lpips_torch(renamed, net="alex")
    for a, b in zip(*(map(lambda t: np.asarray(t),
                          (x for x in __import__("jax").tree.leaves(p)))
                      for p in (p1, p2))):
        np.testing.assert_array_equal(a, b)


def test_lpips_distance_properties():
    rng = np.random.default_rng(2)
    state = _random_state(_ALEX, rng)
    params = convert_lpips_torch(state, net="alex")
    a = rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    d_same = lpips_distance(a, a, params)
    d_diff = lpips_distance(a, b, params)
    assert d_same.shape == (1,)
    assert float(d_same[0]) < 1e-6
    assert float(d_diff[0]) > float(d_same[0])
