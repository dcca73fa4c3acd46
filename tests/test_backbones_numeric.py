"""Numeric differentials for the vision backbones vs hand-built torch
reference blocks (torch is in-env; no pretrained weights are, so weights are
random and structure/semantics are what is being pinned).

What these tests pin that param-count fingerprints cannot:
  * ResNet v1.5 semantics — stride on the 3x3 conv, torch padding
    conventions (conv pad 3/1, maxpool pad 1), BN eps 1e-5
    (reference extract_image_features.py:27-41 / torchvision resnet152).
  * I3D Unit3D semantics — TF-style SAME padding (asymmetric, input-size
    dependent), Sonnet BatchNorm (beta-only, eps 1e-3), -inf padded SAME
    max-pool (reference utils/video_feature/i3d.py:32-91, 99-133).

A padding / stride-placement / BN-epsilon bug in features/backbones.py
fails these at 1e-5 while passing every count/shape fingerprint.
"""
from __future__ import annotations

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tvretrieval_tpu.features.backbones import (
    InceptionMixed,
    ResNet152,
    Unit3D,
    _max_pool3d_same,
    torchvision_resnet152_to_flax,
)

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# torch reference blocks (hand-built to torchvision / TF-SAME semantics)
# ---------------------------------------------------------------------------


class TorchBottleneck(tnn.Module):
    """torchvision.models.resnet.Bottleneck, v1.5: stride on conv2 (3x3)."""

    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes, eps=1e-5)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes, eps=1e-5)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4, eps=1e-5)
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4, eps=1e-5))
        else:
            self.downsample = None

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + identity)


class TorchMiniResNet(tnn.Module):
    """Reduced-depth torchvision-layout ResNet (same stem / stage / pool
    semantics as resnet152, block_counts configurable)."""

    def __init__(self, block_counts):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64, eps=1e-5)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        inplanes, planes = 64, 64
        for stage, n_blocks in enumerate(block_counts):
            blocks = []
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                blocks.append(TorchBottleneck(inplanes, planes, stride,
                                              downsample=(b == 0)))
                inplanes = planes * 4
            setattr(self, f"layer{stage + 1}", tnn.Sequential(*blocks))
            planes *= 2

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
        return x.mean(dim=(2, 3))


def _tf_same_pads(sizes, kernel, stride):
    """TF-SAME per-dim (begin, end) pads: total = max((ceil(n/s)-1)*s+k-n, 0)."""
    pads = []
    for n, k, s in zip(sizes, kernel, stride):
        out = -(-n // s)
        total = max((out - 1) * s + k - n, 0)
        pads.append((total // 2, total - total // 2))
    return pads


class TorchUnit3D(tnn.Module):
    """Reference Unit3D (i3d.py:32-91): Conv3D TF-SAME no-bias + Sonnet
    BatchNorm (beta-only, eps 1e-3) + ReLU."""

    def __init__(self, in_ch, out_ch, kernel=(1, 1, 1), stride=(1, 1, 1)):
        super().__init__()
        self.kernel, self.stride = kernel, stride
        self.conv3d = tnn.Conv3d(in_ch, out_ch, kernel, stride=stride,
                                 padding=0, bias=False)
        self.bn = tnn.BatchNorm3d(out_ch, eps=1e-3)
        with torch.no_grad():
            self.bn.weight.fill_(1.0)  # Sonnet default: no scale

    def forward(self, x):
        pads = _tf_same_pads(x.shape[2:], self.kernel, self.stride)
        # F.pad takes (W_begin, W_end, H..., T...) — reverse dim order
        flat = [p for pair in reversed(pads) for p in pair]
        return F.relu(self.bn(self.conv3d(F.pad(x, flat))))


def torch_maxpool3d_same(x, window, stride):
    pads = _tf_same_pads(x.shape[2:], window, stride)
    flat = [p for pair in reversed(pads) for p in pair]
    x = F.pad(x, flat, value=float("-inf"))
    return F.max_pool3d(x, window, stride=stride)


class TorchMixed(tnn.Module):
    """Reference Mixed block (i3d.py:194-219): 4 branches, channel concat."""

    def __init__(self, in_ch, b0, b1, b2, b3):
        super().__init__()
        self.b0_1x1 = TorchUnit3D(in_ch, b0)
        self.b1_1x1 = TorchUnit3D(in_ch, b1[0])
        self.b1_3x3 = TorchUnit3D(b1[0], b1[1], (3, 3, 3))
        self.b2_1x1 = TorchUnit3D(in_ch, b2[0])
        self.b2_3x3 = TorchUnit3D(b2[0], b2[1], (3, 3, 3))
        self.b3_1x1 = TorchUnit3D(in_ch, b3)

    def forward(self, x):
        br0 = self.b0_1x1(x)
        br1 = self.b1_3x3(self.b1_1x1(x))
        br2 = self.b2_3x3(self.b2_1x1(x))
        br3 = self.b3_1x1(torch_maxpool3d_same(x, (3, 3, 3), (1, 1, 1)))
        return torch.cat([br0, br1, br2, br3], dim=1)


def _randomize_bn_stats(module, rng):
    """Give BN layers non-trivial running stats + affine params (fresh init
    is mean 0 / var 1 / weight 1, which hides eps and mean/var wiring)."""
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.normal(0, 0.3, m.running_mean.shape).astype("f4")))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, m.running_var.shape).astype("f4")))
                m.bias.copy_(torch.from_numpy(
                    rng.normal(0, 0.1, m.bias.shape).astype("f4")))
                if isinstance(m, tnn.BatchNorm2d):  # I3D BN keeps weight=1
                    m.weight.copy_(torch.from_numpy(
                        rng.uniform(0.8, 1.2, m.weight.shape).astype("f4")))


# ---------------------------------------------------------------------------
# ResNet differentials
# ---------------------------------------------------------------------------


def test_resnet_forward_matches_torch_reference():
    """Reduced-depth net, weights copied through the REAL adapter
    (torchvision state_dict -> flax), odd input size to exercise padding."""
    counts = (1, 1, 1, 1)
    rng = np.random.default_rng(0)
    tnet = TorchMiniResNet(counts).eval()
    _randomize_bn_stats(tnet, rng)

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = torchvision_resnet152_to_flax(sd, block_counts=counts)

    x = rng.normal(0, 1, (2, 67, 73, 3)).astype("f4")
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(ResNet152(block_counts=counts).apply(variables, x))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_bottleneck_block_matches_torch(stride):
    """Block-level v1.5 differential: the stride lives on the 3x3 conv and
    the downsample path — a v1 (stride-on-1x1) implementation fails this."""
    from tvretrieval_tpu.features.backbones import Bottleneck

    rng = np.random.default_rng(1)
    tb = TorchBottleneck(64, 32, stride=stride, downsample=True).eval()
    _randomize_bn_stats(tb, rng)

    sd = {f"layer1.0.{k}": v.detach().numpy()
          for k, v in tb.state_dict().items()}
    sd["conv1.weight"] = np.zeros((64, 3, 7, 7), "f4")  # unused stem slots
    for k in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{k}"] = (np.ones(64, "f4") if "var" in k or k == "weight"
                          else np.zeros(64, "f4"))
    variables = torchvision_resnet152_to_flax(sd, block_counts=(1,))
    block_vars = {
        "params": variables["params"]["layer1_0"],
        "batch_stats": variables["batch_stats"]["layer1_0"]}

    x = rng.normal(0, 1, (2, 13, 17, 64)).astype("f4")
    with torch.no_grad():
        ref = tb(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(Bottleneck(planes=32, stride=stride, downsample=True)
                     .apply(block_vars, x))
    np.testing.assert_allclose(out, ref.transpose(0, 2, 3, 1),
                               atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# I3D differentials
# ---------------------------------------------------------------------------


def _copy_unit3d(tunit: TorchUnit3D):
    """torch Unit3D weights -> flax Unit3D variables (conv (O,I,t,h,w) ->
    (t,h,w,I,O); Sonnet BN: beta only + running stats)."""
    return {
        "params": {
            "conv3d": {"kernel": tunit.conv3d.weight.detach().numpy()
                       .transpose(2, 3, 4, 1, 0)},
            "bn": {"bias": tunit.bn.bias.detach().numpy()},
        },
        "batch_stats": {
            "bn": {"mean": tunit.bn.running_mean.numpy(),
                   "var": tunit.bn.running_var.numpy()},
        },
    }


@pytest.mark.parametrize("kernel,stride", [
    ((7, 7, 7), (2, 2, 2)),   # stem conv: asymmetric TF-SAME pads
    ((3, 3, 3), (1, 1, 1)),
    ((1, 1, 1), (1, 1, 1)),
])
def test_unit3d_matches_torch_tf_same(kernel, stride):
    rng = np.random.default_rng(2)
    tunit = TorchUnit3D(3, 8, kernel, stride).eval()
    _randomize_bn_stats(tunit, rng)
    variables = _copy_unit3d(tunit)

    # odd sizes so TF-SAME pads are asymmetric under stride 2
    x = rng.normal(0, 1, (2, 9, 13, 11, 3)).astype("f4")
    with torch.no_grad():
        ref = tunit(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    out = np.asarray(Unit3D(8, kernel, stride).apply(variables, x))
    np.testing.assert_allclose(out, ref.transpose(0, 2, 3, 4, 1),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("window,stride", [
    ((1, 3, 3), (1, 2, 2)),   # MaxPool3d_2a/3a
    ((3, 3, 3), (2, 2, 2)),   # MaxPool3d_4a
    ((2, 2, 2), (2, 2, 2)),   # MaxPool3d_5a
])
def test_maxpool3d_same_matches_torch(window, stride):
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (2, 9, 13, 11, 4)).astype("f4")
    ref = torch_maxpool3d_same(
        torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), window, stride).numpy()
    out = np.asarray(_max_pool3d_same(x, window, stride))
    np.testing.assert_allclose(out, ref.transpose(0, 2, 3, 4, 1),
                               atol=0, rtol=0)  # max-pool is exact


def test_inception_mixed_matches_torch():
    """Full Mixed block (Mixed_3b widths) with copied weights."""
    spec = (64, (96, 128), (16, 32), 32)
    rng = np.random.default_rng(4)
    tmix = TorchMixed(16, *spec).eval()
    _randomize_bn_stats(tmix, rng)

    params, stats = {}, {}
    for name in ("b0_1x1", "b1_1x1", "b1_3x3", "b2_1x1", "b2_3x3", "b3_1x1"):
        v = _copy_unit3d(getattr(tmix, name))
        params[name] = v["params"]
        stats[name] = v["batch_stats"]
    variables = {"params": params, "batch_stats": stats}

    x = rng.normal(0, 1, (1, 5, 9, 7, 16)).astype("f4")
    with torch.no_grad():
        ref = tmix(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    out = np.asarray(InceptionMixed(*spec).apply(variables, x))
    np.testing.assert_allclose(out, ref.transpose(0, 2, 3, 4, 1),
                               atol=1e-5, rtol=1e-5)
