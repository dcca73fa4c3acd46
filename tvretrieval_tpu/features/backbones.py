"""In-repo vision backbones for the L0 feature pipelines (flax, inference).

The reference extracts frame features with torchvision ResNet-152 pool5
(utils/video_feature/extract_image_features.py:27-41, 2048-d) and clip
features with the Kinetics I3D RGB network (utils/video_feature/i3d.py:28-733,
TF1/Sonnet, 1024-d "avg_pool3d" endpoint — extract_i3d_features.py:207-208).
These are faithful TPU-native re-implementations of both architectures:

  * ``ResNet152``: torchvision-layout ResNet v1.5 (bottleneck counts
    [3, 8, 36, 3], stride on the 3x3 conv, explicit torch-style padding),
    returning the 2048-d global-average pool5 vector.
  * ``InceptionI3d``: the Inception-v1 3D inflation with the exact Unit3D
    stack and Mixed_3b..Mixed_5c branch widths of the reference, returning
    the 1024-d spatio-temporal average ("avg_pool3d" endpoint).

Both run inference-style (BatchNorm running averages). Pretrained weights
are not shipped in this zero-egress environment; ``*_param_adapters`` below
document the exact parameter naming so released torchvision / TF kinetics-i3d
checkpoints map 1:1, and tests pin the architectures with parameter-count
and endpoint-shape fingerprints (tests/test_backbones.py).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# ResNet-152 (reference extract_image_features.py)
# ---------------------------------------------------------------------------


class Bottleneck(nn.Module):
    """torchvision Bottleneck (v1.5: stride on the 3x3 conv)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bn = lambda name: nn.BatchNorm(use_running_average=True, momentum=0.9,
                                       epsilon=1e-5, dtype=self.dtype, name=name)
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = bn("bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet152(nn.Module):
    """(B, H, W, 3) float images -> (B, 2048) pool5 features.

    Layer layout identical to torchvision.models.resnet152 minus the final
    fc (reference removes it, extract_image_features.py:31-38). Inputs are
    expected ImageNet-normalized like the reference
    (IMAGENET_NORMALIZATION_PARAMS, :21-24).
    """

    block_counts: Sequence[int] = (3, 8, 36, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes = 64
        for stage, n_blocks in enumerate(self.block_counts):
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = Bottleneck(planes=planes, stride=stride,
                               downsample=(b == 0), dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(x)
            planes *= 2
        return jnp.mean(x, axis=(1, 2))                    # pool5: (B, 2048)


# ---------------------------------------------------------------------------
# Inception I3D (reference i3d.py)
# ---------------------------------------------------------------------------


class Unit3D(nn.Module):
    """Conv3D (no bias, SAME) + BatchNorm (beta only, like Sonnet's default
    scale=False) + ReLU (reference i3d.py:32-91)."""

    channels: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.channels, self.kernel, strides=self.stride,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv3d")(x)
        x = nn.BatchNorm(use_running_average=True, use_scale=False,
                         momentum=0.999, epsilon=1e-3, dtype=self.dtype,
                         name="bn")(x)
        return nn.relu(x)


def _max_pool3d_same(x, window, strides):
    return nn.max_pool(x, window, strides=strides, padding="SAME")


class InceptionMixed(nn.Module):
    """One Inception branch block: 1x1 / 1x1->3x3 / 1x1->3x3 / pool->1x1
    (reference i3d.py:194-219 and siblings)."""

    b0: int
    b1: Tuple[int, int]
    b2: Tuple[int, int]
    b3: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        u = lambda ch, k, name: Unit3D(ch, k, dtype=self.dtype, name=name)
        k1, k3 = (1, 1, 1), (3, 3, 3)
        br0 = u(self.b0, k1, "b0_1x1")(x)
        br1 = u(self.b1[1], k3, "b1_3x3")(u(self.b1[0], k1, "b1_1x1")(x))
        br2 = u(self.b2[1], k3, "b2_3x3")(u(self.b2[0], k1, "b2_1x1")(x))
        br3 = u(self.b3, k1, "b3_1x1")(
            _max_pool3d_same(x, (3, 3, 3), (1, 1, 1)))
        return jnp.concatenate([br0, br1, br2, br3], axis=-1)


# (b0, (b1a, b1b), (b2a, b2b), b3) per Mixed block — reference i3d.py:194-455
I3D_MIXED_SPECS = {
    "Mixed_3b": (64, (96, 128), (16, 32), 32),     # -> 256
    "Mixed_3c": (128, (128, 192), (32, 96), 64),   # -> 480
    "Mixed_4b": (192, (96, 208), (16, 48), 64),    # -> 512
    "Mixed_4c": (160, (112, 224), (24, 64), 64),   # -> 512
    "Mixed_4d": (128, (128, 256), (24, 64), 64),   # -> 512
    "Mixed_4e": (112, (144, 288), (32, 64), 64),   # -> 528
    "Mixed_4f": (256, (160, 320), (32, 128), 128), # -> 832
    "Mixed_5b": (256, (160, 320), (32, 128), 128), # -> 832
    "Mixed_5c": (384, (192, 384), (48, 128), 128), # -> 1024
}


class InceptionI3d(nn.Module):
    """(B, T, H, W, 3) RGB clips -> (B, 1024) avg_pool3d features.

    The reference extracts the "avg_pool3d" endpoint (global average over
    the remaining T' x 7 x 7 grid before the logits conv,
    extract_i3d_features.py:207-208); num_classes/logits are not needed for
    feature extraction and are intentionally omitted.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), dt, name="Conv3d_1a_7x7")(x)
        x = _max_pool3d_same(x, (1, 3, 3), (1, 2, 2))      # MaxPool3d_2a_3x3
        x = Unit3D(64, (1, 1, 1), dtype=dt, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), dtype=dt, name="Conv3d_2c_3x3")(x)
        x = _max_pool3d_same(x, (1, 3, 3), (1, 2, 2))      # MaxPool3d_3a_3x3
        x = InceptionMixed(*I3D_MIXED_SPECS["Mixed_3b"], dt, name="Mixed_3b")(x)
        x = InceptionMixed(*I3D_MIXED_SPECS["Mixed_3c"], dt, name="Mixed_3c")(x)
        x = _max_pool3d_same(x, (3, 3, 3), (2, 2, 2))      # MaxPool3d_4a_3x3
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = InceptionMixed(*I3D_MIXED_SPECS[name], dt, name=name)(x)
        x = _max_pool3d_same(x, (2, 2, 2), (2, 2, 2))      # MaxPool3d_5a_2x2
        x = InceptionMixed(*I3D_MIXED_SPECS["Mixed_5b"], dt, name="Mixed_5b")(x)
        x = InceptionMixed(*I3D_MIXED_SPECS["Mixed_5c"], dt, name="Mixed_5c")(x)
        # avg_pool3d endpoint: VALID average over (T', 7, 7) == global mean
        return jnp.mean(x, axis=(1, 2, 3))                 # (B, 1024)


# ---------------------------------------------------------------------------
# Checkpoint adapters (real released weights; no weights ship in this env)
# ---------------------------------------------------------------------------


def torchvision_resnet152_to_flax(state_dict,
                                  block_counts=(3, 8, 36, 3)) -> dict:
    """Map a torchvision resnet152 state_dict (numpy arrays or torch tensors
    with .numpy()) onto ResNet152 variables: {'params': ..., 'batch_stats': ...}.

    Naming: torch ``layerS.B.convN.weight`` (O,I,kh,kw) -> flax
    ``layer{S}_{B}/convN.kernel`` (kh,kw,I,O); ``bnN.{weight,bias}`` ->
    ``bnN.{scale,bias}``; ``bnN.running_{mean,var}`` -> batch_stats;
    ``layerS.0.downsample.{0,1}`` -> ``downsample_{conv,bn}``.

    block_counts: stage depths — (3, 8, 36, 3) is resnet152; smaller counts
    let tests run reduced-depth nets through the same mapping
    (tests/test_backbones.py numeric differentials vs hand-built torch).
    """
    import numpy as np

    def arr(v):
        return np.asarray(v.numpy() if hasattr(v, "numpy") else v)

    params: dict = {}
    stats: dict = {}

    def put(tree, path, val):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(val)

    def conv(torch_key, flax_path):
        put(params, flax_path + ("kernel",),
            arr(state_dict[torch_key]).transpose(2, 3, 1, 0))

    def bn(torch_prefix, flax_path):
        put(params, flax_path + ("scale",), arr(state_dict[torch_prefix + ".weight"]))
        put(params, flax_path + ("bias",), arr(state_dict[torch_prefix + ".bias"]))
        put(stats, flax_path + ("mean",), arr(state_dict[torch_prefix + ".running_mean"]))
        put(stats, flax_path + ("var",), arr(state_dict[torch_prefix + ".running_var"]))

    conv("conv1.weight", ("conv1",))
    bn("bn1", ("bn1",))
    for s, n_blocks in enumerate(block_counts):
        for b in range(n_blocks):
            tp, fp = f"layer{s + 1}.{b}", f"layer{s + 1}_{b}"
            for c in ("conv1", "conv2", "conv3"):
                conv(f"{tp}.{c}.weight", (fp, c))
            for bnn in ("bn1", "bn2", "bn3"):
                bn(f"{tp}.{bnn}", (fp, bnn))
            if b == 0:
                conv(f"{tp}.downsample.0.weight", (fp, "downsample_conv"))
                bn(f"{tp}.downsample.1", (fp, "downsample_bn"))
    return {"params": params, "batch_stats": stats}


def tf_i3d_variable_map() -> dict:
    """Documented mapping from the released kinetics-i3d TF checkpoint
    variable names (RGB/inception_i3d/<block>/.../w etc.) to this module's
    flax paths — e.g. ``Mixed_3b/Branch_1/Conv3d_0b_3x3/conv_3d/w`` ->
    ``Mixed_3b/b1_3x3/conv3d.kernel`` (TF kernels are already
    (t, h, w, in, out), no transpose), ``.../batch_norm/beta`` ->
    ``.../bn.bias``, moving_{mean,variance} -> batch_stats.
    """
    branch_names = {"b0_1x1": "Branch_0/Conv3d_0a_1x1",
                    "b1_1x1": "Branch_1/Conv3d_0a_1x1",
                    "b1_3x3": "Branch_1/Conv3d_0b_3x3",
                    "b2_1x1": "Branch_2/Conv3d_0a_1x1",
                    "b2_3x3": "Branch_2/Conv3d_0b_3x3",
                    "b3_1x1": "Branch_3/Conv3d_0b_1x1"}
    mapping = {}
    stem = ["Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3"]
    for name in stem:
        mapping[f"{name}/conv3d.kernel"] = f"RGB/inception_i3d/{name}/conv_3d/w"
        mapping[f"{name}/bn.bias"] = f"RGB/inception_i3d/{name}/batch_norm/beta"
    for block in I3D_MIXED_SPECS:
        for flax_b, tf_b in branch_names.items():
            mapping[f"{block}/{flax_b}/conv3d.kernel"] = \
                f"RGB/inception_i3d/{block}/{tf_b}/conv_3d/w"
            mapping[f"{block}/{flax_b}/bn.bias"] = \
                f"RGB/inception_i3d/{block}/{tf_b}/batch_norm/beta"
    return mapping
