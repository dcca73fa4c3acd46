"""Architecture fingerprints for the in-repo vision backbones.

No pretrained weights exist in this environment, so parity with the
reference architectures (torchvision resnet152 / kinetics-i3d) is pinned
structurally: exact trainable-parameter counts, endpoint shapes, the
checkpoint-adapter round trip, and end-to-end extraction wiring.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvretrieval_tpu.features.backbones import (
    I3D_MIXED_SPECS,
    InceptionI3d,
    ResNet152,
    tf_i3d_variable_map,
    torchvision_resnet152_to_flax,
)


def _n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def resnet_vars():
    model = ResNet152()
    return model, model.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 64, 3), jnp.float32))


def test_resnet152_param_count_matches_torchvision(resnet_vars):
    """torchvision resnet152 has 60,192,808 parameters; minus the removed
    1000-class fc (2048*1000 + 1000 — reference strips it,
    extract_image_features.py:31-38) the trunk is 58,143,808. BN running
    stats live in batch_stats, matching torch's non-parameter buffers."""
    _, variables = resnet_vars
    assert _n_params(variables["params"]) == 60_192_808 - (2048 * 1000 + 1000)


def test_resnet152_pool5_shape_and_stride_stack(resnet_vars):
    model, variables = resnet_vars
    out = model.apply(variables, jnp.zeros((2, 64, 64, 3)))
    assert out.shape == (2, 2048)


def test_resnet152_torch_adapter_roundtrip(resnet_vars):
    """Build a torchvision-style state_dict from flax params (inverse
    mapping) and check the adapter reconstructs the exact variables —
    pins the naming + kernel-transpose contract for real checkpoints."""
    _, variables = resnet_vars
    sd = {}

    def emit_conv(torch_key, kernel):
        sd[torch_key] = np.asarray(kernel).transpose(3, 2, 0, 1)

    def emit_bn(torch_prefix, pp, sp):
        sd[torch_prefix + ".weight"] = np.asarray(pp["scale"])
        sd[torch_prefix + ".bias"] = np.asarray(pp["bias"])
        sd[torch_prefix + ".running_mean"] = np.asarray(sp["mean"])
        sd[torch_prefix + ".running_var"] = np.asarray(sp["var"])

    p, s = variables["params"], variables["batch_stats"]
    emit_conv("conv1.weight", p["conv1"]["kernel"])
    emit_bn("bn1", p["bn1"], s["bn1"])
    for st, n_blocks in enumerate((3, 8, 36, 3)):
        for b in range(n_blocks):
            tp, fp = f"layer{st + 1}.{b}", f"layer{st + 1}_{b}"
            for c in ("conv1", "conv2", "conv3"):
                emit_conv(f"{tp}.{c}.weight", p[fp][c]["kernel"])
            for bn in ("bn1", "bn2", "bn3"):
                emit_bn(f"{tp}.{bn}", p[fp][bn], s[fp][bn])
            if b == 0:
                emit_conv(f"{tp}.downsample.0.weight",
                          p[fp]["downsample_conv"]["kernel"])
                emit_bn(f"{tp}.downsample.1", p[fp]["downsample_bn"],
                        s[fp]["downsample_bn"])

    rebuilt = torchvision_resnet152_to_flax(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(rebuilt)}
    assert len(flat_a) == len(flat_b)
    for k, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(flat_b[jax.tree_util.keystr(k)]),
                                      err_msg=jax.tree_util.keystr(k))


@pytest.fixture(scope="module")
def i3d_vars():
    model = InceptionI3d()
    return model, model.init(jax.random.PRNGKey(1),
                             jnp.zeros((1, 8, 64, 64, 3), jnp.float32))


def test_i3d_param_count_matches_spec(i3d_vars):
    """Closed-form conv-parameter count from the reference's Unit3D stack +
    Mixed specs (i3d.py:167-455; BN contributes beta only, Sonnet default
    scale=False); magnitude matches the public kinetics-i3d RGB model
    (~12.3M)."""
    _, variables = i3d_vars
    expected = 0
    chans = [(3, 64, 7 ** 3), (64, 64, 1), (64, 192, 27)]   # stem convs
    expected += sum(i * o * k + o for i, o, k in chans)      # conv + bn beta
    cin = 192
    for b0, (b1a, b1b), (b2a, b2b), b3 in I3D_MIXED_SPECS.values():
        units = [(cin, b0, 1), (cin, b1a, 1), (b1a, b1b, 27),
                 (cin, b2a, 1), (b2a, b2b, 27), (cin, b3, 1)]
        expected += sum(i * o * k + o for i, o, k in units)
        cin = b0 + b1b + b2b + b3
    assert cin == 1024
    got = _n_params(variables["params"])
    assert got == expected, (got, expected)
    assert 12_000_000 < got < 13_000_000          # public RGB I3D ballpark


def test_i3d_feature_shape(i3d_vars):
    model, variables = i3d_vars
    out = model.apply(variables, jnp.zeros((2, 9, 64, 64, 3)))
    assert out.shape == (2, 1024)


def test_i3d_tf_variable_map_covers_every_conv(i3d_vars):
    _, variables = i3d_vars
    mapping = tf_i3d_variable_map()
    # every conv kernel and bn bias in the flax tree has a TF source name
    n_units = 3 + 6 * len(I3D_MIXED_SPECS)
    assert len(mapping) == 2 * n_units
    for k in mapping.values():
        assert k.startswith("RGB/inception_i3d/")


def test_extraction_pipelines_run_with_in_repo_backbones(tmp_path):
    """extract_clip_features / extract_i3d_clip_features end-to-end with the
    in-repo backbones (random weights; mini ResNet for CPU speed)."""
    import h5py

    from tvretrieval_tpu.features.video_features import (
        extract_clip_features,
        extract_i3d_clip_features,
        make_i3d_clip_model,
        make_resnet152_frame_model,
    )

    rng = np.random.default_rng(0)
    videos = {f"v{i}": rng.integers(0, 255, (9, 32, 32, 3), np.uint8)
              for i in range(2)}

    frame_fn = make_resnet152_frame_model(block_counts=(1, 1, 1, 1))
    p1 = str(tmp_path / "frames.h5")
    extract_clip_features(videos, frame_fn, p1, frames_per_clip=3)
    with h5py.File(p1) as h5:
        assert h5["v0"].shape == (3, 2048)

    clip_fn = make_i3d_clip_model()
    p2 = str(tmp_path / "i3d.h5")
    extract_i3d_clip_features(videos, clip_fn, p2, frames_per_clip=4)
    with h5py.File(p2) as h5:
        assert h5["v0"].shape == (3, 1024)         # ceil(9 / 4)
