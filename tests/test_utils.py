"""Utility-layer tests (io helpers, code snapshot, show names)."""
import os
import zipfile

import numpy as np

from tvretrieval_tpu.utils.io import (
    AverageMeter, count_params, dissect_by_lengths, get_show_name,
    l2_normalize, load_jsonl, make_code_zip, save_jsonl)


def test_l2_normalize(rng):
    x = rng.normal(size=(4, 8)).astype(np.float32)
    out = l2_normalize(x)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-3)


def test_jsonl_roundtrip(tmp_path):
    rows = [{"a": 1}, {"b": [1, 2]}]
    path = str(tmp_path / "x.jsonl")
    save_jsonl(rows, path)
    assert load_jsonl(path) == rows


def test_average_meter():
    m = AverageMeter()
    for v in (1.0, 3.0, 5.0):
        m.update(v)
    assert m.avg == 3.0 and m.min == 1.0 and m.max == 5.0 and m.count == 3


def test_dissect_by_lengths(rng):
    arr = rng.normal(size=(10, 2))
    parts = dissect_by_lengths(arr, [3, 7])
    assert parts[0].shape == (3, 2) and parts[1].shape == (7, 2)


def test_get_show_name():
    assert get_show_name("friends_s01e01_seg01") == "friends"
    assert get_show_name("grey_s02e03_seg05") == "grey"
    assert get_show_name("s01e02_seg02") == "bbt"


def test_count_params():
    import jax.numpy as jnp
    params = {"a": {"w": jnp.ones((3, 4)), "b": jnp.ones(4)}}
    assert count_params(params) == 16


def test_make_code_zip(tmp_path):
    out = str(tmp_path / "code.zip")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    make_code_zip(repo_root, out)
    with zipfile.ZipFile(out) as zf:
        names = zf.namelist()
    assert any(n.endswith("models/xml.py") for n in names)
    assert any(n.endswith("temporal_nms.cpp") for n in names)
    assert not any("__pycache__" in n for n in names)
