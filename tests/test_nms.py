"""Temporal NMS parity tests against the reference implementation."""
import importlib.util

import numpy as np

from tvretrieval_tpu.evaluation.nms import temporal_nms, apply_nms_to_vcmr


def _load_reference_nms():
    spec = importlib.util.spec_from_file_location(
        "reference_nms", "/root/reference/utils/temporal_nms.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_nms_single_prediction_passthrough():
    preds = [[0.0, 5.0, 1.0]]
    assert temporal_nms(preds, 0.5) == preds


def test_nms_suppresses_overlaps():
    preds = [
        [0.0, 10.0, 0.9],
        [1.0, 11.0, 0.8],   # IoU vs first ~ 9/11 > 0.5 -> suppressed
        [20.0, 30.0, 0.7],
    ]
    kept = temporal_nms(preds, 0.5)
    assert [row[:2] for row in kept] == [[0.0, 10.0], [20.0, 30.0]]


def test_nms_differential_vs_reference(rng):
    ref = _load_reference_nms()
    for use_native in (False, True):
        for _ in range(5):
            n = int(rng.integers(2, 60))
            sts = rng.uniform(0, 100, size=n)
            preds = [[float(st), float(st + rng.uniform(1, 20)), float(rng.uniform())]
                     for st in sts]
            ours = temporal_nms([list(p) for p in preds], 0.6, max_after_nms=25,
                                use_native=use_native)
            theirs = ref.temporal_non_maximum_suppression(
                [list(p) for p in preds], nms_threshold=0.6, max_after_nms=25)
            np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs),
                                       rtol=1e-5)


def test_vcmr_nms_regroups_and_sorts():
    entry = {"desc_id": 1, "desc": "q", "predictions": [
        [0, 0.0, 10.0, 0.9],
        [0, 1.0, 11.0, 0.8],   # suppressed within video 0
        [1, 0.0, 10.0, 0.85],
        [1, 50.0, 60.0, 0.2],
    ]}
    out = apply_nms_to_vcmr([entry], nms_thd=0.5)[0]["predictions"]
    assert out[0][0] == 0 and abs(out[0][3] - 0.9) < 1e-6
    assert out[1][0] == 1 and abs(out[1][3] - 0.85) < 1e-6
    assert len(out) == 3  # one suppressed
