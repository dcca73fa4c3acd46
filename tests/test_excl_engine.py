"""ExCL inference engines on a synthetic world (CPU)."""
import json

import jax
import numpy as np
import pytest

from tvretrieval_tpu.data.datasets import ExampleBuilder
from tvretrieval_tpu.data.synthetic import make_synthetic_world
from tvretrieval_tpu.models.excl import ExCL, ExCLConfig
from tvretrieval_tpu.retrieval.excl_engine import (
    excl_retrieve_svmr, excl_retrieve_vcmr_with_external_vr)


@pytest.fixture(scope="module")
def setup():
    world = make_synthetic_world(n_videos=6, n_queries=10, vid_dim=12,
                                 text_dim=8, max_clips=10, seed=9)
    builder = ExampleBuilder(
        query_source=world.query_source, video_source=world.video_source,
        sub_source=world.sub_source, ctx_mode="video_sub",
        max_desc_l=12, max_ctx_l=10, clip_length=world.clip_length)
    cfg = ExCLConfig(ctx_mode="video_sub", visual_input_size=12,
                     sub_input_size=8, query_input_size=20, hidden_size=16,
                     drop=0.1)
    model = ExCL(cfg)
    b = builder.build_train_batch(world.annotations[:4])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **{k: np.asarray(v) for k, v in b.model_inputs().items()},
        deterministic=True)
    return world, builder, model, variables


def test_excl_svmr_engine(setup):
    world, builder, model, variables = setup
    res = excl_retrieve_svmr(model, variables, builder, world.corpus,
                             world.annotations[:5], clip_length=1.5,
                             query_bsz=4, min_pred_l=1, max_pred_l=8,
                             max_before_nms=20)
    assert len(res["SVMR"]) == 5
    entry = res["SVMR"][0]
    gt_vid = world.corpus.video2idx[world.annotations[0]["vid_name"]]
    assert all(p[0] == gt_vid for p in entry["predictions"])
    scores = [p[3] for p in entry["predictions"]]
    assert scores == sorted(scores, reverse=True)


def test_excl_vcmr_with_external_vr(setup, tmp_path):
    world, builder, model, variables = setup
    rows = world.annotations[:4]
    ext = {"video2idx": world.corpus.video2idx, "VR": []}
    for qi, r in enumerate(rows):
        vids = [world.corpus.video2idx[world.corpus.vid_names[(qi + j) % 6]]
                for j in range(3)]
        ext["VR"].append({"desc_id": r["desc_id"], "desc": "",
                          "predictions": [[v, 0, 0, 0.9 - 0.2 * j]
                                          for j, v in enumerate(vids)]})
    path = str(tmp_path / "vr.json")
    json.dump(ext, open(path, "w"))

    res = excl_retrieve_vcmr_with_external_vr(
        model, variables, builder, world.corpus, rows, path,
        clip_length=1.5, top_n_videos=3, min_pred_l=1, max_pred_l=8,
        top_n_per_video=5, max_before_nms=12)
    assert len(res["VCMR"]) == 4
    for qi, entry in enumerate(res["VCMR"]):
        allowed = {p[0] for p in ext["VR"][qi]["predictions"]}
        assert {p[0] for p in entry["predictions"]} <= allowed
        scores = [p[3] for p in entry["predictions"]]
        assert scores == sorted(scores, reverse=True)
        assert len(entry["predictions"]) <= 12
