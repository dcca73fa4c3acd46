"""Offline feature-pipeline tests (pooling, alignment, srt, extraction)."""
import numpy as np

from tvretrieval_tpu.features.pooling import (
    align_lengths, frames_to_clips, normalize_and_concat, tokens_to_clip_features)
from tvretrieval_tpu.features.subtitles import parse_srt
from tvretrieval_tpu.features.video_split import build_video_duration_idx


def test_frames_to_clips_max_and_avg(rng):
    frames = rng.normal(size=(7, 4)).astype(np.float32)
    out = frames_to_clips(frames, 3, pool="max")
    assert out.shape == (3, 4)
    np.testing.assert_allclose(out[0], frames[:3].max(axis=0))
    np.testing.assert_allclose(out[2], frames[6:].max(axis=0))  # ragged tail
    avg = frames_to_clips(frames, 3, pool="avg")
    np.testing.assert_allclose(avg[1], frames[3:6].mean(axis=0), rtol=1e-6)


def test_align_lengths():
    x = np.arange(6, dtype=np.float32).reshape(3, 2)
    assert align_lengths(x, 2).shape == (2, 2)
    padded = align_lengths(x, 5)
    assert padded.shape == (5, 2)
    np.testing.assert_array_equal(padded[3], x[-1])


def test_normalize_and_concat(rng):
    a = rng.normal(size=(5, 3)).astype(np.float32)
    b = rng.normal(size=(7, 4)).astype(np.float32)  # longer -> aligned to 5
    out = normalize_and_concat([a, b])
    assert out.shape == (5, 7)
    np.testing.assert_allclose(np.linalg.norm(out[:, :3], axis=1), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.linalg.norm(out[:, 3:], axis=1), 1.0, atol=1e-3)


def test_tokens_to_clip_features(rng):
    toks = rng.normal(size=(10, 4)).astype(np.float32)
    spans = [(0.0, 1.5), (4.5, 7.5)]
    ranges = [(0, 4), (4, 10)]
    out = tokens_to_clip_features(toks, spans, ranges, n_clips=6, clip_length=1.5)
    assert out.shape == (6, 4)
    np.testing.assert_allclose(out[0], toks[0:4].max(axis=0))
    np.testing.assert_allclose(out[3], toks[4:10].max(axis=0))
    # silent clips 1-2 carry clip 0's feature forward
    np.testing.assert_allclose(out[1], out[0])
    np.testing.assert_allclose(out[4], out[3])


def test_parse_srt():
    srt = """1
00:00:01,000 --> 00:00:03,500
<i>Hello there.</i>

2
00:00:04,000 --> 00:00:06,000
General Kenobi!
Second line.
"""
    cues = parse_srt(srt)
    assert len(cues) == 2
    assert cues[0]["start"] == 1.0 and cues[0]["end"] == 3.5
    assert cues[0]["text"] == "Hello there."
    assert cues[1]["text"] == "General Kenobi! Second line."


def test_video_split_builder(tmp_path):
    out = build_video_duration_idx(
        {"train": ["a", "b"], "val": ["c"]},
        {"a": 10.0, "b": 20.0, "c": 30.0},
        out_path=str(tmp_path / "idx.json"))
    assert out["train"]["a"] == [10.0, 0]
    assert out["val"]["c"] == [30.0, 2]  # globally unique indices


def test_extract_token_features_roundtrip(tmp_path, rng):
    import h5py
    from tvretrieval_tpu.features.text_features import extract_token_features

    texts = {"101": "a b c", "102": "d e"}
    D, L = 8, 6

    def encode_fn(batch):
        ids = np.zeros((len(batch), L), np.int32)
        mask = np.zeros((len(batch), L), np.int32)
        for i, t in enumerate(batch):
            n = len(t.split()) + 2  # cls/sep
            mask[i, :n] = 1
        return ids, mask

    def embed_fn(ids, mask):
        return rng.normal(size=(ids.shape[0], L, D)).astype(np.float32)

    path = str(tmp_path / "q.h5")
    n = extract_token_features(texts, encode_fn, embed_fn, path, batch_size=1)
    assert n == 2
    with h5py.File(path) as h5:
        assert h5["101"].shape == (5, D)  # 3 words + cls/sep
        assert h5["102"].shape == (4, D)


def test_extract_clip_features_with_fake_backbone(tmp_path):
    import h5py
    from tvretrieval_tpu.features.video_features import extract_clip_features

    frames = {"vid_a": np.zeros((9, 4, 4, 3), np.uint8),
              "vid_b": np.zeros((5, 4, 4, 3), np.uint8)}

    def backbone(batch):
        return np.full((len(batch), 7), float(len(batch)), np.float32)

    path = str(tmp_path / "v.h5")
    extract_clip_features(frames, backbone, path, frames_per_clip=3,
                          batch_size=4)
    with h5py.File(path) as h5:
        assert h5["vid_a"].shape == (3, 7)
        assert h5["vid_b"].shape == (2, 7)
