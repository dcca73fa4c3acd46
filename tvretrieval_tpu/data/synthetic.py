"""Synthetic TVR-shaped worlds with a planted retrieval signal.

The real 33GB feature release (reference README.md:67) is not present in
this environment, so tests and benches run on synthetic fixtures shaped
exactly like the release: query features (n_tokens<=30, 768-d), subtitle
clip features (n_clips, 768-d), video clip features (n_clips, vid_dim).

Signal construction: each video has a random topic vector; each query has a
content vector. The GT video's clips carry a scaled copy of the query
content *inside the GT span only*, and a weaker copy everywhere in the GT
video, so (a) video retrieval and (b) span localization are both learnable
and an end-to-end train->inference->eval smoke test can assert real recall.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import numpy as np

from tvretrieval_tpu.data.datasets import CorpusIndex
from tvretrieval_tpu.data.features import MemoryFeatureSource


@dataclass
class SyntheticWorld:
    annotations: List[dict]           # TVR-format rows (desc_id, desc, vid_name, duration, ts, type)
    corpus: CorpusIndex
    query_source: MemoryFeatureSource
    video_source: MemoryFeatureSource
    sub_source: MemoryFeatureSource
    clip_length: float = 1.5


def make_synthetic_world(
    n_videos: int = 32,
    n_queries: int = 64,
    vid_dim: int = 64,
    text_dim: int = 32,
    max_clips: int = 24,
    clip_length: float = 1.5,
    signal: float = 2.0,
    noise: float = 1.0,
    seed: int = 0,
    query_dim: int = 0,
) -> SyntheticWorld:
    """query_dim=0 (legacy): query tokens live in the concatenated
    (text_dim + vid_dim) space. query_dim>0: queries live in their OWN
    space (e.g. RoBERTa's 768-d like the real release) and the planted
    signal reaches the video/subtitle spaces through fixed random linear
    maps — a learnable relationship at real TVR feature dimensions."""
    rng = np.random.default_rng(seed)
    vid_names = [f"syn_vid_{i:05d}" for i in range(n_videos)]
    n_clips = rng.integers(max(4, max_clips // 2), max_clips + 1, size=n_videos)
    durations = (n_clips * clip_length).astype(np.float64)

    topics = rng.normal(size=(n_videos, text_dim)).astype(np.float32)
    vid_topics = rng.normal(size=(n_videos, vid_dim)).astype(np.float32)
    if query_dim:
        # fixed projections query-space -> context spaces (scaled to keep
        # planted components ~unit variance)
        proj_v = (rng.normal(size=(query_dim, vid_dim))
                  / np.sqrt(query_dim)).astype(np.float32)
        proj_s = (rng.normal(size=(query_dim, text_dim))
                  / np.sqrt(query_dim)).astype(np.float32)

    video_feats: Dict[str, np.ndarray] = {}
    sub_feats: Dict[str, np.ndarray] = {}
    for vi, name in enumerate(vid_names):
        L = int(n_clips[vi])
        video_feats[name] = (vid_topics[vi][None, :]
                             + noise * rng.normal(size=(L, vid_dim))).astype(np.float32)
        sub_feats[name] = (topics[vi][None, :]
                           + noise * rng.normal(size=(L, text_dim))).astype(np.float32)

    annotations: List[dict] = []
    query_feats: Dict[str, np.ndarray] = {}
    for qi in range(n_queries):
        vi = int(rng.integers(n_videos))
        L = int(n_clips[vi])
        st_clip = int(rng.integers(0, max(L - 2, 1)))
        ed_clip = int(rng.integers(st_clip + 1, min(st_clip + 8, L) + 1))
        if query_dim:
            content_q = rng.normal(size=(query_dim,)).astype(np.float32)
            content = content_q @ proj_s
            vid_content = content_q @ proj_v
            q_center = content_q
        else:
            content = rng.normal(size=(text_dim,)).astype(np.float32)
            vid_content = rng.normal(size=(vid_dim,)).astype(np.float32)
            q_center = np.concatenate([content, vid_content])

        # plant: strong inside the span, weak across the whole GT video
        video_feats[vid_names[vi]][st_clip:ed_clip] += signal * vid_content
        video_feats[vid_names[vi]] += 0.3 * signal * vid_content
        sub_feats[vid_names[vi]][st_clip:ed_clip] += signal * content
        sub_feats[vid_names[vi]] += 0.3 * signal * content

        n_tokens = int(rng.integers(5, 20))
        q = (q_center[None, :]
             + 0.5 * rng.normal(size=(n_tokens, len(q_center)))).astype(np.float32)
        desc_id = 90000 + qi
        query_feats[str(desc_id)] = q
        annotations.append({
            "desc_id": desc_id,
            "desc": f"synthetic query {qi}",
            "vid_name": vid_names[vi],
            "duration": float(durations[vi]),
            "ts": [st_clip * clip_length, ed_clip * clip_length],
            "type": ["v", "t", "vt"][qi % 3],
        })

    corpus = CorpusIndex(
        vid_names=vid_names,
        durations=[float(d) for d in durations],
        video2idx={v: i for i, v in enumerate(vid_names)},
    )
    return SyntheticWorld(
        annotations=annotations,
        corpus=corpus,
        query_source=MemoryFeatureSource(query_feats),
        video_source=MemoryFeatureSource(video_feats),
        sub_source=MemoryFeatureSource(sub_feats),
        clip_length=clip_length,
    )
