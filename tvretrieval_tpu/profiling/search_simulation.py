"""Corpus-scale search simulation: exact flat search vs IVF-style ANN.

Capability parity with reference baselines/profiling/
search_time_performance.py, which simulates MEE/XML video retrieval with a
FAISS ``IVF4096,Flat`` index (:97-133) and brute-force rerank timings. FAISS
is not available here; instead the IVF structure itself is implemented
TPU-native: k-means coarse quantizer (jit'd Lloyd iterations), bucketed
vectors padded to a static capacity, and a two-stage search (top-nprobe
centroids -> bucket matmuls -> global top-k) that runs entirely on device.

CLI:
    python -m tvretrieval_tpu.profiling.search_simulation \
        --n_videos 20000 --dim 256 --n_clusters 128 --nprobe 8
"""
from __future__ import annotations

import functools
import json
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(x: jnp.ndarray, k: int, iters: int = 10, seed: int = 0):
    """Lloyd's k-means on device; returns (centroids (k, D), assignments)."""
    n, d = x.shape
    init_idx = jax.random.choice(jax.random.PRNGKey(seed), n, (k,), replace=False)
    centroids = x[init_idx]

    def step(c, _):
        dists = (jnp.sum(x ** 2, 1)[:, None] - 2 * x @ c.T
                 + jnp.sum(c ** 2, 1)[None])
        assign = jnp.argmin(dists, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)       # (n, k)
        sums = onehot.T @ x                                      # (k, d)
        counts = onehot.sum(0)[:, None]
        new_c = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), c)
        return new_c, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    dists = (jnp.sum(x ** 2, 1)[:, None] - 2 * x @ centroids.T
             + jnp.sum(centroids ** 2, 1)[None])
    return centroids, jnp.argmin(dists, axis=1)


@dataclass
class IVFIndex:
    """Static-shape inverted-file index: buckets padded to one capacity."""

    centroids: jnp.ndarray    # (k, D)
    buckets: jnp.ndarray      # (k, cap, D)
    bucket_ids: jnp.ndarray   # (k, cap) int32, -1 for padding
    bucket_mask: jnp.ndarray  # (k, cap)

    @classmethod
    def build(cls, vectors: np.ndarray, n_clusters: int, iters: int = 10):
        x = jnp.asarray(vectors, jnp.float32)
        centroids, assign = kmeans(x, n_clusters, iters)
        assign = np.asarray(assign)
        counts = np.bincount(assign, minlength=n_clusters)
        cap = int(counts.max())
        k, d = n_clusters, vectors.shape[1]
        buckets = np.zeros((k, cap, d), np.float32)
        ids = np.full((k, cap), -1, np.int32)
        mask = np.zeros((k, cap), np.float32)
        fill = np.zeros(k, np.int32)
        for i, c in enumerate(assign):
            buckets[c, fill[c]] = vectors[i]
            ids[c, fill[c]] = i
            mask[c, fill[c]] = 1.0
            fill[c] += 1
        return cls(centroids=centroids, buckets=jnp.asarray(buckets),
                   bucket_ids=jnp.asarray(ids), bucket_mask=jnp.asarray(mask))

    @functools.partial(jax.jit, static_argnames=("self", "nprobe", "topk"))
    def _search(self, queries, nprobe: int, topk: int):
        c_scores = queries @ self.centroids.T                     # (Nq, k)
        _, probe = jax.lax.top_k(c_scores, nprobe)                # (Nq, nprobe)
        cand_vecs = self.buckets[probe]                           # (Nq, np, cap, D)
        cand_ids = self.bucket_ids[probe]                         # (Nq, np, cap)
        cand_mask = self.bucket_mask[probe]
        scores = jnp.einsum("qd,qpcd->qpc", queries, cand_vecs,
                            preferred_element_type=jnp.float32)
        scores = scores + (1.0 - cand_mask) * -1e10
        nq = queries.shape[0]
        flat = scores.reshape(nq, -1)
        top_scores, flat_idx = jax.lax.top_k(flat, topk)
        top_ids = jnp.take_along_axis(cand_ids.reshape(nq, -1), flat_idx, axis=1)
        return top_scores, top_ids

    def search(self, queries: jnp.ndarray, nprobe: int, topk: int):
        """Two-stage ANN search; returns (scores, global ids), (Nq, topk)."""
        return IVFIndex._search(self, queries, nprobe, topk)

    def __hash__(self):  # jit static self: identity-hash the index object
        return id(self)

    def __eq__(self, other):
        return self is other


def flat_search(queries: jnp.ndarray, vectors: jnp.ndarray, topk: int):
    scores = queries @ vectors.T
    return jax.lax.top_k(scores, topk)


def simulate(n_videos: int = 20000, n_queries: int = 100, dim: int = 256,
             n_clusters: int = 128, nprobe: int = 8, topk: int = 100,
             seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    vectors = rng.normal(size=(n_videos, dim)).astype(np.float32)
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
    queries = jnp.asarray(
        rng.normal(size=(n_queries, dim)).astype(np.float32))

    index = IVFIndex.build(vectors, n_clusters)
    vecs = jnp.asarray(vectors)

    def timed(fn):
        out = fn()
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])[:1]
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn()
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])[:1]
        return (time.perf_counter() - t0) / 5, out

    t_flat, (flat_scores, flat_ids) = timed(lambda: flat_search(queries, vecs, topk))
    t_ivf, (ivf_scores, ivf_ids) = timed(lambda: index.search(queries, nprobe, topk))

    flat_ids = np.asarray(flat_ids)
    ivf_ids = np.asarray(ivf_ids)
    recall = np.mean([
        len(set(flat_ids[q]) & set(ivf_ids[q])) / topk
        for q in range(n_queries)])
    return {
        "flat_search_ms": round(t_flat * 1e3, 3),
        "ivf_search_ms": round(t_ivf * 1e3, 3),
        "ivf_recall_at_topk": round(float(recall), 4),
        "n_videos": n_videos, "n_clusters": n_clusters, "nprobe": nprobe,
    }


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(description="corpus search simulation")
    parser.add_argument("--n_videos", type=int, default=20000)
    parser.add_argument("--n_queries", type=int, default=100)
    parser.add_argument("--dim", type=int, default=256)
    parser.add_argument("--n_clusters", type=int, default=128)
    parser.add_argument("--nprobe", type=int, default=8)
    args = parser.parse_args(argv)
    res = simulate(args.n_videos, args.n_queries, args.dim, args.n_clusters,
                   args.nprobe)
    print(json.dumps(res, indent=2))
    return res


if __name__ == "__main__":
    main()
