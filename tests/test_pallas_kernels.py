"""Pallas kernel correctness (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from tvretrieval_tpu.ops.pallas_kernels import (
    fused_video_scores, fused_video_scores_xla)


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_fused_video_scores_matches_xla(rng):
    M, Nv, L, D, BV = 6, 16, 12, 32, 8
    q = jnp.asarray(_norm(rng.normal(size=(M, D))), jnp.float32)
    f = jnp.asarray(_norm(rng.normal(size=(Nv, L, D))), jnp.float32)
    mask = np.ones((Nv, L), np.float32)
    mask[3, 7:] = 0.0
    mask[-1] = 0.0  # fully padded video
    mask = jnp.asarray(mask)

    ours = fused_video_scores(q, f, mask, alpha=20.0, block_videos=BV,
                              interpret=True)
    ref = fused_video_scores_xla(q, f, mask, alpha=20.0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    assert float(jnp.abs(ours[:, -1]).max()) == 0.0  # padded video -> exp(-inf)=0

    # no-alpha variant
    ours2 = fused_video_scores(q, f, mask, alpha=None, block_videos=BV,
                               interpret=True)
    ref2 = fused_video_scores_xla(q, f, mask, alpha=None)
    np.testing.assert_allclose(np.asarray(ours2), np.asarray(ref2), rtol=1e-5)
