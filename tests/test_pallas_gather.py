"""The fused gather+similarity kernel must match the XLA gather+einsum path
(f32 tolerance in CPU interpret mode; on-TPU accuracy is strictly better
than the jitted XLA einsum — see ops/pallas_gather.py docstring)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvretrieval_tpu.ops.pallas_gather import gathered_similarity


@pytest.mark.parametrize("N,L,Nq,V1", [(17, 16, 5, 7), (40, 24, 9, 12)])
def test_gathered_similarity_matches_einsum(N, L, Nq, V1):
    D = 128
    rng = np.random.default_rng(N + Nq)
    vf2 = jnp.asarray(rng.normal(size=(N, L, D)).astype(np.float32))
    sf2 = jnp.asarray(rng.normal(size=(N, L, D)).astype(np.float32))
    vq = jnp.asarray(rng.normal(size=(Nq, D)).astype(np.float32))
    sq = jnp.asarray(rng.normal(size=(Nq, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (Nq, V1)).astype(np.int32))

    ref_v = jnp.einsum("qd,qvld->qvl", vq, vf2[idx],
                       preferred_element_type=jnp.float32)
    ref_s = jnp.einsum("qd,qvld->qvl", sq, sf2[idx],
                       preferred_element_type=jnp.float32)
    ref = (ref_v + ref_s) / 2
    got = gathered_similarity(vq, sq, vf2, sf2, idx, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gathered_similarity_alignment_guard():
    x = jnp.zeros((4, 10, 128))
    q = jnp.zeros((2, 128))
    with pytest.raises(ValueError):
        gathered_similarity(q, q, x, x, jnp.zeros((2, 3), jnp.int32),
                            interpret=True)
