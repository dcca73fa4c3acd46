"""Where do encode_query's 3.8 ms go at nq=1000? (VERDICT r4 item 7)

The FLOP budget says ~0.3 ms: input proj (1000x30, 768->256) ~11.8 GFLOP
dominates; the BertAttention layer and modular pooling are ~2 GFLOP more
(reference model_xml.py:291-295, 377-423). Times each prefix of the chain
separately plus dtype variants to answer dispatch- vs compute-bound.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_encode_query.py [qbsz=1000]
"""
import sys
import time

import jax
import jax.numpy as jnp


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.device_get(leaf[(0,) * leaf.ndim])


def time_fn(fn, *args, n_warmup=2, n_runs=20):
    for _ in range(n_warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(n_runs):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n_runs * 1e3


def main():
    qbsz = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    from tvretrieval_tpu.models.xml import XML, XMLConfig

    cfg = XMLConfig(ctx_mode="video_sub", visual_input_size=3074,
                    sub_input_size=770, query_input_size=768,
                    hidden_size=256, n_heads=4, max_ctx_l=100, max_desc_l=30)
    model = XML(cfg)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    dummy = dict(
        query_feat=jnp.zeros((2, 30, 768)), query_mask=jnp.ones((2, 30)),
        video_feat=jnp.zeros((2, 100, 3074)), video_mask=jnp.ones((2, 100)),
        sub_feat=jnp.zeros((2, 100, 770)), sub_mask=jnp.ones((2, 100)),
        st_ed_indices=jnp.zeros((2, 2), jnp.int32))
    variables = model.init({"params": ks[0], "dropout": ks[1],
                            "negatives": ks[2]}, **dummy, deterministic=True)
    qf = jax.random.normal(ks[3], (qbsz, 30, 768), jnp.float32)
    qm = jnp.ones((qbsz, 30), jnp.float32)

    import functools

    @functools.partial(jax.jit, static_argnames=("stage",))
    def run(vars_, qf, qm, stage: str):
        def inner(m):
            if stage == "proj":
                return m.query_input_proj(qf, deterministic=True)
            if stage == "proj_pe":
                x = m.query_input_proj(qf, deterministic=True)
                return m.query_pos_embed(x, deterministic=True)
            if stage == "proj_pe_enc":
                x = m.query_input_proj(qf, deterministic=True)
                x = m.query_pos_embed(x, deterministic=True)
                return m.query_encoder(x, qm, deterministic=True)
            if stage == "full":
                return m.encode_query(qf, qm)
            raise ValueError(stage)
        return XML(cfg).apply(vars_, qf, qm, method=lambda m, a, b: inner(m))

    # raw matmul reference: the chain's dominant dot at the same shape
    @jax.jit
    def raw_dot(a, w):
        return jnp.einsum("bld,dh->blh", a, w)
    w = jax.random.normal(ks[1], (768, 256), jnp.float32)

    print(f"qbsz={qbsz}", flush=True)
    t = time_fn(raw_dot, qf, w)
    print(f"raw (B*30,768)x(768,256) f32 dot      {t:6.2f} ms", flush=True)
    t = time_fn(raw_dot, qf.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    print(f"raw dot bf16                          {t:6.2f} ms", flush=True)
    for stage in ("proj", "proj_pe", "proj_pe_enc", "full"):
        t = time_fn(run, variables, qf, qm, stage)
        print(f"encode_query[{stage:12s}]             {t:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
