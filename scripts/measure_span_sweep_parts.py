"""Decompose the span-sim stage (simsweep_cat) into timed parts at corpus
scale, to locate the gap between the measured stage (~31.5 ms at nq=1000,
28.8% MFU — round-4c ledger) and its ~11.25 ms MXU roofline.

Parts (all jitted separately, big arrays as ARGUMENTS):
  1. dot+sum        : corpus sweep einsum with a sum consumer (forces the
                      full dot; the sum's own cost is part 2)
  2. sum(SIM)       : full-matrix f32 read-reduce on a PRE-materialized
                      similarity — subtract from (1) for dot-only
  3. gather(SIM)    : take_along_axis of (Nq, V+1) video rows from the
                      pre-materialized (Nq, Nv, L) f32 similarity
  4. dot+gather     : the engine's actual fusion shape (sweep -> gather)
  5. dot+gather bf16: (4) with the similarity pinned bf16
                      (optimization_barrier) before the gather
  6. conv+softmax   : ConvSE + mask + softmax on pre-gathered (Nq, V+1, L)
  7. full stage     : model.merged_st_ed_scores_simgather_cat + softmax
                      (the round-4c ledger's span_sim_gather_conv_softmax)

Also prints AOT memory_analysis temp bytes for (4) — whether XLA
materializes the similarity, and at which dtype (the round-3 AOT finding
said it does not at nq=800; the stage time says something is off at 1000).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/measure_span_sweep_parts.py [nq=1000]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

N_VIDEOS = int(os.environ.get("PROFILE_N_VIDEOS", 21818))
N_CLIPS = int(os.environ.get("PROFILE_N_CLIPS", 100))
HIDDEN = 256
V = 100

if os.environ.get("PROFILE_CPU"):
    jax.config.update("jax_platforms", "cpu")


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.device_get(leaf[(0,) * leaf.ndim])


def time_stage(fn, n_warmup=2, n_runs=10):
    for _ in range(n_warmup):
        _sync(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n_runs):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / n_runs * 1e3


def main():
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    from tvretrieval_tpu.models.xml import XML, XMLConfig

    cfg = XMLConfig(ctx_mode="video_sub", visual_input_size=3074,
                    sub_input_size=770, query_input_size=768,
                    hidden_size=HIDDEN, n_heads=4, max_ctx_l=N_CLIPS,
                    max_desc_l=30)
    model = XML(cfg)
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    dummy = dict(
        query_feat=jnp.zeros((2, 30, 768)), query_mask=jnp.ones((2, 30)),
        video_feat=jnp.zeros((2, N_CLIPS, 3074)),
        video_mask=jnp.ones((2, N_CLIPS)),
        sub_feat=jnp.zeros((2, N_CLIPS, 770)), sub_mask=jnp.ones((2, N_CLIPS)),
        st_ed_indices=jnp.zeros((2, 2), jnp.int32))
    variables = model.init({"params": ks[0], "dropout": ks[1],
                            "negatives": ks[2]}, **dummy, deterministic=True)

    dt = jnp.bfloat16
    feat2_cat = jax.random.normal(ks[3], (N_VIDEOS, N_CLIPS, 2 * HIDDEN), dt)
    mask = jnp.ones((N_VIDEOS, N_CLIPS), jnp.float32)
    # stand-ins for the encode outputs (vq/sq before video/sub_query_linear)
    vq = jax.random.normal(ks[4], (nq, HIDDEN), jnp.float32)
    sq = jax.random.normal(ks[5], (nq, HIDDEN), jnp.float32)
    qcat = jax.random.normal(ks[6], (nq, 2 * HIDDEN), jnp.float32)
    gather_idx = jax.random.randint(ks[7], (nq, V + 1), 0, N_VIDEOS)

    flat2 = feat2_cat.reshape(N_VIDEOS * N_CLIPS, 2 * HIDDEN)

    # --- (1) dot + sum ------------------------------------------------------
    @jax.jit
    def dot_sum(q, f):
        sim = jnp.einsum("qd,nd->qn", q.astype(f.dtype), f,
                         preferred_element_type=jnp.float32)
        return sim.sum()

    t1 = time_stage(lambda: dot_sum(qcat, flat2))
    print(f"{'1 dot+sum':28s} {t1:8.2f} ms", flush=True)
    flat2.delete()  # 2.23 GB duplicate of feat2_cat; only part 1 reads it
    del flat2

    # --- materialize SIM DIRECTLY IN 3D, in bf16 (4.06 GiB; 5.2 GiB in
    # the 100->128-padded layout). f32 OOM'd twice: flat-then-reshape held
    # two copies (4g queue), and even built 3D the part-3 gather forces a
    # full T(8,128) layout copy (copy.9.remat, 10.4 GiB) next to the
    # 8.15 GiB argument (4h queue). bf16 is also exactly what the
    # simsweep_cat_bf16 engine mode stores, so part 3 measures the real
    # candidate's gather.
    @jax.jit
    def dot_mat3(q, f3):
        sim = jnp.einsum("qd,nld->qnl", q.astype(f3.dtype), f3,
                         preferred_element_type=jnp.float32)
        return jax.lax.optimization_barrier(sim.astype(jnp.bfloat16))

    SIM3 = dot_mat3(qcat, feat2_cat)

    sum_fn = jax.jit(lambda s: jnp.sum(s.astype(jnp.float32)))
    t2 = time_stage(lambda: sum_fn(SIM3))
    print(f"{'2 sum(SIM3 bf16) read':28s} {t2:8.2f} ms   "
          f"(f32 read-reduce measured 14.37 ms => dot-only "
          f"~ {t1 - 14.37:.2f} ms at nq=1000)", flush=True)

    @jax.jit
    def gather_only(s3, gi):
        return jnp.take_along_axis(
            s3, gi[:, :, None], axis=1).astype(jnp.float32)

    t3 = time_stage(lambda: gather_only(SIM3, gather_idx))
    print(f"{'3 gather(SIM3 bf16) rows':28s} {t3:8.2f} ms", flush=True)

    SIM3.delete()
    del SIM3

    # --- (4) dot + gather (the engine fusion shape) --------------------------
    @jax.jit
    def dot_gather(q, f3, gi):
        sim = jnp.einsum("qd,nld->qnl", q.astype(f3.dtype), f3,
                         preferred_element_type=jnp.float32)
        return jnp.take_along_axis(sim, gi[:, :, None], axis=1)

    # KNOWN FAILURE at nq=1000 (replayed 3x, 4h/4i queues): XLA materializes
    # the f32 (Nq, Nv, L) sim for take_along_axis (8.15 GiB temp) PLUS a
    # T(8,128) layout copy (+2.28 GiB) -> RESOURCE_EXHAUSTED. Keep the part
    # for small nq; at bench scale only the bf16-store variant (part 5) and
    # the pad128 path (part 8) are materializable.
    try:
        t4 = time_stage(lambda: dot_gather(qcat, feat2_cat, gather_idx))
        print(f"{'4 dot+gather':28s} {t4:8.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001 — diagnostic only
        print(f"{'4 dot+gather':28s}    OOM/fail (known at nq>=800): "
              f"{str(e)[:120]}", flush=True)

    # AOT: does the similarity materialize, and how big are the temps?
    try:
        comp = dot_gather.lower(qcat, feat2_cat, gather_idx).compile()
        ma = comp.memory_analysis()
        print(f"   AOT temps {ma.temp_size_in_bytes / 2**30:.2f} GiB  "
              f"(output {ma.output_size_in_bytes / 2**20:.1f} MiB)",
              flush=True)
    except Exception as e:  # noqa: BLE001 — diagnostic only
        print(f"   AOT memory_analysis unavailable: {e}", flush=True)

    # --- (5) dot + pinned-bf16 store + gather --------------------------------
    @jax.jit
    def dot_gather_bf16(q, f3, gi):
        sim = jnp.einsum("qd,nld->qnl", q.astype(f3.dtype), f3,
                         preferred_element_type=jnp.float32)
        sim = jax.lax.optimization_barrier(sim.astype(jnp.bfloat16))
        return jnp.take_along_axis(
            sim, gi[:, :, None], axis=1).astype(jnp.float32)

    t5 = time_stage(lambda: dot_gather_bf16(qcat, feat2_cat, gather_idx))
    print(f"{'5 dot+bf16store+gather':28s} {t5:8.2f} ms", flush=True)

    # --- (6) conv + mask + softmax on pre-gathered rows ----------------------
    simg = jax.random.normal(ks[2], (nq, V + 1, N_CLIPS), jnp.float32)
    maskg = jnp.ones((nq, V + 1, N_CLIPS), jnp.float32)

    @jax.jit
    def conv_softmax(vars_, s, m):
        from tvretrieval_tpu.ops.masking import mask_logits
        st, ed = model.apply(vars_, s, method=XML._merged_span_conv)
        st, ed = mask_logits(st, m), mask_logits(ed, m)
        return (jax.nn.softmax(st.astype(jnp.float32), axis=-1),
                jax.nn.softmax(ed.astype(jnp.float32), axis=-1))

    t6 = time_stage(lambda: conv_softmax(variables, simg, maskg))
    print(f"{'6 conv+mask+softmax':28s} {t6:8.2f} ms", flush=True)

    # --- (7) the full stage (ledger comparison point) -------------------------
    @jax.jit
    def full_stage(vars_, vq_, sq_, f3, m, gi):
        st_l, ed_l = model.apply(vars_, vq_, sq_, f3, m, gi,
                                 method=XML.merged_st_ed_scores_simgather_cat)
        return (jax.nn.softmax(st_l.astype(jnp.float32), axis=-1),
                jax.nn.softmax(ed_l.astype(jnp.float32), axis=-1))

    t7 = time_stage(lambda: full_stage(variables, vq, sq, feat2_cat, mask,
                                       gather_idx))
    print(f"{'7 full stage':28s} {t7:8.2f} ms", flush=True)

    # --- (8) LANE-ALIGNED sweep: cache L padded to 128, sim stored bf16 ------
    # Hypothesis: the (Nq, Nv, L=100) f32 similarity cannot materialize
    # cheaply because the minor dim pads 100 -> 128 in layout (11.2 GiB at
    # nq=1000 — the round-3 AOT number), forcing XLA into a slow
    # non-materializing gather strategy. Padding the CACHE's clip axis to
    # 128 up front (+28% sweep FLOPs, +0.6 GB cache) makes the bf16
    # similarity layout-exact (5.6 GiB), so the store runs at HBM speed and
    # the top-V row gather is the fast second-minor-dim case.
    feat2_pad = jnp.pad(feat2_cat, ((0, 0), (0, 128 - N_CLIPS), (0, 0)))

    @jax.jit
    def dot_gather_pad128(q, f3, gi):
        sim = jnp.einsum("qd,nld->qnl", q.astype(f3.dtype), f3,
                         preferred_element_type=jnp.float32)
        sim = jax.lax.optimization_barrier(sim.astype(jnp.bfloat16))
        g = jnp.take_along_axis(sim, gi[:, :, None], axis=1)
        return g[:, :, :N_CLIPS].astype(jnp.float32)

    t8 = time_stage(lambda: dot_gather_pad128(qcat, feat2_pad, gather_idx))
    print(f"{'8 pad128 dot+bf16+gather':28s} {t8:8.2f} ms", flush=True)
    try:
        comp = dot_gather_pad128.lower(qcat, feat2_pad, gather_idx).compile()
        ma = comp.memory_analysis()
        print(f"   AOT temps {ma.temp_size_in_bytes / 2**30:.2f} GiB",
              flush=True)
    except Exception as e:  # noqa: BLE001 — diagnostic only
        print(f"   AOT memory_analysis unavailable: {e}", flush=True)

    print(f"parts: dot~{t1 - t2:.2f} gather~{t3:.2f} conv~{t6:.2f} | "
          f"dot+gather {t4:.2f} bf16 {t5:.2f} pad128 {t8:.2f} "
          f"vs full {t7:.2f}")


if __name__ == "__main__":
    main()
