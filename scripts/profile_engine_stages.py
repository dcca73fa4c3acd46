"""Per-stage timings of the bench engine program (simsweep_cat + pallas).

Breaks the fused _score_query_batch into separately-jitted stages at bench
scale (21,818 videos x 100 clips, hidden 256, query batch from argv) so the
next optimization targets the real bottleneck. Stage boundaries force HBM
materialization that the fused program may avoid, so the per-stage sum is
an UPPER bound on the fused total — compare against the fused program
timing printed last.

NOTE: every stage jit takes the corpus caches as ARGUMENTS. Closing over
them captures 2.2GB of constants into the lowered program, and shipping
that through this environment's remote-compile relay reliably kills the
connection (broken pipe ~20 min in).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/profile_engine_stages.py [query_bsz=400]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

N_VIDEOS = int(os.environ.get("PROFILE_N_VIDEOS", 21818))
N_CLIPS = int(os.environ.get("PROFILE_N_CLIPS", 100))
HIDDEN = 256

if os.environ.get("PROFILE_CPU"):
    jax.config.update("jax_platforms", "cpu")


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.device_get(leaf[(0,) * leaf.ndim])


def time_stage(fn, n_warmup=2, n_runs=10):
    for _ in range(n_warmup):
        _sync(fn())
    # keep ONLY the latest output alive: dispatches still queue back-to-back
    # (async), but holding all n_runs result sets pushed the resident-cache
    # + temps total over HBM at qbsz=1000 (the round-4c RESOURCE_EXHAUSTED)
    t0 = time.perf_counter()
    out = None
    for _ in range(n_runs):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / n_runs * 1e3


def main():
    qbsz = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    from tvretrieval_tpu.models.xml import XML, XMLConfig
    from tvretrieval_tpu.ops.masking import mask_logits
    from tvretrieval_tpu.ops.pallas_score import (build_flat_feat1,
                                                  video_scores_pallas_flat)
    from tvretrieval_tpu.ops.span import (banded_topk_spans_grouped,
                                          banded_topk_spans_grouped_shift,
                                          banded_topk_spans_grouped_shift8,
                                          topk_from_block_max,
                                          topk_stable_blocked)
    from tvretrieval_tpu.retrieval.engine import RetrievalConfig, _score_query_batch

    cfg = XMLConfig(ctx_mode="video_sub", visual_input_size=3074,
                    sub_input_size=770, query_input_size=768,
                    hidden_size=HIDDEN, n_heads=4, max_ctx_l=N_CLIPS,
                    max_desc_l=30)
    model = XML(cfg)
    # PROFILE_PAD128=1: ledger of the round-4 SHIPPED config instead of the
    # r3 one — span_sim_pad_l=128 (lane-tile-exact cat cache; BENCH_NOTES
    # round 4i: +19.5% engine capture) + pallas_int8 video scores, with
    # bench.py's residency (bf16 flats deleted after int8 quantization —
    # the padded cat cache +0.6 GB plus the pad128 span-stage temps do not
    # fit next to the bf16 flats at qbsz=1000).
    profile_pad128 = bool(os.environ.get("PROFILE_PAD128"))
    # CPU smoke runs can't lower the Mosaic kernel — fused program falls
    # back to the einsum video-score mode there
    rcfg = RetrievalConfig(cache_dtype_str="bfloat16",
                           span_score_mode="simsweep_cat",
                           span_topk_mode="grouped_shift",
                           span_sim_pad_l=128 if profile_pad128 else 0,
                           video_score_mode=("einsum"
                                             if os.environ.get("PROFILE_CPU")
                                             else ("pallas_int8"
                                                   if profile_pad128
                                                   else "pallas")))
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
    norm = lambda x: x / (jnp.linalg.norm(
        x.astype(jnp.float32), axis=-1, keepdims=True) + 1e-12).astype(x.dtype)
    vf1 = norm(jax.random.normal(ks[3], (N_VIDEOS, N_CLIPS, HIDDEN), dt))
    sf1 = norm(jax.random.normal(ks[4], (N_VIDEOS, N_CLIPS, HIDDEN), dt))
    feat2_cat = jax.random.normal(ks[5], (N_VIDEOS, N_CLIPS, 2 * HIDDEN), dt)
    mask = jnp.ones((N_VIDEOS, N_CLIPS), jnp.float32)
    q_feat = jax.random.normal(ks[6], (qbsz, 30, 768), jnp.float32)
    q_mask = jnp.ones((qbsz, 30), jnp.float32)
    gt = jnp.zeros((qbsz,), jnp.int32)
    V = rcfg.max_vcmr_video

    # --- stage jits (big arrays are ARGUMENTS, never captured constants)
    @jax.jit
    def s_encode_q(vars_, qf, qm):
        return model.apply(vars_, qf, qm, method=XML.encode_query)

    vq, sq = s_encode_q(variables, q_feat, q_mask)
    normq = lambda q, feat: (q / (jnp.linalg.norm(q, axis=-1, keepdims=True)
                                  + 1e-12)).astype(feat.dtype)

    interp = bool(os.environ.get("PROFILE_CPU"))

    vf1_flat = build_flat_feat1(vf1, mask)
    sf1_flat = build_flat_feat1(sf1, mask)
    from tvretrieval_tpu.ops.pallas_score import (quantize_unit_i8,
                                                  video_scores_pallas_flat_i8)
    vf1_i8, sf1_i8 = quantize_unit_i8(vf1_flat), quantize_unit_i8(sf1_flat)
    NVP = vf1_flat.shape[0] // 104                      # flat-padded videos
    if profile_pad128:
        # bench residency: int8 flats only; cat cache lane-tile-exact
        vf1_flat.delete()
        sf1_flat.delete()
        vf1_flat = sf1_flat = None
        feat2_cat = jnp.pad(
            feat2_cat, ((0, 0), (0, rcfg.span_sim_pad_l - N_CLIPS), (0, 0)))
    # the einsum reference stage needs the (Nv, L, D) 3-D caches resident
    # (2.24 GB). Its number is documented (BENCH_NOTES r2/r3: ~46 ms at
    # 800); with the round-4 int8-flat span cache also resident the full
    # layout set risks OOM, so the stage is opt-in: PROFILE_EINSUM=1.
    profile_einsum = bool(os.environ.get("PROFILE_EINSUM"))
    # the CPU smoke's fused program runs video_score_mode="einsum" and needs
    # the 3-D caches regardless
    if not profile_einsum and rcfg.video_score_mode != "einsum":
        vf1.delete()
        sf1.delete()
        vf1 = sf1 = None

    @jax.jit
    def s_vscore_pallas(vq, sq, vf1_flat, sf1_flat):
        return video_scores_pallas_flat(
            normq(vq, vf1_flat).T, normq(sq, sf1_flat).T,
            vf1_flat, sf1_flat, n_videos=N_VIDEOS, interpret=interp)

    @jax.jit
    def s_vscore_i8(vq, sq, vf1_i8, sf1_i8):
        nrm = lambda q: q / (jnp.linalg.norm(q, axis=-1, keepdims=True)
                             + 1e-12)
        return video_scores_pallas_flat_i8(
            quantize_unit_i8(nrm(vq)).T, quantize_unit_i8(nrm(sq)).T,
            vf1_i8, sf1_i8, n_videos=N_VIDEOS, interpret=interp)

    @jax.jit
    def s_vscore_einsum(vq, sq, vf1, sf1, mask):
        def one(q, feat1_n):
            qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
            s = jnp.einsum("md,nld->mln", qn.astype(feat1_n.dtype), feat1_n,
                           preferred_element_type=jnp.float32)
            return mask_logits(s, mask.T[None]).max(axis=1)
        return (one(vq, vf1) + one(sq, sf1)) / 2

    q2c = (s_vscore_i8(vq, sq, vf1_i8, sf1_i8) if profile_pad128
           else s_vscore_pallas(vq, sq, vf1_flat, sf1_flat))

    @jax.jit
    def s_topv(q2c):
        return topk_stable_blocked(jnp.exp(rcfg.q2c_alpha * q2c), V)

    # round-4 fused video-score -> top-k: the kernel emits per-chunk block
    # maxima; topk_from_block_max selects top-V without re-reading the
    # full (Nq, Nv) matrix or the full-matrix exp (pre-exp semantics)
    from tvretrieval_tpu.ops.pallas_score import (
        video_scores_pallas_flat_bmax)

    @jax.jit
    def s_vscore_i8_fused_topk(vq, sq, vf1_i8, sf1_i8):
        nrm = lambda q: q / (jnp.linalg.norm(q, axis=-1, keepdims=True)
                             + 1e-12)
        scores_pad, bmax = video_scores_pallas_flat_bmax(
            quantize_unit_i8(nrm(vq)).T, quantize_unit_i8(nrm(sq)).T,
            vf1_i8, sf1_i8, n_videos=N_VIDEOS, interpret=interp)
        tq2c, tidx = topk_from_block_max(
            scores_pad, bmax, V, block=scores_pad.shape[1] // bmax.shape[1])
        return jnp.exp(rcfg.q2c_alpha * tq2c), tidx

    topv_scores, topv_idx = s_topv(q2c)
    gather_idx = jnp.concatenate([topv_idx, gt[:, None]], axis=1)

    @jax.jit
    def s_span_sim(vars_, vq, sq, feat2_cat, mask, gather_idx):
        st_l, ed_l = model.apply(vars_, vq, sq, feat2_cat, mask, gather_idx,
                                 method=XML.merged_st_ed_scores_simgather_cat)
        st = jax.nn.softmax(st_l.astype(jnp.float32), axis=-1)
        ed = jax.nn.softmax(ed_l.astype(jnp.float32), axis=-1)
        return st, ed

    st_probs, ed_probs = s_span_sim(variables, vq, sq, feat2_cat, mask,
                                    gather_idx)

    # round-4 fused int8 flat span sweep (sweep + gather + conv in one
    # Pallas-backed model method; the s32 dot never reaches HBM). Opt-in:
    # a measured corpus-scale NEGATIVE result (BENCH_NOTES round 4), and
    # its 1.4 GB cache + (Nq, Nv_pad, 128) bf16 similarity temp OOM'd the
    # qbsz=1000 ledger run next to the full resident layout set.
    profile_i8flat = bool(os.environ.get("PROFILE_I8FLAT"))
    if profile_i8flat:
        from tvretrieval_tpu.ops.pallas_score import build_flat_feat2_i8
        feat2_flat_i8, feat2_flat_scale = build_flat_feat2_i8(feat2_cat)
    else:
        feat2_flat_i8 = feat2_flat_scale = None

    @jax.jit
    def s_span_sim_i8flat(vars_, vq, sq, f8, fsc, mask, gather_idx):
        st_l, ed_l = model.apply(
            vars_, vq, sq, f8, fsc, mask, gather_idx, interpret=interp,
            method=XML.merged_st_ed_scores_pallas_cat_i8)
        st = jax.nn.softmax(st_l.astype(jnp.float32), axis=-1)
        ed = jax.nn.softmax(ed_l.astype(jnp.float32), axis=-1)
        return st, ed

    @jax.jit
    def s_topk_spans(st_probs, ed_probs, topv_scores):
        return banded_topk_spans_grouped(
            st_probs[:, :V], ed_probs[:, :V], topv_scores,
            rcfg.min_pred_l, rcfg.max_pred_l, rcfg.max_before_nms)

    @jax.jit
    def s_topk_spans_shift(st_probs, ed_probs, topv_scores):
        return banded_topk_spans_grouped_shift(
            st_probs[:, :V], ed_probs[:, :V], topv_scores,
            rcfg.min_pred_l, rcfg.max_pred_l, rcfg.max_before_nms)

    @jax.jit
    def s_topk_spans_shift8(st_probs, ed_probs, topv_scores):
        return banded_topk_spans_grouped_shift8(
            st_probs[:, :V], ed_probs[:, :V], topv_scores,
            rcfg.min_pred_l, rcfg.max_pred_l, rcfg.max_before_nms)

    # round-4 approximate-selection candidates (NOT parity modes; A/B
    # contract in BENCH_NOTES round 4)
    from tvretrieval_tpu.ops.span import banded_topk_spans_grouped_shift_approx

    @jax.jit
    def s_topv_approx95(q2c):
        s, i = jax.lax.approx_max_k(q2c, V, recall_target=0.95)
        return jnp.exp(rcfg.q2c_alpha * s), i

    @jax.jit
    def s_topk_spans_approx95(st_probs, ed_probs, topv_scores):
        return banded_topk_spans_grouped_shift_approx(
            st_probs[:, :V], ed_probs[:, :V], topv_scores,
            rcfg.min_pred_l, rcfg.max_pred_l, rcfg.max_before_nms,
            recall=0.95)

    stages = {
        "encode_query": lambda: s_encode_q(variables, q_feat, q_mask),
        "video_score_pallas": lambda: s_vscore_pallas(vq, sq, vf1_flat,
                                              sf1_flat),
        "video_score_pallas_int8": lambda: s_vscore_i8(vq, sq, vf1_i8,
                                                       sf1_i8),
    }
    if profile_pad128:
        del stages["video_score_pallas"]    # bf16 flats not resident
    stages |= {
        "video_topk": lambda: s_topv(q2c),
        "video_topk_approx95": lambda: s_topv_approx95(q2c),
        "video_score_i8_fused_topk": lambda: s_vscore_i8_fused_topk(
            vq, sq, vf1_i8, sf1_i8),
        "span_sim_gather_conv_softmax": lambda: s_span_sim(
            variables, vq, sq, feat2_cat, mask, gather_idx),
        "grouped_topk_spans": lambda: s_topk_spans(st_probs, ed_probs,
                                                   topv_scores),
        "grouped_topk_spans_shift": lambda: s_topk_spans_shift(
            st_probs, ed_probs, topv_scores),
        "grouped_topk_spans_shift8": lambda: s_topk_spans_shift8(
            st_probs, ed_probs, topv_scores),
        "grouped_topk_spans_approx95": lambda: s_topk_spans_approx95(
            st_probs, ed_probs, topv_scores),
    }
    if profile_i8flat:
        stages["span_sim_i8flat"] = lambda: s_span_sim_i8flat(
            variables, vq, sq, feat2_flat_i8, feat2_flat_scale, mask,
            gather_idx)

    # --- analytic roofline ledger (VERDICT r3 #8): per-stage FLOPs/bytes
    # at this shape, against the v5e chip peaks. roofline ms = max(compute,
    # HBM traffic); MFU% = flops / (peak * measured time).
    PEAK_BF16, PEAK_INT8, HBM = 197e12, 394e12, 819e9   # v5e
    n, D, D2 = qbsz, HIDDEN, 2 * HIDDEN
    # NVP (flat-padded videos) computed above, before any flat deletion
    NVL = N_VIDEOS * feat2_cat.shape[1]   # padded clip axis under pad128
    SLP = (feat2_flat_scale.shape[1] if profile_i8flat
           else 128)                                    # span flat pad (128)
    fl_vs = 2 * 2 * n * NVP * 104 * D                   # 2 streams, 2*N*M*K
    fl_sw = 2 * n * NVL * D2                            # span sim einsum
    fl_sw_pal = 2 * n * NVP * SLP * D2                  # padded kernel sweep
    analytics = {
        # name: (flops, bytes, peak)
        "video_score_pallas": (fl_vs, 2 * NVP * 104 * D * 2 + n * NVP * 4,
                               PEAK_BF16),
        "video_score_pallas_int8": (fl_vs, 2 * NVP * 104 * D + n * NVP * 4,
                                    PEAK_INT8),
        "video_score_einsum": (fl_vs, 2 * NVL * D * 2 + 2 * n * NVL * 4,
                               PEAK_BF16),
        "video_score_i8_fused_topk": (fl_vs,
                                      2 * NVP * 104 * D + 2 * n * NVP * 4,
                                      PEAK_INT8),
        "video_topk": (0, 3 * n * NVP * 4, PEAK_BF16),
        "span_sim_gather_conv_softmax": (fl_sw,
                                         NVL * D2 * 2 + n * NVL * 4,
                                         PEAK_BF16),
        "span_sim_i8flat": (fl_sw_pal, NVP * SLP * D2 + n * NVP * SLP * 2,
                            PEAK_INT8),
    }

    total_modeled = 0.0
    print(f"{'stage':32s} {'ms':>8s}  {'roofline':>8s}  {'MFU%':>5s}  "
          f"{'GB/s':>6s}")
    for name, fn in stages.items():
        ms = time_stage(fn)
        # the fused program runs the round-3 bench modes (pallas_int8 video
        # scores); superseded or comparison-only stages are excluded from
        # the modeled sum
        if name not in ("video_score_einsum", "video_score_pallas",
                        "video_score_i8_fused_topk", "span_sim_i8flat",
                        "grouped_topk_spans", "grouped_topk_spans_shift8",
                        "video_topk_approx95", "grouped_topk_spans_approx95"):
            total_modeled += ms
        if name in analytics:
            fl, by, peak = analytics[name]
            roof = max(fl / peak, by / HBM) * 1e3
            mfu = fl / (peak * ms * 1e-3) * 100
            gbs = by / (ms * 1e-3) / 1e9
            print(f"{name:32s} {ms:8.2f}  {roof:8.2f}  {mfu:5.1f}  "
                  f"{gbs:6.0f}", flush=True)
        else:
            print(f"{name:32s} {ms:8.2f}", flush=True)
    print(f"{'sum (r3 bench path, upper bound)':32s} {total_modeled:8.2f} ms")

    if rcfg.video_score_mode == "pallas_int8":
        fused_vf, fused_sf = vf1_i8, sf1_i8
    elif rcfg.video_score_mode == "pallas":
        fused_vf, fused_sf = vf1_flat, sf1_flat
    else:
        fused_vf, fused_sf = vf1, sf1
    fused = lambda: _score_query_batch(
        model, variables, rcfg, q_feat, q_mask,
        fused_vf, None, fused_sf, None,
        mask, gt, True, feat2_cat=feat2_cat)
    ms = time_stage(fused)
    print(f"{'fused _score_query_batch':32s} {ms:8.2f} ms  "
          f"({qbsz / ms * 1e3:.0f} q/s)")


if __name__ == "__main__":
    main()
