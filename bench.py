"""Headline benchmark: full-corpus VCMR retrieval throughput (queries/sec).

Measures the reference's hot path (inference.py:252-386) end-to-end on one
chip: encode query batch -> cosine video scores against ALL 21,818 videos ->
exp(alpha) -> top-100 videos -> ConvSE span probabilities -> joint (st,ed)
outer product under the min/max-length mask -> on-device top-200 spans.
Corpus size matches the full TVR corpus (README.md:15: 21.8K videos,
100 clips each, hidden 256, two streams x two layers).

The corpus cache is synthesized directly at encoder-output shape (encoding
is a one-time offline cost; the north star is per-query retrieval
throughput — BASELINE.md "score the full 21.8K-video corpus per query").

vs_baseline: the reference publishes no throughput number; 170 q/s is a
CEILING derived from the reference pipeline's own materialized-tensor
traffic at its shipped eval_query_bsz=50 (inference.py:61) — ~170 GB of
f32 HBM traffic per 50-query batch against 21.8K videos, which even at the
RTX 2080Ti's full 616 GB/s with zero compute/sort/host cost bounds it at
<= ~181 q/s (full arithmetic in BENCH_NOTES.md). vs_baseline = qps / 170.
"""
from __future__ import annotations

import json
import os
import time

BASELINE_REF_QPS = 170.0
N_VIDEOS = 21818
N_CLIPS = 100
HIDDEN = 256
QUERY_BSZ = int(os.environ.get("BENCH_QUERY_BSZ", "1000"))
#                 the int8 feat1 cache frees ~1.1 GiB vs bf16, so 1200
#                   now FITS (bf16 needed 15.76 GiB) — but measured SLOWER:
#                   15,470 q/s at 1200 vs 16,065 at 1000, builder-local run
#                   (driver capture of the same config: 15,986, BENCH_r03;
#                   the 1200-vs-1000 comparison is like-for-like) (the sweep
#                   einsum
#                   and span top-k scale superlinearly past the MXU sweet
#                   spot; BENCH_NOTES round 3). 1000 stays the bench batch.
N_WARMUP = 2
N_ITERS = 10


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    # persistent compile cache: first-ever compile of the scoring program
    # takes minutes over the remote-compile relay; subsequent runs are fast
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/tvr_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tvretrieval_tpu.models.xml import XML, XMLConfig
    from tvretrieval_tpu.retrieval.engine import RetrievalConfig, _score_query_batch

    cfg = XMLConfig(
        ctx_mode="video_sub", visual_input_size=3074, sub_input_size=770,
        query_input_size=768, hidden_size=HIDDEN, n_heads=4,
        max_ctx_l=N_CLIPS, max_desc_l=30)
    model = XML(cfg)
    # fastest measured engine configuration (BENCH_NOTES round-2/3 tables):
    # - simsweep_cat: one K=2D corpus-wide similarity einsum over the
    #   concatenated feat2 cache + tiny sim-row gathers (no feature-row
    #   gather); video ranking bit-equal to the reference-faithful gather
    #   path, span scores equal up to f32 accumulation order
    #   (tests/test_span_score_modes.py)
    # - pallas_int8 video scores: ops/pallas_score.py s8 flat-cache kernel
    #   (2x MXU rate, half the cache HBM; 1.63x the bf16 stage). Integer
    #   accumulation is exact; the only approximation is scale-127 input
    #   rounding — trained-checkpoint A/B moved no metric beyond +-0.03
    #   recall points (BENCH_NOTES round 3, JSONs in results_scale/)
    # - grouped_shift span top-k: shift-reduction expansion (bit-exact,
    #   no (Nq, V, L, W) band tensor)
    # - span_sim_pad_l=128: lane-tile-exact clip axis for the materialized
    #   similarity — removes the 100->128 minor-dim layout tax on the
    #   top-V sim-row gather. A bit-exact PARITY mode (identical
    #   selections; tests/test_span_score_modes.py single-chip AND
    #   sharded), so no A/B gate applies — shipped as the round-4 headline
    #   (+19.5%: 19,179 vs 16,087 q/s under this harness,
    #   results_scale/q4c_logs/bench_candidates.log).
    # - approx selection stack (grouped_shift_approx + video_topk_approx)
    #   on bf16 sim: +5.5-7% on top of pad128 at rt=0.95 (20,514 r4 /
    #   20,533 r5b bench captures; the round-4 "-17% dead" reading was a
    #   non-reproducible transient, see BENCH_NOTES round-5
    #   reconciliation), and rt=0.90 adds another +4.7% (21,490, bench
    #   r5b). NOT a parity mode: trained-checkpoint A/B at rt=0.95 AND
    #   rt=0.90 moved no VCMR/SVMR/VR metric
    #   (results_scale/tvr-tvrscale-r4b JSONs).
    # mode overrides below are for A/B capture runs only; the defaults ARE
    # the shipped configuration.
    span_mode = os.environ.get("BENCH_SPAN_SCORE_MODE", "simsweep_cat_bf16")
    if span_mode not in ("simsweep_cat", "simsweep_cat_bf16"):
        # the synthetic cache below is built bf16+cat; int8/gather modes
        # need a different cache layout that bench does not synthesize
        raise SystemExit(
            f"BENCH_SPAN_SCORE_MODE={span_mode!r} unsupported by bench.py "
            "(only simsweep_cat / simsweep_cat_bf16)")
    rcfg = RetrievalConfig(
        cache_dtype_str="bfloat16",
        span_score_mode=span_mode,
        video_score_mode="pallas_int8",
        span_topk_mode=os.environ.get("BENCH_SPAN_TOPK_MODE",
                                      "grouped_shift_approx"),
        video_topk_approx=bool(int(os.environ.get(
            "BENCH_VIDEO_TOPK_APPROX", "1"))),
        video_topk_psort=bool(int(os.environ.get(
            "BENCH_VIDEO_TOPK_PSORT", "0"))),
        topk_approx_recall=float(os.environ.get(
            "BENCH_TOPK_RECALL", "0.90")),
        span_sim_pad_l=int(os.environ.get("BENCH_SPAN_SIM_PAD_L", "128")),
        video_chunk_v=int(os.environ.get("BENCH_VIDEO_CHUNK_V", "16")))

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    # init params with a tiny batch (shapes don't matter for param shapes)
    dummy = dict(
        query_feat=jnp.zeros((2, 30, 768)), query_mask=jnp.ones((2, 30)),
        video_feat=jnp.zeros((2, N_CLIPS, 3074)), video_mask=jnp.ones((2, N_CLIPS)),
        sub_feat=jnp.zeros((2, N_CLIPS, 770)), sub_mask=jnp.ones((2, N_CLIPS)),
        st_ed_indices=jnp.zeros((2, 2), jnp.int32))
    variables = model.init(
        {"params": ks[0], "dropout": ks[1], "negatives": ks[2]},
        **dummy, deterministic=True)

    # synthetic encoded corpus cache, bf16 in HBM (feat1 streams arrive
    # pre-normalized from encode_corpus; mirror that here)
    shape = (N_VIDEOS, N_CLIPS, HIDDEN)
    dt = rcfg.cache_dtype

    def normed(k):
        x = jax.random.normal(k, shape, dtype=jnp.float32)
        return (x / jnp.linalg.norm(x, axis=-1, keepdims=True)).astype(dt)

    # feat2 streams live concatenated in the cache (simsweep_cat layout;
    # same total HBM as two separate streams)
    from tvretrieval_tpu.retrieval.engine import _maybe_pad_clip_axis
    feat2_cat = jnp.concatenate(
        [jax.random.normal(ks[4], shape, dtype=dt),
         jax.random.normal(ks[6], shape, dtype=dt)], axis=-1)
    # same pad path as encode_corpus (validates the mode/pad combo)
    feat2_cat = _maybe_pad_clip_axis(feat2_cat, rcfg)
    mask = jnp.ones((N_VIDEOS, N_CLIPS), jnp.float32)
    # feat1 streams in the video-major flat mask-free layout consumed by
    # the pallas video-score kernel (what encode_corpus builds), quantized
    # to s8 (unit rows -> symmetric scale-127, no per-row scales needed)
    from tvretrieval_tpu.ops.pallas_score import (build_flat_feat1,
                                                  quantize_unit_i8)
    def flat_i8(k):
        f = build_flat_feat1(normed(k), mask, chunk_v=rcfg.video_chunk_v)
        out = quantize_unit_i8(f)
        f.delete()  # the bf16 flat is not read again (HBM headroom)
        return out
    cache = [flat_i8(ks[3]), None, flat_i8(ks[5]), None]

    q_feat = jax.random.normal(ks[7], (QUERY_BSZ, 30, 768), jnp.float32)
    q_mask = jnp.ones((QUERY_BSZ, 30), jnp.float32)
    gt_idx = jnp.zeros((QUERY_BSZ,), jnp.int32)

    def run():
        return _score_query_batch(
            model, variables, rcfg, q_feat, q_mask,
            cache[0], cache[1], cache[2], cache[3], mask, gt_idx, True,
            feat2_cat=feat2_cat)

    def fence(out):
        # real device->host transfer: under the remote-execution relay,
        # block_until_ready returns before the program has finished
        _ = jax.device_get(out["vcmr_scores"][0, 0])

    for _ in range(N_WARMUP):
        fence(run())
    # steady-state throughput: pipeline N_ITERS batches (programs execute
    # back-to-back on device), fence once at the end
    t0 = time.perf_counter()
    outs = [run() for _ in range(N_ITERS)]
    fence(outs[-1])
    dt_s = time.perf_counter() - t0

    qps = QUERY_BSZ * N_ITERS / dt_s
    print(json.dumps({
        "metric": f"vcmr_retrieval_throughput_{N_VIDEOS}videos",
        "value": round(qps, 2),
        "unit": "queries/sec",
        "vs_baseline": round(qps / BASELINE_REF_QPS, 2),
    }))


if __name__ == "__main__":
    main()
