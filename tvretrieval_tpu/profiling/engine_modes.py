"""Measure the retrieval engine's stage-mode variants at corpus scale.

Compares, on one chip with the relay-safe fencing from bench.py:
  * span_score_mode:  "gather" (top-V feature-row gather) vs "simsweep"
                      (full-corpus similarity einsum + sim-row gather)
  * video_score_mode: "einsum" (XLA) vs "pallas" (ops/pallas_score.py)

Run:  python -m tvretrieval_tpu.profiling.engine_modes [--nq 200] [--iters 8]
Prints one line per mode combination; exactness across combinations is
asserted on the final span candidates of the first batch.

--modes entries are span/video[/span_topk], e.g.
  simsweep_cat/pallas/grouped_shift (the bench.py configuration).
"""
from __future__ import annotations

import argparse
import dataclasses
import itertools
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--nq", type=int, default=200)
    p.add_argument("--n_videos", type=int, default=21818)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--modes", type=str, nargs="+", default=None,
                   help="subset like gather/einsum simsweep/pallas")
    p.add_argument("--interpret", action="store_true",
                   help="run Pallas kernels in interpret mode (CPU smoke)")
    p.add_argument("--chunk_v", type=int, default=16,
                   help="videos per grid step of the flat pallas video "
                        "kernels (RetrievalConfig.video_chunk_v; applies "
                        "to every combo in this invocation — the flat "
                        "caches are built once)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tvretrieval_tpu.models.xml import XML, XMLConfig
    from tvretrieval_tpu.retrieval.engine import RetrievalConfig, _score_query_batch

    L, H = 100, args.hidden
    cfg = XMLConfig(ctx_mode="video_sub", visual_input_size=3074,
                    sub_input_size=770, query_input_size=768, hidden_size=H,
                    n_heads=4, max_ctx_l=L, max_desc_l=30)
    model = XML(cfg)
    base = RetrievalConfig(cache_dtype_str="bfloat16", query_bsz=args.nq,
                           pallas_interpret=args.interpret,
                           video_chunk_v=args.chunk_v)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    qf = jax.random.normal(ks[0], (args.nq, 30, 768), jnp.float32)
    qm = jnp.ones((args.nq, 30), jnp.float32)
    variables = model.init(
        {"params": ks[1], "dropout": ks[2], "negatives": ks[3]},
        query_feat=qf[:2], query_mask=qm[:2],
        video_feat=jnp.zeros((2, L, 3074)), video_mask=jnp.ones((2, L)),
        sub_feat=jnp.zeros((2, L, 770)), sub_mask=jnp.ones((2, L)),
        st_ed_indices=jnp.zeros((2, 2), jnp.int32), deterministic=True)

    nv = args.n_videos
    dt = base.cache_dtype
    norm = lambda x: x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    mk = lambda k: norm(jax.random.normal(k, (nv, L, H), jnp.float32)).astype(dt)
    vf1, sf1 = mk(ks[6]), mk(ks[7])
    vf2 = jax.random.normal(ks[6], (nv, L, H), jnp.float32).astype(dt)
    sf2 = jax.random.normal(ks[7], (nv, L, H), jnp.float32).astype(dt)
    mask = jnp.ones((nv, L), jnp.float32)
    gt = jnp.zeros((args.nq,), jnp.int32)

    combos = (args.modes if args.modes else
              ["/".join(c) for c in itertools.product(
                  ("gather", "simsweep"), ("einsum", "pallas"))])
    feat2_cat = (jnp.concatenate([vf2, sf2], axis=-1)
                 if any(c.startswith("simsweep_cat") for c in combos) else None)
    pad_combos = [c for c in combos if "pad128" in c.split("/")[3:]]
    bad = [c for c in pad_combos
           if c.split("/")[0] not in ("simsweep_cat", "simsweep_cat_bf16")]
    if bad:
        # pad128 = RetrievalConfig.span_sim_pad_l, which only composes with
        # the bf16 cat sweep modes (engine._maybe_pad_clip_axis raises too)
        raise SystemExit(f"pad128 flag only valid on simsweep_cat/"
                         f"simsweep_cat_bf16 combos, got: {bad}")
    feat2_cat_pad = None
    if pad_combos:
        # lane-tile-exact clip axis (RetrievalConfig.span_sim_pad_l=128)
        feat2_cat_pad = jnp.pad(feat2_cat, ((0, 0), (0, 128 - L), (0, 0)))
        int8_needs_cat = any(
            c.split("/")[0].startswith("simsweep_cat_int8") for c in combos)
        if not int8_needs_cat and all(
                "pad128" in c.split("/")[3:] for c in combos
                if c.startswith("simsweep_cat")):
            feat2_cat.delete()
            feat2_cat = None
    feat2_cat_i8 = feat2_cat_scale = None
    if any(c.split("/")[0] == "simsweep_cat_int8" for c in combos):
        from tvretrieval_tpu.ops.pallas_score import quantize_rows_i8
        feat2_cat_i8, feat2_cat_scale = quantize_rows_i8(feat2_cat)
    feat2_flat_i8 = feat2_flat_scale = None
    if any(c.split("/")[0] == "simsweep_cat_int8_flat" for c in combos):
        # video-major int8 flat layout for the fused Pallas span sweep
        from tvretrieval_tpu.ops.pallas_score import build_flat_feat2_i8
        feat2_flat_i8, feat2_flat_scale = build_flat_feat2_i8(feat2_cat)
    if (feat2_cat is not None
            and all(c.split("/")[0].startswith("simsweep_cat_int8")
                    for c in combos)):
        feat2_cat.delete()
        feat2_cat = None
    if all(c.startswith("simsweep_cat") for c in combos):
        # every combo reads feat2 through the cat cache — free the two
        # stream copies (HBM headroom: all layouts at once OOM at nq=800)
        vf2.delete()
        sf2.delete()
        vf2 = sf2 = None
    vf1_flat = sf1_flat = vf1_i8 = sf1_i8 = None
    if any(c.split("/")[1] in ("pallas", "pallas_int8") for c in combos):
        from tvretrieval_tpu.ops.pallas_score import (build_flat_feat1,
                                                      quantize_unit_i8)
        vf1_flat = build_flat_feat1(vf1, mask, chunk_v=args.chunk_v)
        sf1_flat = build_flat_feat1(sf1, mask, chunk_v=args.chunk_v)
        if any(c.split("/")[1] == "pallas_int8" for c in combos):
            vf1_i8 = quantize_unit_i8(vf1_flat)
            sf1_i8 = quantize_unit_i8(sf1_flat)
            if not any(c.split("/")[1] == "pallas" for c in combos):
                # nothing reads the bf16 flats once quantized (1.12 GB HBM
                # at corpus scale — enough to OOM the nq=800 sweep program)
                vf1_flat.delete()
                sf1_flat.delete()
                vf1_flat = sf1_flat = None
        if all(c.split("/")[1] in ("pallas", "pallas_int8") for c in combos):
            vf1.delete()
            sf1.delete()
            vf1 = sf1 = None
    ref_spans = None
    for combo in combos:
        parts = combo.split("/")
        span_mode, vid_mode = parts[0], parts[1]
        topk_mode = parts[2] if len(parts) > 2 else "grouped"
        # optional trailing flags: "preexp" (video top-k on pre-exp
        # scores), "fused" (kernel-emitted block-max video top-k),
        # "vapprox" (approx_max_k video top-V), "rt<r>" (recall target for
        # every approx_max_k site, e.g. rt0.95 — default 0.99), "pad128"
        # (span_sim_pad_l=128 lane-tile-exact cat cache — parity mode)
        flags = set(parts[3:])
        recall = next((float(f[2:]) for f in flags if f.startswith("rt")),
                      base.topk_approx_recall)
        rcfg = dataclasses.replace(base, span_score_mode=span_mode,
                                   video_score_mode=vid_mode,
                                   span_topk_mode=topk_mode,
                                   video_topk_pre_exp="preexp" in flags,
                                   video_topk_fused="fused" in flags,
                                   video_topk_approx="vapprox" in flags,
                                   video_topk_psort="vpsort" in flags,
                                   topk_approx_recall=recall,
                                   span_sim_pad_l=(128 if "pad128" in flags
                                                   else 0))
        if span_mode == "simsweep_cat_int8":
            kw = {"feat2_cat": feat2_cat_i8,
                  "feat2_cat_scale": feat2_cat_scale}
        elif span_mode == "simsweep_cat_int8_flat":
            kw = {"feat2_cat": feat2_flat_i8,
                  "feat2_cat_scale": feat2_flat_scale}
        elif span_mode.startswith("simsweep_cat"):
            kw = {"feat2_cat": (feat2_cat_pad if "pad128" in flags
                                else feat2_cat)}
        else:
            kw = {}
        f1v = {"pallas": vf1_flat, "pallas_int8": vf1_i8}.get(vid_mode, vf1)
        f1s = {"pallas": sf1_flat, "pallas_int8": sf1_i8}.get(vid_mode, sf1)
        run = lambda: _score_query_batch(model, variables, rcfg, qf, qm,
                                         f1v, vf2, f1s, sf2, mask, gt, True,
                                         **kw)
        t0 = time.time()
        out = run()
        np.asarray(out["vcmr_scores"][0, 0])  # fence (relay-safe)
        compile_s = time.time() - t0
        for _ in range(args.warmup):
            out = run()
        np.asarray(out["vcmr_scores"][0, 0])
        t0 = time.time()
        for _ in range(args.iters):
            out = run()
        np.asarray(out["vcmr_scores"][0, 0])  # one fence after N dispatches
        dt_s = (time.time() - t0) / args.iters
        qps = args.nq / dt_s
        spans = (np.asarray(out["vcmr_vid_local"]), np.asarray(out["vcmr_st"]),
                 np.asarray(out["vcmr_ed"]), np.asarray(out["vcmr_scores"]))
        if ref_spans is None:
            ref_spans, ref_name, exact = spans, combo, "ref"
        else:
            exact = ("bit-exact vs " + ref_name
                     if all(np.array_equal(a, b)
                            for a, b in zip(spans[:3], ref_spans[:3]))
                     and np.allclose(spans[3], ref_spans[3], rtol=1e-6)
                     else "MISMATCH vs " + ref_name)
        print(f"{combo:18s} {dt_s * 1e3:8.2f} ms/batch  {qps:8.1f} q/s  "
              f"(compile {compile_s:.1f}s)  [{exact}]", flush=True)


if __name__ == "__main__":
    main()
