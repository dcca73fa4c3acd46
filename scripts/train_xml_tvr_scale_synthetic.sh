#!/usr/bin/env bash
# TVR-scale end-to-end validation: the FULL training driver (staged hard
# negatives, span loss, per-epoch eval loss + full-corpus retrieval eval,
# early stopping, checkpoints, final NMS inference) on a synthetic world at
# the real corpus scale and feature dimensions — 21,818 videos / 109K
# queries, video 3072-d + TEF, subtitles 768-d + TEF, queries 768-d with a
# planted signal projected into the context spaces.
# Results + trajectory: BENCH_NOTES.md "TVR-scale validation run".
#
# --device_data is what makes this feasible through the ~25 MB/s remote-TPU
# link: the corpus context features live in HBM (float8, 8.4 GB), batches
# assemble on device, and 8 optimizer steps run per dispatch — an epoch
# streams ~120 MB instead of ~100 GB. World generation is vectorized but
# still ~25 min of 1-core numpy at this scale, and TPU-tunnel drops kill
# runs every 1-2 h — the world pickle cache makes retry attempts skip
# straight to the device-table build (world is deterministic from the
# seed, so the cache is safe).
#
# --video_score_mode pallas is REQUIRED at this scale: the einsum path
# materializes an (Nq, L, Nv) f32 score tensor (8.7 GB at query_bsz 100)
# that no longer fits beside the resident corpus + encoded eval cache.
set -e
export AXON_JOURNAL_COMPACT=1   # cap the relay transfer journal (CLAUDE.md)
python -m tvretrieval_tpu.training.train_xml --synthetic \
  --exp_id tvrscale --results_root "${1:-results_scale}" \
  --synthetic_videos 21818 --synthetic_queries 109000 \
  --synthetic_vid_dim 3072 --synthetic_text_dim 768 --synthetic_query_dim 768 \
  --synthetic_max_clips 100 --synthetic_train_frac 0.9 \
  --device_data --device_data_dtype float8_e4m3fn --scan_steps 8 \
  --synthetic_cache "${1:-results_scale}/world_tvrscale.pkl" \
  --n_epoch 100 --bsz 128 \
  --eval_query_bsz 50 --eval_context_bsz 200 --eval_cache_dtype bfloat16 \
  --video_score_mode pallas --span_score_mode gather \
  --eval_untrained "${@:2}"
