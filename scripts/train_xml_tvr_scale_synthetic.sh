#!/usr/bin/env bash
# TVR-scale end-to-end validation: the FULL training driver (staged hard
# negatives, span loss, per-epoch eval loss + full-corpus retrieval eval,
# early stopping, checkpoints, final NMS inference) on a synthetic world at
# the real corpus scale and feature dimensions — 21,818 videos / 109K
# queries, video 3072-d + TEF, subtitles 768-d + TEF, queries 768-d with a
# planted signal projected into the context spaces.
# Results + trajectory: BENCH_NOTES.md "TVR-scale validation run".
set -e
# The TPU-relay client journals every host->device transfer for replay on
# reconnect; without compaction the journal pins every train batch in host
# RAM (~80GB/epoch at this scale -> kernel OOM). See CLAUDE.md.
export AXON_JOURNAL_COMPACT=1
python -m tvretrieval_tpu.training.train_xml --synthetic \
  --exp_id tvrscale --results_root "${1:-results_scale}" \
  --synthetic_videos 21818 --synthetic_queries 109000 \
  --synthetic_vid_dim 3072 --synthetic_text_dim 768 --synthetic_query_dim 768 \
  --synthetic_max_clips 100 --synthetic_train_frac 0.9 \
  --synthetic_cache /tmp/tvr_scale_world.pkl \
  --prebuild_cache_dir /tmp/tvr_scale_prebuilt \
  --n_epoch 100 --bsz 128 --prebuild_examples --prebuild_dtype float16 \
  --eval_query_bsz 100 --eval_context_bsz 200 --eval_cache_dtype bfloat16 \
  --eval_untrained "${@:2}"
