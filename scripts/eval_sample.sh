#!/usr/bin/env bash
# Run the standalone evaluator on a submission (reference eval_sample.sh).
set -e
python -m tvretrieval_tpu.evaluation.metrics \
  --submission_path "${1:?submission json}" \
  --gt_path "${2:-data/tvr_val_release.jsonl}" \
  --save_path "${3:-${1%.json}_metrics.json}"
