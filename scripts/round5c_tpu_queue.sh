#!/bin/bash
# Round-5c TPU queue: rt=0.85 trained-checkpoint A/B (gate for the next
# recall step), combined recall x query-bsz bench captures, and the
# encode_query sub-stage profile (VERDICT r4 item 7).
#   setsid nohup bash scripts/round5c_tpu_queue.sh > results_scale/q5_logs/driver5c.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export AXON_JOURNAL_COMPACT=1
LOGDIR=results_scale/q5_logs
CKPT_DIR=results_scale/tvr-tvrscale-r4b

probe() {
    timeout 180 python -c "
import jax, jax.numpy as jnp
jax.device_get((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0])
print('TPU_OK')" 2>/dev/null | grep -q TPU_OK
}
wait_tpu() {
    for i in $(seq 1 "$1"); do
        if probe; then echo "$(date -u +%T) TPU up (probe $i)"; return 0; fi
        sleep 60
    done
    echo "$(date -u +%T) TPU never came up"; return 1
}

echo "$(date -u +%T) [1/3] A/B approx stack rt=0.85 (fresh r4b ckpt)"
timeout 3600 python -m tvretrieval_tpu.retrieval.inference_xml \
    --model_dir "$CKPT_DIR" --tasks VCMR SVMR VR \
    --span_topk_mode grouped_shift_approx --video_topk_approx 1 \
    --topk_approx_recall 0.85 \
    --eval_id ab_approx_rt85 \
    > "$LOGDIR/ab_rt85.log" 2>&1
echo "  exit=$?"
wait_tpu 60 || exit 1

echo "$(date -u +%T) [2/3] bench: recall x qbsz grid"
{
    echo "== rt0.90 qbsz=1000 (new default) =="
    timeout 3600 python bench.py
    echo "== rt0.90 qbsz=1200 =="
    BENCH_QUERY_BSZ=1200 timeout 3600 python bench.py
    echo "== rt0.85 qbsz=1000 =="
    BENCH_TOPK_RECALL=0.85 timeout 3600 python bench.py
    echo "== rt0.85 qbsz=1200 =="
    BENCH_TOPK_RECALL=0.85 BENCH_QUERY_BSZ=1200 timeout 3600 python bench.py
} > "$LOGDIR/bench_r5c.log" 2>&1
echo "  exit=$?"
wait_tpu 60 || exit 1

echo "$(date -u +%T) [3/3] encode_query sub-stage profile"
timeout 3600 python scripts/measure_encode_query.py 1000 \
    > "$LOGDIR/encode_query.log" 2>&1
echo "  exit=$?"
echo "$(date -u +%T) queue done (5c)"
