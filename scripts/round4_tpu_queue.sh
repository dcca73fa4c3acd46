#!/bin/bash
# Round-4 serialized TPU measurement queue (one TPU job at a time).
#
# Waits for the TVR-scale retrain (writes /tmp/retrain.pid) to finish, then
# runs the round-4 headline-deciding measurements back-to-back, each logging
# to /tmp/q4_*.log. Launch with
#   setsid nohup bash scripts/round4_tpu_queue.sh > /tmp/q4_driver.log 2>&1 &
#
# Queue:
#   1. engine_modes round-4 combos (nq=800)   -> /tmp/q4_modes.log
#      (int8_flat span sweep / grouped_shift8 / fused video top-k, each
#       against the round-3 headline mode simsweep_cat/pallas_int8/
#       grouped_shift, plus the all-winners stack)
#   2. fresh-ckpt A/B, parity mode            -> /tmp/q4_ab_parity.log
#      (VERDICT #3: re-run A/B matching the committed parity numbers)
#   3. fresh-ckpt A/B, int8_flat+shift8+fused -> /tmp/q4_ab_r4.log
#      (accuracy contract for whatever round-4 stack bench.py ships;
#       the r3 bench mode keeps its committed round-3 A/B JSONs)
#   4. bench.py at the shipped config         -> /tmp/q4_bench.log
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export AXON_JOURNAL_COMPACT=1

CKPT_DIR=results_scale/tvr-tvrscale-r4

if [ -f /tmp/retrain.pid ]; then
    RPID=$(cat /tmp/retrain.pid)
    echo "$(date -u +%T) waiting for retrain pid $RPID..."
    while kill -0 "$RPID" 2>/dev/null; do sleep 60; done
    echo "$(date -u +%T) retrain done"
fi

probe() {
    timeout 120 python -c "
import jax, jax.numpy as jnp
jax.device_get((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0])
print('TPU_OK')" 2>/dev/null | grep -q TPU_OK
}

echo "$(date -u +%T) waiting for TPU tunnel..."
for i in $(seq 1 240); do
    if probe; then echo "$(date -u +%T) TPU up (probe $i)"; break; fi
    sleep 60
done
probe || { echo "TPU never recovered; giving up"; exit 1; }

echo "$(date -u +%T) [1/4] engine_modes round-4 combos"
timeout 4800 python -m tvretrieval_tpu.profiling.engine_modes --nq 800 \
    --iters 8 --modes \
    simsweep_cat/pallas_int8/grouped_shift \
    simsweep_cat_int8_flat/pallas_int8/grouped_shift \
    simsweep_cat/pallas_int8/grouped_shift8 \
    simsweep_cat/pallas_int8/grouped_shift/fused \
    simsweep_cat_int8_flat/pallas_int8/grouped_shift8/fused \
    > /tmp/q4_modes.log 2>&1
echo "  exit=$?"

if [ -d "$CKPT_DIR/ckpt" ]; then
    echo "$(date -u +%T) [2/4] fresh-ckpt A/B parity mode"
    timeout 3600 python -m tvretrieval_tpu.retrieval.inference_xml \
        --model_dir "$CKPT_DIR" --tasks VCMR SVMR VR \
        --eval_id ab_parity_r4 \
        > /tmp/q4_ab_parity.log 2>&1
    echo "  exit=$?"

    echo "$(date -u +%T) [3/4] fresh-ckpt A/B round-4 stack"
    timeout 3600 python -m tvretrieval_tpu.retrieval.inference_xml \
        --model_dir "$CKPT_DIR" --tasks VCMR SVMR VR \
        --span_score_mode simsweep_cat_int8_flat \
        --video_score_mode pallas_int8 \
        --span_topk_mode grouped_shift8 --video_topk_fused 1 \
        --eval_id ab_r4stack \
        > /tmp/q4_ab_r4.log 2>&1
    echo "  exit=$?"
else
    echo "$(date -u +%T) no fresh ckpt at $CKPT_DIR/ckpt — skipping A/Bs"
fi

echo "$(date -u +%T) [4/4] bench.py (shipped config)"
timeout 2400 python bench.py > /tmp/q4_bench.log 2>&1
echo "  exit=$?"

echo "$(date -u +%T) queue done"
