#!/bin/bash
# Round-4d serialized TPU queue — runs after round4c_tpu_queue.sh (waits for
# its "queue done" line). Measures the one candidate left by the round-4c
# results: approximate selection at recall ~0.95 (the only regime where
# lax.approx_max_k beats the exact blocked selectors at bench shapes), plus
# its trained-checkpoint A/B on the fresh tvrscale-r4b ckpt.
#   setsid nohup bash scripts/round4d_tpu_queue.sh > results_scale/q4c_logs/driver4d.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export AXON_JOURNAL_COMPACT=1

LOGDIR=results_scale/q4c_logs
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

echo "$(date -u +%T) waiting for round4c queue to finish..."
for i in $(seq 1 720); do
    grep -q "queue done" "$LOGDIR/driver.log" 2>/dev/null && break
    sleep 30
done
grep -q "queue done" "$LOGDIR/driver.log" || { echo "round4c never finished"; exit 1; }
wait_tpu 120 || exit 1

echo "$(date -u +%T) [1/3] engine_modes: approx recall sweep (nq=800)"
timeout 7200 python -m tvretrieval_tpu.profiling.engine_modes --nq 800 \
    --iters 8 --modes \
    simsweep_cat/pallas_int8/grouped_shift \
    simsweep_cat/pallas_int8/grouped_shift_approx/rt0.95 \
    simsweep_cat/pallas_int8/grouped_shift_approx/rt0.9 \
    simsweep_cat/pallas_int8/grouped_shift_approx/vapprox/rt0.95 \
    simsweep_cat/pallas_int8/grouped_shift_approx/vapprox/rt0.9 \
    > "$LOGDIR/rt_sweep.log" 2>&1
echo "  exit=$?"
wait_tpu 60 || exit 1

echo "$(date -u +%T) [2/3] engine_modes: candidate stack at bench batch (nq=1000)"
timeout 7200 python -m tvretrieval_tpu.profiling.engine_modes --nq 1000 \
    --iters 8 --modes \
    simsweep_cat/pallas_int8/grouped_shift \
    simsweep_cat/pallas_int8/grouped_shift_approx/rt0.95 \
    simsweep_cat/pallas_int8/grouped_shift_approx/vapprox/rt0.95 \
    > "$LOGDIR/nq1000.log" 2>&1
echo "  exit=$?"
wait_tpu 60 || exit 1

if [ -d "$CKPT_DIR/ckpt" ]; then
    echo "$(date -u +%T) [3/3] fresh-ckpt A/B approx stack at rt=0.95"
    timeout 3600 python -m tvretrieval_tpu.retrieval.inference_xml \
        --model_dir "$CKPT_DIR" --tasks VCMR SVMR VR \
        --span_topk_mode grouped_shift_approx --video_topk_approx 1 \
        --topk_approx_recall 0.95 \
        --eval_id ab_approx_rt95 \
        > "$LOGDIR/ab_rt95.log" 2>&1
    echo "  exit=$?"
else
    echo "$(date -u +%T) no ckpt at $CKPT_DIR/ckpt — skipping rt95 A/B"
fi

echo "$(date -u +%T) queue done (4d)"
