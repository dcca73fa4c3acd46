#!/bin/bash
# Round-4c serialized TPU queue — reruns everything the VM restart wiped
# (/tmp logs + the retrained checkpoint binary). One TPU job at a time
# (CLAUDE.md). Logs land in results_scale/q4c_logs/ so they survive /tmp
# churn. Launch with
#   setsid nohup bash scripts/round4c_tpu_queue.sh > results_scale/q4c_logs/driver.log 2>&1 &
#
# Queue:
#   1. engine_modes: fused + approx combos      -> modes.log
#      (the headline-deciding round-4 candidates: fused video top-k after
#       the Mosaic fix, vapprox, grouped_shift_approx — vs the r3 mode)
#   2. approx-top-k stage measurement           -> topk.log
#   3. TVR-scale retrain (ckpt lost to VM churn; BENCH_NOTES recipe,
#      killed after the epoch-9 eval — metrics plateau at epoch 8)
#   4. fresh-ckpt A/B, parity mode              -> ab_parity.log
#   5. fresh-ckpt A/B, approx stack             -> ab_approx.log
#      (grouped_shift_approx + video_topk_approx: the accuracy contract
#       for BOTH approx selection sites at once, worst case)
#   6. stage profiler with the MFU ledger       -> stages.log
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export AXON_JOURNAL_COMPACT=1

LOGDIR=results_scale/q4c_logs
mkdir -p "$LOGDIR"
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

echo "$(date -u +%T) waiting for TPU tunnel..."
wait_tpu 360 || exit 1

echo "$(date -u +%T) [1/6] engine_modes: fused + approx combos"
timeout 7200 python -m tvretrieval_tpu.profiling.engine_modes --nq 800 \
    --iters 8 --modes \
    simsweep_cat/pallas_int8/grouped_shift \
    simsweep_cat/pallas_int8/grouped_shift/fused \
    simsweep_cat/pallas_int8/grouped_shift_approx/fused \
    simsweep_cat/pallas_int8/grouped_shift_approx/vapprox \
    simsweep_cat/pallas_int8/grouped_shift/preexp \
    > "$LOGDIR/modes.log" 2>&1
echo "  exit=$?"
wait_tpu 60 || exit 1

echo "$(date -u +%T) [2/6] approx top-k stage measurement"
timeout 2400 python scripts/measure_topk_approx.py > "$LOGDIR/topk.log" 2>&1
echo "  exit=$?"
wait_tpu 60 || exit 1

echo "$(date -u +%T) [3/6] TVR-scale retrain (exp_id tvrscale-r4b)"
setsid bash scripts/train_xml_tvr_scale_synthetic.sh results_scale \
    --exp_id tvrscale-r4b > "$LOGDIR/retrain.log" 2>&1 &
RPID=$!
echo "  retrain pgid $RPID"
ELOG="$CKPT_DIR/eval.log.txt"
for i in $(seq 1 90); do
    kill -0 "$RPID" 2>/dev/null || break
    if grep -q "^\[epoch 9\]" "$ELOG" 2>/dev/null; then
        echo "  epoch-9 eval logged; best ckpt saved — letting saves settle"
        sleep 90
        kill -- -"$RPID" 2>/dev/null
        sleep 10
        kill -9 -- -"$RPID" 2>/dev/null
        break
    fi
    sleep 60
done
# hard stop if still alive after 90 min
kill -0 "$RPID" 2>/dev/null && { kill -- -"$RPID" 2>/dev/null; sleep 10; kill -9 -- -"$RPID" 2>/dev/null; }
echo "  retrain done; eval log tail:"
tail -1 "$ELOG" 2>/dev/null | cut -c1-120
wait_tpu 60 || exit 1

if [ -d "$CKPT_DIR/ckpt" ]; then
    echo "$(date -u +%T) [4/6] fresh-ckpt A/B parity mode"
    timeout 3600 python -m tvretrieval_tpu.retrieval.inference_xml \
        --model_dir "$CKPT_DIR" --tasks VCMR SVMR VR \
        --eval_id ab_parity_r4b \
        > "$LOGDIR/ab_parity.log" 2>&1
    echo "  exit=$?"
    wait_tpu 60 || exit 1

    echo "$(date -u +%T) [5/6] fresh-ckpt A/B approx stack"
    timeout 3600 python -m tvretrieval_tpu.retrieval.inference_xml \
        --model_dir "$CKPT_DIR" --tasks VCMR SVMR VR \
        --span_topk_mode grouped_shift_approx --video_topk_approx 1 \
        --eval_id ab_approx_r4 \
        > "$LOGDIR/ab_approx.log" 2>&1
    echo "  exit=$?"
    wait_tpu 60 || exit 1
else
    echo "$(date -u +%T) no fresh ckpt at $CKPT_DIR/ckpt — skipping A/Bs"
fi

echo "$(date -u +%T) [6/6] stage profiler (MFU ledger)"
timeout 3600 python scripts/profile_engine_stages.py 800 > "$LOGDIR/stages.log" 2>&1
echo "  exit=$?"

echo "$(date -u +%T) queue done"
