#!/bin/bash
# Round-4h serialized TPU queue — replaces 4g (killed after its step-1
# span-parts OOM, now fixed: SIM materialized directly in 3D). Diagnostics
# first, including the NEW span_sim_pad_l engine mode; then the retrain and
# its gated A/Bs; then bench captures (incl. pad128 candidates) and the
# fixed stage ledger.
#   setsid nohup bash scripts/round4h_tpu_queue.sh > results_scale/q4c_logs/driver4h.log 2>&1 &
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

wait_tpu 240 || exit 1

# --- [1/9] span-sweep decomposition (OOM-fixed) ------------------------------
echo "$(date -u +%T) [1/9] span-sweep decomposition (nq=1000)"
timeout 5400 python scripts/measure_span_sweep_parts.py 1000 \
    > "$LOGDIR/span_parts.log" 2>&1
echo "  exit=$?"
wait_tpu 120 || exit 1

# --- [2/9] engine-mode baseline + pad128 candidates --------------------------
# Two invocations: the unpadded ref combo's sweep temps (~11.2 GB f32 at
# nq=1000) cannot coexist with both cat caches; the pad-only invocation
# frees the unpadded cache (engine_modes all-pad128 deletion).
echo "$(date -u +%T) [2/9] engine_modes ref baseline (nq=1000)"
timeout 5400 python -m tvretrieval_tpu.profiling.engine_modes --nq 1000 \
    --modes simsweep_cat/pallas_int8/grouped_shift \
    > "$LOGDIR/modes_ref1000.log" 2>&1
echo "  exit=$?"
wait_tpu 60 || exit 1
echo "$(date -u +%T) [2/9b] engine_modes pad128 combos (nq=1000)"
timeout 5400 python -m tvretrieval_tpu.profiling.engine_modes --nq 1000 \
    --modes simsweep_cat/pallas_int8/grouped_shift/pad128 \
            simsweep_cat_bf16/pallas_int8/grouped_shift/pad128 \
            simsweep_cat_bf16/pallas_int8/grouped_shift_approx/vapprox/rt0.95/pad128 \
    > "$LOGDIR/modes_pad128.log" 2>&1
echo "  exit=$?"
wait_tpu 120 || exit 1

# --- [3/9] video-kernel chunk_v sweep ----------------------------------------
echo "$(date -u +%T) [3/9] video-kernel chunk_v sweep (nq=1000)"
timeout 5400 python scripts/measure_video_kernel_chunks.py 1000 \
    > "$LOGDIR/chunks.log" 2>&1
echo "  exit=$?"
wait_tpu 120 || exit 1

# --- [4/9] resilient TVR-scale retrain ---------------------------------------
ELOG="$CKPT_DIR/eval.log.txt"
retrain_ok=0
if grep -q "^\[epoch 9\]" "$ELOG" 2>/dev/null && [ -d "$CKPT_DIR/ckpt" ]; then
    echo "$(date -u +%T) [4/9] retrain already complete — skipping"
    retrain_ok=1
fi
for attempt in 2 3 4 5 6; do
    [ "$retrain_ok" = 1 ] && break
    resume_args=()
    [ -d "$CKPT_DIR/ckpt" ] && resume_args=(--resume "$CKPT_DIR/ckpt")
    echo "$(date -u +%T) [4/9] retrain attempt $attempt ${resume_args[*]:-}"
    setsid bash scripts/train_xml_tvr_scale_synthetic.sh results_scale \
        --exp_id tvrscale-r4b "${resume_args[@]}" \
        > "$LOGDIR/retrain_e$attempt.log" 2>&1 &
    RPID=$!
    for i in $(seq 1 110); do
        kill -0 "$RPID" 2>/dev/null || break
        if grep -q "^\[epoch 9\]" "$ELOG" 2>/dev/null; then
            echo "  epoch-9 eval logged; letting ckpt saves settle"
            sleep 90
            kill -- -"$RPID" 2>/dev/null
            sleep 10
            kill -9 -- -"$RPID" 2>/dev/null
            retrain_ok=1
            break
        fi
        sleep 60
    done
    if kill -0 "$RPID" 2>/dev/null; then
        kill -- -"$RPID" 2>/dev/null; sleep 10; kill -9 -- -"$RPID" 2>/dev/null
    fi
    if [ "$retrain_ok" != 1 ] && [ -d "$CKPT_DIR/ckpt" ] \
            && grep -q "^\[epoch " "$ELOG" 2>/dev/null; then
        last_ep=$(grep -o "^\[epoch [0-9]*\]" "$ELOG" | tail -1 | grep -o "[0-9]*")
        if [ "${last_ep:-0}" -ge 6 ]; then retrain_ok=1; fi
    fi
    [ "$retrain_ok" = 1 ] && break
    echo "  attempt $attempt failed (tail: $(tail -1 "$LOGDIR/retrain_e$attempt.log" 2>/dev/null | cut -c1-100)); waiting for TPU"
    wait_tpu 120 || exit 1
done
if [ "$retrain_ok" != 1 ] || [ ! -d "$CKPT_DIR/ckpt" ]; then
    echo "$(date -u +%T) retrain FAILED after all attempts — continuing to non-ckpt steps"
fi
wait_tpu 60 || exit 1

# --- [5-7/9] fresh-ckpt A/Bs ---------------------------------------------------
if [ -d "$CKPT_DIR/ckpt" ]; then
    echo "$(date -u +%T) [5/9] A/B parity mode"
    timeout 3600 python -m tvretrieval_tpu.retrieval.inference_xml \
        --model_dir "$CKPT_DIR" --tasks VCMR SVMR VR \
        --eval_id ab_parity_r4b \
        > "$LOGDIR/ab_parity.log" 2>&1
    echo "  exit=$?"
    wait_tpu 60 || exit 1

    echo "$(date -u +%T) [6/9] A/B approx stack rt=0.95"
    timeout 3600 python -m tvretrieval_tpu.retrieval.inference_xml \
        --model_dir "$CKPT_DIR" --tasks VCMR SVMR VR \
        --span_topk_mode grouped_shift_approx --video_topk_approx 1 \
        --topk_approx_recall 0.95 \
        --eval_id ab_approx_rt95 \
        > "$LOGDIR/ab_rt95.log" 2>&1
    echo "  exit=$?"
    wait_tpu 60 || exit 1

    echo "$(date -u +%T) [7/9] A/B approx stack rt=0.90"
    timeout 3600 python -m tvretrieval_tpu.retrieval.inference_xml \
        --model_dir "$CKPT_DIR" --tasks VCMR SVMR VR \
        --span_topk_mode grouped_shift_approx --video_topk_approx 1 \
        --topk_approx_recall 0.90 \
        --eval_id ab_approx_rt90 \
        > "$LOGDIR/ab_rt90.log" 2>&1
    echo "  exit=$?"
    wait_tpu 60 || exit 1
else
    echo "$(date -u +%T) no ckpt — skipping A/Bs [5-7/9]"
fi

# --- [8/9] builder-local bench captures of the candidate stacks ----------------
echo "$(date -u +%T) [8/9] bench.py candidate captures (nq=1000)"
{
    echo "== default (r3 modes) =="
    timeout 3600 python bench.py
    echo "== pad128 (parity) =="
    BENCH_SPAN_SIM_PAD_L=128 timeout 3600 python bench.py
    echo "== pad128 + bf16 sim (parity-ish) =="
    BENCH_SPAN_SIM_PAD_L=128 BENCH_SPAN_SCORE_MODE=simsweep_cat_bf16 \
        timeout 3600 python bench.py
    echo "== approx stack rt=0.95 =="
    BENCH_SPAN_TOPK_MODE=grouped_shift_approx BENCH_VIDEO_TOPK_APPROX=1 \
        BENCH_TOPK_RECALL=0.95 timeout 3600 python bench.py
    echo "== pad128 bf16 + approx stack rt=0.95 =="
    BENCH_SPAN_SIM_PAD_L=128 BENCH_SPAN_SCORE_MODE=simsweep_cat_bf16 \
        BENCH_SPAN_TOPK_MODE=grouped_shift_approx BENCH_VIDEO_TOPK_APPROX=1 \
        BENCH_TOPK_RECALL=0.95 timeout 3600 python bench.py
} > "$LOGDIR/bench_candidates.log" 2>&1
echo "  exit=$?"
wait_tpu 60 || exit 1

# --- [9/9] fixed MFU ledger at bench batch --------------------------------------
echo "$(date -u +%T) [9/9] stage profiler (qbsz=1000, OOM-fixed)"
timeout 3600 python scripts/profile_engine_stages.py 1000 > "$LOGDIR/stages1000.log" 2>&1
echo "  exit=$?"

echo "$(date -u +%T) queue done (4h)"
