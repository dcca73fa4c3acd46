#!/bin/bash
# Round-4i serialized TPU queue — replaces 4h, which was killed after it
# ended up sharing the chip with the 4g retrain it had forgotten about
# (4g's setsid'd retrain survived 4g's death; two TPU jobs at once wedge
# the relay — CLAUDE.md). 4i ADOPTS the live retrain (pgid in
# $RETRAIN_PGID if still alive) instead of launching a duplicate, then
# runs the diagnostics, fresh-ckpt A/Bs, bench captures, and the stage
# ledger. span_parts is OOM-fixed again (bf16 SIM3 — the f32 gather needs
# a full 10.4 GiB layout copy, 4h step-1 log).
#   setsid nohup bash scripts/round4i_tpu_queue.sh > results_scale/q4c_logs/driver4i.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export AXON_JOURNAL_COMPACT=1

LOGDIR=results_scale/q4c_logs
CKPT_DIR=results_scale/tvr-tvrscale-r4b
ELOG="$CKPT_DIR/eval.log.txt"
RETRAIN_PGID=${RETRAIN_PGID:-31807}

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

retrain_done() {
    grep -q "^\[epoch 9\]" "$ELOG" 2>/dev/null && [ -d "$CKPT_DIR/ckpt" ]
}

# --- [1/10] adopt the live retrain -------------------------------------------
retrain_ok=0
if retrain_done; then
    echo "$(date -u +%T) [1/10] retrain already complete"
    retrain_ok=1
elif kill -0 "$RETRAIN_PGID" 2>/dev/null; then
    echo "$(date -u +%T) [1/10] adopting live retrain pgid=$RETRAIN_PGID"
    for i in $(seq 1 120); do
        if grep -q "^\[epoch 9\]" "$ELOG" 2>/dev/null; then
            echo "  epoch-9 eval logged; letting ckpt saves settle"
            sleep 90
            kill -- -"$RETRAIN_PGID" 2>/dev/null
            sleep 10
            kill -9 -- -"$RETRAIN_PGID" 2>/dev/null
            retrain_ok=1
            break
        fi
        kill -0 "$RETRAIN_PGID" 2>/dev/null || break
        sleep 60
    done
fi
# (re)launch with resume if the adopted run died short of epoch 9
for attempt in 3 4 5 6; do
    [ "$retrain_ok" = 1 ] && break
    if [ -d "$CKPT_DIR/ckpt" ]; then
        last_ep=$(grep -o "^\[epoch [0-9]*\]" "$ELOG" 2>/dev/null \
                  | tail -1 | grep -o "[0-9]*")
        if [ "${last_ep:-0}" -ge 6 ]; then retrain_ok=1; break; fi
    fi
    wait_tpu 120 || exit 1
    resume_args=()
    [ -d "$CKPT_DIR/ckpt" ] && resume_args=(--resume "$CKPT_DIR/ckpt")
    echo "$(date -u +%T) [1/10] retrain attempt $attempt ${resume_args[*]:-}"
    setsid bash scripts/train_xml_tvr_scale_synthetic.sh results_scale \
        --exp_id tvrscale-r4b "${resume_args[@]}" \
        > "$LOGDIR/retrain_e$attempt.log" 2>&1 &
    RPID=$!
    for i in $(seq 1 110); do
        kill -0 "$RPID" 2>/dev/null || break
        if grep -q "^\[epoch 9\]" "$ELOG" 2>/dev/null; then
            echo "  epoch-9 eval logged; letting ckpt saves settle"
            sleep 90
            retrain_ok=1
            break
        fi
        sleep 60
    done
    kill -- -"$RPID" 2>/dev/null; sleep 10; kill -9 -- -"$RPID" 2>/dev/null
done
if [ "$retrain_ok" != 1 ] || [ ! -d "$CKPT_DIR/ckpt" ]; then
    echo "$(date -u +%T) retrain FAILED — continuing to non-ckpt steps"
fi
wait_tpu 120 || exit 1

# --- [2/10] span-sweep decomposition (bf16-SIM OOM fix) ----------------------
echo "$(date -u +%T) [2/10] span-sweep decomposition (nq=1000)"
timeout 5400 python scripts/measure_span_sweep_parts.py 1000 \
    > "$LOGDIR/span_parts2.log" 2>&1
echo "  exit=$?"
wait_tpu 120 || exit 1

# --- [3/10] engine-mode ref baseline -----------------------------------------
echo "$(date -u +%T) [3/10] engine_modes ref baseline (nq=1000)"
timeout 5400 python -m tvretrieval_tpu.profiling.engine_modes --nq 1000 \
    --modes simsweep_cat/pallas_int8/grouped_shift \
    > "$LOGDIR/modes_ref1000.log" 2>&1
echo "  exit=$?"
wait_tpu 60 || exit 1

# --- [4/10] pad128 candidates (separate invocation: the unpadded ref
# combo's sweep temps cannot coexist with both cat caches) ---------------------
echo "$(date -u +%T) [4/10] engine_modes pad128 combos (nq=1000)"
timeout 5400 python -m tvretrieval_tpu.profiling.engine_modes --nq 1000 \
    --modes simsweep_cat/pallas_int8/grouped_shift/pad128 \
            simsweep_cat_bf16/pallas_int8/grouped_shift/pad128 \
            simsweep_cat_bf16/pallas_int8/grouped_shift_approx/vapprox/rt0.95/pad128 \
    > "$LOGDIR/modes_pad128.log" 2>&1
echo "  exit=$?"
wait_tpu 120 || exit 1

# --- [5/10] video-kernel chunk_v sweep ----------------------------------------
echo "$(date -u +%T) [5/10] video-kernel chunk_v sweep (nq=1000)"
timeout 5400 python scripts/measure_video_kernel_chunks.py 1000 \
    > "$LOGDIR/chunks2.log" 2>&1
echo "  exit=$?"
wait_tpu 120 || exit 1

# --- [6-8/10] fresh-ckpt A/Bs --------------------------------------------------
if [ -d "$CKPT_DIR/ckpt" ]; then
    echo "$(date -u +%T) [6/10] A/B parity mode"
    timeout 3600 python -m tvretrieval_tpu.retrieval.inference_xml \
        --model_dir "$CKPT_DIR" --tasks VCMR SVMR VR \
        --eval_id ab_parity_r4b \
        > "$LOGDIR/ab_parity.log" 2>&1
    echo "  exit=$?"
    wait_tpu 60 || exit 1

    echo "$(date -u +%T) [7/10] A/B approx stack rt=0.95"
    timeout 3600 python -m tvretrieval_tpu.retrieval.inference_xml \
        --model_dir "$CKPT_DIR" --tasks VCMR SVMR VR \
        --span_topk_mode grouped_shift_approx --video_topk_approx 1 \
        --topk_approx_recall 0.95 \
        --eval_id ab_approx_rt95 \
        > "$LOGDIR/ab_rt95.log" 2>&1
    echo "  exit=$?"
    wait_tpu 60 || exit 1

    echo "$(date -u +%T) [8/10] A/B approx stack rt=0.90"
    timeout 3600 python -m tvretrieval_tpu.retrieval.inference_xml \
        --model_dir "$CKPT_DIR" --tasks VCMR SVMR VR \
        --span_topk_mode grouped_shift_approx --video_topk_approx 1 \
        --topk_approx_recall 0.90 \
        --eval_id ab_approx_rt90 \
        > "$LOGDIR/ab_rt90.log" 2>&1
    echo "  exit=$?"
    wait_tpu 60 || exit 1
else
    echo "$(date -u +%T) no ckpt — skipping A/Bs [6-8/10]"
fi

# --- [9/10] builder-local bench captures of the candidate stacks ---------------
echo "$(date -u +%T) [9/10] bench.py candidate captures (nq=1000)"
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

# --- [10/10] fixed MFU ledger at bench batch ------------------------------------
echo "$(date -u +%T) [10/10] stage profiler (qbsz=1000, OOM-fixed)"
timeout 3600 python scripts/profile_engine_stages.py 1000 > "$LOGDIR/stages1000.log" 2>&1
echo "  exit=$?"

echo "$(date -u +%T) queue done (4i)"
