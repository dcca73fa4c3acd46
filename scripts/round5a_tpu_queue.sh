#!/bin/bash
# Round-5a serialized TPU queue — VERDICT round-4 items 2 and 5:
# reconcile the engine_modes-vs-bench harness discrepancy on the approx
# stack (same config measured 63.35 ms by engine_modes in a 3-combo
# process vs 48.75 ms by bench.py in a fresh process), then capture the
# PROFILE_PAD128 MFU ledger so the post-pad128 stage budget is measured.
#   setsid nohup bash scripts/round5a_tpu_queue.sh > results_scale/q5_logs/driver5a.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export AXON_JOURNAL_COMPACT=1

LOGDIR=results_scale/q5_logs
mkdir -p "$LOGDIR"

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

APPROX=simsweep_cat_bf16/pallas_int8/grouped_shift_approx/vapprox/rt0.95/pad128
PARITY=simsweep_cat/pallas_int8/grouped_shift/pad128

# --- [1/5] approx stack ALONE in a fresh process (bench-like residency) -------
echo "$(date -u +%T) [1/5] engine_modes approx combo, fresh single-combo process"
timeout 5400 python -m tvretrieval_tpu.profiling.engine_modes --nq 1000 \
    --modes "$APPROX" > "$LOGDIR/modes_approx_solo.log" 2>&1
echo "  exit=$?"
wait_tpu 60 || exit 1

# --- [2/5] exact replication of the round-4 3-combo process -------------------
echo "$(date -u +%T) [2/5] engine_modes 3-combo replication (r4 modes_pad128 order)"
timeout 5400 python -m tvretrieval_tpu.profiling.engine_modes --nq 1000 \
    --modes "$PARITY" \
            simsweep_cat_bf16/pallas_int8/grouped_shift/pad128 \
            "$APPROX" \
    > "$LOGDIR/modes_pad128_repl.log" 2>&1
echo "  exit=$?"
wait_tpu 60 || exit 1

# --- [3/5] 3-combo process with the approx combo FIRST ------------------------
# If order (not combo count) drives the gap, approx-first should be fast
# and the parity combos should still match their solo numbers.
echo "$(date -u +%T) [3/5] engine_modes 3-combo, approx first"
timeout 5400 python -m tvretrieval_tpu.profiling.engine_modes --nq 1000 \
    --modes "$APPROX" \
            simsweep_cat_bf16/pallas_int8/grouped_shift/pad128 \
            "$PARITY" \
    > "$LOGDIR/modes_pad128_approx_first.log" 2>&1
echo "  exit=$?"
wait_tpu 60 || exit 1

# --- [4/5] bench.py capture of the approx stack (fresh, today) ----------------
echo "$(date -u +%T) [4/5] bench.py approx-stack capture"
{
    echo "== pad128 default (ships) =="
    timeout 3600 python bench.py
    echo "== pad128 bf16 + approx stack rt=0.95 =="
    BENCH_SPAN_SCORE_MODE=simsweep_cat_bf16 \
        BENCH_SPAN_TOPK_MODE=grouped_shift_approx BENCH_VIDEO_TOPK_APPROX=1 \
        BENCH_TOPK_RECALL=0.95 timeout 3600 python bench.py
} > "$LOGDIR/bench_r5_candidates.log" 2>&1
echo "  exit=$?"
wait_tpu 60 || exit 1

# --- [5/5] PROFILE_PAD128 stage ledger (VERDICT item 5) -----------------------
echo "$(date -u +%T) [5/5] PROFILE_PAD128 stage ledger (qbsz=1000)"
PROFILE_PAD128=1 timeout 3600 python scripts/profile_engine_stages.py 1000 \
    > "$LOGDIR/stages1000_pad128.log" 2>&1
echo "  exit=$?"

echo "$(date -u +%T) queue done (5a)"
