#!/bin/bash
# Round-5b TPU queue: tune the shipped approx stack — recall target 0.90
# (A/B already clean, results_scale/q4c_logs/ab_rt90.log) and query-batch
# sweep under the shipped defaults.
#   setsid nohup bash scripts/round5b_tpu_queue.sh > results_scale/q5_logs/driver5b.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export AXON_JOURNAL_COMPACT=1
LOGDIR=results_scale/q5_logs

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

echo "$(date -u +%T) [1/2] engine_modes recall sweep on the shipped stack"
timeout 5400 python -m tvretrieval_tpu.profiling.engine_modes --nq 1000 \
    --modes simsweep_cat_bf16/pallas_int8/grouped_shift_approx/vapprox/rt0.95/pad128 \
            simsweep_cat_bf16/pallas_int8/grouped_shift_approx/vapprox/rt0.9/pad128 \
            simsweep_cat_bf16/pallas_int8/grouped_shift_approx/vapprox/rt0.85/pad128 \
    > "$LOGDIR/modes_rt_sweep.log" 2>&1
echo "  exit=$?"
wait_tpu 60 || exit 1

echo "$(date -u +%T) [2/2] bench: rt0.90 + query-bsz sweep (shipped defaults)"
{
    echo "== shipped defaults rt0.95 qbsz=1000 =="
    timeout 3600 python bench.py
    echo "== rt0.90 =="
    BENCH_TOPK_RECALL=0.90 timeout 3600 python bench.py
    echo "== qbsz=800 =="
    BENCH_QUERY_BSZ=800 timeout 3600 python bench.py
    echo "== qbsz=1200 =="
    BENCH_QUERY_BSZ=1200 timeout 3600 python bench.py
} > "$LOGDIR/bench_r5b.log" 2>&1
echo "  exit=$?"
echo "$(date -u +%T) queue done (5b)"
