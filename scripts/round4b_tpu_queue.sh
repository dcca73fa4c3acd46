#!/bin/bash
# Round-4b serialized TPU measurement queue — runs after round4_tpu_queue.sh
# (waits for its "queue done" line in /tmp/q4_driver.log). One TPU job at a
# time. Launch with
#   setsid nohup bash scripts/round4b_tpu_queue.sh > /tmp/q4b_driver.log 2>&1 &
#
# Queue:
#   1. approx-top-k stage measurement           -> /tmp/q4b_topk.log
#      (lax.approx_max_k vs exact selectors at the three bench shapes)
#   2. engine_modes: fused + approx combos      -> /tmp/q4b_modes.log
#      (the round-4 candidates the first queue's crashed step never
#       measured: fused video top-k after the Mosaic fix, vapprox,
#       grouped_shift_approx — each vs the round-3 headline mode)
#   3. stage profiler with the MFU ledger       -> /tmp/q4b_stages.log
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export AXON_JOURNAL_COMPACT=1

echo "$(date -u +%T) waiting for round4 queue to finish..."
for i in $(seq 1 720); do
    grep -q "queue done" /tmp/q4_driver.log 2>/dev/null && break
    sleep 30
done
grep -q "queue done" /tmp/q4_driver.log || { echo "round4 queue never finished"; exit 1; }

probe() {
    timeout 120 python -c "
import jax, jax.numpy as jnp
jax.device_get((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0])
print('TPU_OK')" 2>/dev/null | grep -q TPU_OK
}
echo "$(date -u +%T) waiting for TPU..."
for i in $(seq 1 120); do
    if probe; then echo "$(date -u +%T) TPU up (probe $i)"; break; fi
    sleep 60
done
probe || { echo "TPU never recovered; giving up"; exit 1; }

echo "$(date -u +%T) [1/3] approx top-k stage measurement"
timeout 2400 python scripts/measure_topk_approx.py > /tmp/q4b_topk.log 2>&1
echo "  exit=$?"

echo "$(date -u +%T) [2/3] engine_modes: fused + approx combos"
timeout 6000 python -m tvretrieval_tpu.profiling.engine_modes --nq 800 \
    --iters 8 --modes \
    simsweep_cat/pallas_int8/grouped_shift \
    simsweep_cat/pallas_int8/grouped_shift/fused \
    simsweep_cat/pallas_int8/grouped_shift_approx/fused \
    simsweep_cat/pallas_int8/grouped_shift_approx/vapprox \
    simsweep_cat/pallas_int8/grouped_shift/preexp \
    > /tmp/q4b_modes.log 2>&1
echo "  exit=$?"

echo "$(date -u +%T) [3/3] stage profiler (MFU ledger)"
timeout 3600 python scripts/profile_engine_stages.py 800 > /tmp/q4b_stages.log 2>&1
echo "  exit=$?"

echo "$(date -u +%T) queue done"
