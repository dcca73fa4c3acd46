#!/bin/bash
# Round-4f serialized TPU queue — diagnostics that decide the NEXT span/video
# kernel move. Runs after round4e_tpu_queue.sh ("queue done (4e)").
#   1. span-sweep stage decomposition (dot / materialize / gather / conv)
#   2. video-kernel chunk_v sweep (int8 + bf16)
#   setsid nohup bash scripts/round4f_tpu_queue.sh > results_scale/q4c_logs/driver4f.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export AXON_JOURNAL_COMPACT=1

LOGDIR=results_scale/q4c_logs

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

echo "$(date -u +%T) waiting for round4e queue to finish..."
for i in $(seq 1 960); do
    grep -q "queue done (4e)" "$LOGDIR/driver4e.log" 2>/dev/null && break
    sleep 30
done
grep -q "queue done (4e)" "$LOGDIR/driver4e.log" || { echo "round4e never finished"; exit 1; }
wait_tpu 120 || exit 1

echo "$(date -u +%T) [1/2] span-sweep decomposition (nq=1000)"
timeout 5400 python scripts/measure_span_sweep_parts.py 1000 \
    > "$LOGDIR/span_parts.log" 2>&1
echo "  exit=$?"
wait_tpu 60 || exit 1

echo "$(date -u +%T) [2/2] video-kernel chunk_v sweep (nq=1000)"
timeout 5400 python scripts/measure_video_kernel_chunks.py 1000 \
    > "$LOGDIR/chunks.log" 2>&1
echo "  exit=$?"

echo "$(date -u +%T) queue done (4f)"
