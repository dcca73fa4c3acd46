#!/bin/bash
# Round-5d TPU queue: re-test the int8 flat span sweep against the NEW
# baseline. Round 4 measured simsweep_cat_int8_flat -8.9% vs the
# UNPADDED bf16 cat sweep; pad128 shipping changed the comparison — both
# layouts now carry the lp=128 pad, but the int8 dot runs at 2x the MXU
# rate, so the r4 negative may be stale.
#   setsid nohup bash scripts/round5d_tpu_queue.sh > results_scale/q5_logs/driver5d.log 2>&1 &
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

echo "$(date -u +%T) [1/1] engine_modes: int8-flat sweep vs shipped (nq=1000)"
timeout 5400 python -m tvretrieval_tpu.profiling.engine_modes --nq 1000 \
    --modes simsweep_cat_bf16/pallas_int8/grouped_shift_approx/vapprox/rt0.9/pad128 \
            simsweep_cat_int8_flat/pallas_int8/grouped_shift_approx/vapprox/rt0.9 \
            simsweep_cat_int8_flat/pallas_int8/grouped_shift \
    > "$LOGDIR/modes_int8flat_r5.log" 2>&1
echo "  exit=$?"
echo "$(date -u +%T) queue done (5d)"
