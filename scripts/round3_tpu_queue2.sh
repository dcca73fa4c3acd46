#!/bin/bash
# Round-3 TPU queue, reordered for a short session: the headline-deciding
# measurements run first (engine_modes int8 combos -> trained-ckpt A/B of
# the int8 sweep mode), then the standalone studies. One TPU job at a time.
# Logs to /tmp/q3_*.log; launch via the Bash tool in background.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export AXON_JOURNAL_COMPACT=1

probe() {
    timeout 90 python -c "
import jax, jax.numpy as jnp
jax.device_get((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0])
print('TPU_OK')" 2>/dev/null | grep -q TPU_OK
}

for i in $(seq 1 60); do
    if probe; then echo "$(date -u +%T) TPU up (probe $i)"; break; fi
    sleep 30
done
probe || { echo "TPU never recovered; giving up"; exit 1; }

echo "$(date -u +%T) [1/4] engine_modes int8 combos"
timeout 3600 python -m tvretrieval_tpu.profiling.engine_modes --nq 800 \
    --iters 8 --modes \
    simsweep_cat/pallas_int8/grouped_shift \
    simsweep_cat_int8/pallas_int8/grouped_shift \
    > /tmp/q3_modes_int8.log 2>&1
echo "  exit=$?"

echo "$(date -u +%T) [2/4] trained-checkpoint A/B (simsweep_cat_int8)"
timeout 5400 python -m tvretrieval_tpu.retrieval.inference_xml \
    --model_dir results_scale/tvr-tvrscale --tasks VCMR SVMR VR \
    --span_score_mode simsweep_cat_int8 --video_score_mode pallas_int8 \
    --span_topk_mode grouped_shift --eval_id ab_int8sweep \
    > /tmp/q3_ab_int8sweep.log 2>&1
echo "  exit=$?"

echo "$(date -u +%T) [3/4] int8 sweep study"
timeout 2400 python scripts/measure_int8_sweep.py 400 101 \
    > /tmp/q3_int8_sweep.log 2>&1
echo "  exit=$?"

echo "$(date -u +%T) [4/4] streaming block study"
timeout 2400 python scripts/measure_streaming_block.py 800 \
    > /tmp/q3_stream_block.log 2>&1
echo "  exit=$?"

echo "$(date -u +%T) queue done"
