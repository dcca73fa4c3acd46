#!/bin/bash
# Round-5e TPU queue: trained-checkpoint A/B of the COMPLETE shipped
# stack (bf16 cat sim + pad128 + int8 video kernel + approx selection at
# rt=0.90) — prior A/Bs gated each approximation separately on the saved
# training modes; this closes the composition gap. Then a final
# driver-contract pass (entry + bench) with the shipped defaults.
#   setsid nohup bash scripts/round5e_tpu_queue.sh > results_scale/q5_logs/driver5e.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export AXON_JOURNAL_COMPACT=1
LOGDIR=results_scale/q5_logs
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

echo "$(date -u +%T) [1/3] A/B: complete shipped stack (bf16 sim + pad128 + int8 video + approx rt0.90)"
timeout 3600 python -m tvretrieval_tpu.retrieval.inference_xml \
    --model_dir "$CKPT_DIR" --tasks VCMR SVMR VR \
    --span_score_mode simsweep_cat_bf16 --span_sim_pad_l 128 \
    --video_score_mode pallas_int8 \
    --span_topk_mode grouped_shift_approx --video_topk_approx 1 \
    --topk_approx_recall 0.90 \
    --eval_id ab_shipped_stack_r5 \
    > "$LOGDIR/ab_shipped_r5.log" 2>&1
echo "  exit=$?"
wait_tpu 60 || exit 1

echo "$(date -u +%T) [2/3] driver contract: entry()"
timeout 3600 python __graft_entry__.py > "$LOGDIR/entry_r5.log" 2>&1
echo "  exit=$?"
wait_tpu 60 || exit 1

echo "$(date -u +%T) [3/3] final bench capture (shipped defaults)"
timeout 3600 python bench.py > "$LOGDIR/bench_final_r5.log" 2>&1
echo "  exit=$?"
echo "$(date -u +%T) queue done (5e)"
