#!/bin/bash
# Round-5f TPU queue: fresh round-5 retrain (reproducibility evidence for
# the committed recipe) + parity and shipped-stack A/Bs on the NEW
# checkpoint. World pickle was lost to VM restarts; generation (~25 min
# of 1-core numpy) rebuilds and re-caches it.
#   setsid nohup bash scripts/round5f_tpu_queue.sh > results_scale/q5_logs/driver5f.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export AXON_JOURNAL_COMPACT=1
LOGDIR=results_scale/q5_logs
CKPT_DIR=results_scale/tvr-tvrscale-r5

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

echo "$(date -u +%T) [1/3] retrain (exp_id tvrscale-r5, committed recipe)"
timeout 10800 bash scripts/train_xml_tvr_scale_synthetic.sh results_scale \
    --exp_id tvrscale-r5 > "$LOGDIR/retrain_r5.log" 2>&1
echo "  exit=$?"
wait_tpu 120 || exit 1

if [ -d "$CKPT_DIR/ckpt" ]; then
    echo "$(date -u +%T) [2/3] A/B parity modes (fresh r5 ckpt)"
    timeout 3600 python -m tvretrieval_tpu.retrieval.inference_xml \
        --model_dir "$CKPT_DIR" --tasks VCMR SVMR VR \
        --eval_id ab_parity_r5 \
        > "$LOGDIR/ab_parity_r5.log" 2>&1
    echo "  exit=$?"
    wait_tpu 60 || exit 1

    echo "$(date -u +%T) [3/3] A/B complete shipped stack (fresh r5 ckpt)"
    timeout 3600 python -m tvretrieval_tpu.retrieval.inference_xml \
        --model_dir "$CKPT_DIR" --tasks VCMR SVMR VR \
        --span_score_mode simsweep_cat_bf16 --span_sim_pad_l 128 \
        --video_score_mode pallas_int8 \
        --span_topk_mode grouped_shift_approx --video_topk_approx 1 \
        --topk_approx_recall 0.90 \
        --eval_id ab_shipped_stack_r5ckpt \
        > "$LOGDIR/ab_shipped_r5ckpt.log" 2>&1
    echo "  exit=$?"
else
    echo "$(date -u +%T) no ckpt produced — skipping A/Bs"
fi
echo "$(date -u +%T) queue done (5f)"
