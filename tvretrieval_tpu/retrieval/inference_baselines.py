"""Standalone inference drivers for the baseline models.

Mirrors each reference baseline's ``start_inference`` (mixture_embedding_
experts/inference.py, clip_alignment_with_language/inference.py:631,
excl/inference.py + inference_with_vcmr.py): reload the run's opt.json,
rebuild the model from its checkpoint, run the corpus engine and the
evaluator.

Usage:
    python -m tvretrieval_tpu.retrieval.inference_baselines \
        --model_type mee --model_dir results/tvr-mee-demo
    python -m tvretrieval_tpu.retrieval.inference_baselines \
        --model_type cal --model_dir results/tvr-cal-demo --nms_thd 0.5
    python -m tvretrieval_tpu.retrieval.inference_baselines \
        --model_type excl --model_dir results/tvr-excl-demo \
        [--external_inference_vr_res_path vr.json]
"""
from __future__ import annotations

import argparse
import json
import logging
import os
from typing import List, Optional

logger = logging.getLogger(__name__)


def build_arg_parser():
    p = argparse.ArgumentParser(description="baseline corpus inference")
    p.add_argument("--model_type", type=str, required=True,
                   choices=["mee", "cal", "mcn", "excl"])
    p.add_argument("--model_dir", type=str, required=True)
    p.add_argument("--eval_split_name", type=str, default=None)
    p.add_argument("--eval_path", type=str, default=None)
    p.add_argument("--nms_thd", type=float, default=-1.0)
    p.add_argument("--external_inference_vr_res_path", type=str, default=None)
    p.add_argument("--proposal_cache_path", type=str, default=None,
                   help="CAL: load/save the encoded proposal corpus here")
    p.add_argument("--eval_id", type=str, default="standalone")
    return p


def start_inference(argv: Optional[List[str]] = None) -> dict:
    from tvretrieval_tpu.evaluation.metrics import eval_retrieval
    from tvretrieval_tpu.evaluation.nms import POST_PROCESSING_NMS_FUNC
    from tvretrieval_tpu.evaluation.submission import submission_top_n
    from tvretrieval_tpu.training.checkpoint import load_checkpoint
    from tvretrieval_tpu.utils.io import load_json, save_json

    logging.basicConfig(level=logging.INFO, force=True,
                        format="%(asctime)s:%(levelname)s:%(name)s - %(message)s")
    cli = build_arg_parser().parse_args(argv)
    saved = load_json(os.path.join(cli.model_dir, "opt.json"))
    for k in ("eval_split_name", "eval_path"):
        if getattr(cli, k) is not None:
            saved[k] = getattr(cli, k)
    args = argparse.Namespace(**saved)
    params, _, cfg_dict, epoch = load_checkpoint(os.path.join(cli.model_dir, "ckpt"))
    variables = {"params": params}
    logger.info("loaded %s checkpoint from epoch %d", cli.model_type, epoch)

    if cli.model_type == "mee":
        from tvretrieval_tpu.models.mee import MEE, MEEConfig
        from tvretrieval_tpu.retrieval.vr_engine import mee_retrieve_vr
        from tvretrieval_tpu.training.train_mee import setup_world
        _, eval_rows, builder, corpus = setup_world(args)
        model = MEE(MEEConfig(**cfg_dict))
        # MEE checkpoints store the FULL variables dict (params + BatchNorm
        # running stats) in the params slot
        variables = params if "params" in params else variables
        raw = mee_retrieve_vr(model, variables, builder, corpus, eval_rows,
                              ctx_bsz=args.eval_ctx_bsz,
                              query_bsz=args.eval_query_bsz)
    elif cli.model_type in ("cal", "mcn"):
        from tvretrieval_tpu.models.cal import CALConfig, CALWithSub
        from tvretrieval_tpu.retrieval.proposal_engine import (
            cal_retrieve, encode_proposal_corpus, load_proposal_cache,
            save_proposal_cache)
        from tvretrieval_tpu.training.train_cal import setup_world
        _, eval_rows, builder, corpus = setup_world(args)
        model = CALWithSub(CALConfig(**cfg_dict))
        if cli.proposal_cache_path and os.path.exists(cli.proposal_cache_path):
            cache = load_proposal_cache(cli.proposal_cache_path)
            logger.info("loaded proposal cache from %s", cli.proposal_cache_path)
        else:
            cache = encode_proposal_corpus(model, variables, builder, corpus,
                                           dset_name=args.dset_name)
            if cli.proposal_cache_path:
                save_proposal_cache(cache, cli.proposal_cache_path)
        raw = cal_retrieve(model, variables, builder, cache, corpus, eval_rows,
                           tasks=("VCMR", "SVMR"),
                           query_bsz=args.eval_query_bsz,
                           max_before_nms=args.max_before_nms)
    else:  # excl
        from tvretrieval_tpu.models.excl import ExCL, ExCLConfig
        from tvretrieval_tpu.retrieval.excl_engine import (
            excl_retrieve_svmr, excl_retrieve_vcmr_with_external_vr)
        from tvretrieval_tpu.training.train_excl import setup_world
        _, eval_rows, builder, corpus = setup_world(args)
        model = ExCL(ExCLConfig(**cfg_dict))
        raw = excl_retrieve_svmr(
            model, variables, builder, corpus, eval_rows,
            clip_length=args.clip_length, query_bsz=args.eval_query_bsz,
            min_pred_l=args.min_pred_l, max_pred_l=args.max_pred_l)
        ext = (cli.external_inference_vr_res_path
               or getattr(args, "external_inference_vr_res_path", None))
        if ext:
            raw.update(excl_retrieve_vcmr_with_external_vr(
                model, variables, builder, corpus, eval_rows, ext,
                clip_length=args.clip_length, q2c_alpha=args.q2c_alpha,
                min_pred_l=args.min_pred_l, max_pred_l=args.max_pred_l))

    raw["video2idx"] = corpus.video2idx
    submission = submission_top_n(raw, 100)
    tag = f"inference_{args.dset_name}_{args.eval_split_name}_{cli.eval_id}"
    sub_path = os.path.join(cli.model_dir, f"{tag}_predictions.json")
    save_json(submission, sub_path)
    metrics = eval_retrieval(submission, eval_rows,
                             use_desc_type=args.dset_name == "tvr")
    save_json(metrics, sub_path.replace(".json", "_metrics.json"), pretty=True)
    logger.info("metrics: %s", json.dumps(
        {k: v for k, v in metrics.items() if not k.endswith("by_type")}, indent=2))

    if cli.nms_thd != -1:
        after = {"video2idx": raw["video2idx"]}
        for task, fn in POST_PROCESSING_NMS_FUNC.items():
            if task in raw:
                after[task] = fn(raw[task], nms_thd=cli.nms_thd)
        nms_path = sub_path.replace(".json", f"_nms_{cli.nms_thd}.json")
        save_json(after, nms_path)
        metrics_nms = eval_retrieval(after, eval_rows,
                                     use_desc_type=args.dset_name == "tvr")
        save_json(metrics_nms, nms_path.replace(".json", "_metrics.json"),
                  pretty=True)
    return {"metrics": metrics, "submission_path": sub_path}


if __name__ == "__main__":
    start_inference()
