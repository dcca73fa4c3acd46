"""MEE training driver (video retrieval baseline).

Reference: mixture_embedding_experts/train.py — plain Adam + per-epoch
ExponentialLR(0.95), early stop on VR r1+r5+r10+r100... (reference uses the
VR metrics via eval_epoch; we stop on VR r1+r5 like its stop_task="VR").
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import time
from typing import List, Optional

import optax

logger = logging.getLogger(__name__)


def build_arg_parser():
    p = argparse.ArgumentParser(description="Train MEE (TPU-native)")
    p.add_argument("--dset_name", type=str, default="tvr")
    p.add_argument("--eval_split_name", type=str, default="val")
    p.add_argument("--results_root", type=str, default="results")
    p.add_argument("--exp_id", type=str, default=None)
    p.add_argument("--seed", type=int, default=2018)
    p.add_argument("--data_ratio", type=float, default=1.0,
                   help="train/eval on a fraction of the data (reference config.py:29-32)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_videos", type=int, default=64)
    p.add_argument("--synthetic_queries", type=int, default=256)
    p.add_argument("--train_path", type=str, default=None)
    p.add_argument("--eval_path", type=str, default=None)
    p.add_argument("--desc_bert_path", type=str, default=None)
    p.add_argument("--sub_bert_path", type=str, default=None)
    p.add_argument("--vid_feat_path", type=str, default=None)
    p.add_argument("--video_duration_idx_path", type=str, default=None)
    p.add_argument("--ctx_mode", type=str, default="video_sub")
    p.add_argument("--max_desc_l", type=int, default=30)
    p.add_argument("--max_ctx_l", type=int, default=100)
    p.add_argument("--output_size", type=int, default=256)
    p.add_argument("--margin", type=float, default=0.2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--wd", type=float, default=0.0)
    p.add_argument("--n_epoch", type=int, default=50)
    p.add_argument("--bsz", type=int, default=128)
    p.add_argument("--max_es_cnt", type=int, default=10)
    p.add_argument("--es_min_delta", type=float, default=0.0,
                   help="patience resets only when the stop metric improves "
                        "by MORE than this; 0 = reference behavior")
    p.add_argument("--eval_query_bsz", type=int, default=1000)
    p.add_argument("--eval_ctx_bsz", type=int, default=200)
    return p


def setup_world(args):
    from tvretrieval_tpu.data.datasets import CorpusIndex, load_annotations
    from tvretrieval_tpu.data.features import H5FeatureSource
    from tvretrieval_tpu.data.retrieval_datasets import MEEExampleBuilder

    if args.synthetic:
        from tvretrieval_tpu.data.synthetic import make_synthetic_world
        world = make_synthetic_world(n_videos=args.synthetic_videos,
                                     n_queries=args.synthetic_queries,
                                     seed=args.seed)
        n_train = int(len(world.annotations) * 0.75)
        builder = MEEExampleBuilder(
            query_source=world.query_source, video_source=world.video_source,
            sub_source=world.sub_source, ctx_mode=args.ctx_mode,
            max_desc_l=args.max_desc_l, max_ctx_l=args.max_ctx_l)
        return (world.annotations[:n_train], world.annotations[n_train:],
                builder, world.corpus)
    builder = MEEExampleBuilder(
        query_source=H5FeatureSource(args.desc_bert_path),
        video_source=(H5FeatureSource(args.vid_feat_path)
                      if "video" in args.ctx_mode else None),
        sub_source=(H5FeatureSource(args.sub_bert_path)
                    if "sub" in args.ctx_mode else None),
        ctx_mode=args.ctx_mode, max_desc_l=args.max_desc_l,
        max_ctx_l=args.max_ctx_l)
    corpus = CorpusIndex.from_video_duration_idx(
        args.video_duration_idx_path, args.eval_split_name)
    return (load_annotations(args.train_path, args.data_ratio),
            load_annotations(args.eval_path, args.data_ratio)
            if args.eval_path else [],
            builder, corpus)


def start_training(argv: Optional[List[str]] = None) -> dict:
    from tvretrieval_tpu.evaluation.metrics import eval_retrieval_arrays
    from tvretrieval_tpu.evaluation.submission import submission_top_n
    from tvretrieval_tpu.models.mee import MEE, MEEConfig
    from tvretrieval_tpu.retrieval.vr_engine import mee_retrieve_vr
    from tvretrieval_tpu.training.generic import GenericTrainer
    from tvretrieval_tpu.utils.io import save_json

    logging.basicConfig(level=logging.INFO, force=True,
                        format="%(asctime)s:%(levelname)s:%(name)s - %(message)s")
    args = build_arg_parser().parse_args(argv)
    exp_id = args.exp_id or time.strftime("%Y%m%d_%H%M%S")
    results_dir = os.path.join(args.results_root, f"{args.dset_name}-mee-{exp_id}")
    os.makedirs(results_dir, exist_ok=True)
    save_json(vars(args), os.path.join(results_dir, "opt.json"), pretty=True)

    train_rows, eval_rows, builder, corpus = setup_world(args)
    cfg = MEEConfig(
        ctx_mode=args.ctx_mode,
        text_input_size=builder.query_source.dim,
        vid_input_size=builder.video_source.dim if builder.use_video else 2,
        output_size=args.output_size, margin=args.margin)
    model = MEE(cfg)

    steps_per_epoch = max(len(train_rows) // args.bsz, 1)
    schedule = optax.exponential_decay(
        args.lr, transition_steps=steps_per_epoch, decay_rate=0.95,
        staircase=True)
    tx = optax.adam(schedule) if args.wd == 0 else optax.adamw(schedule, weight_decay=args.wd)

    def loss_apply(model, variables, batch, rngs, train):
        loss, new_state = model.apply(variables, **batch, train=train,
                                      mutable=["batch_stats"], rngs=rngs)
        return loss, {"loss_overall": loss}, new_state

    trainer = GenericTrainer(model, tx, builder.build_train_batch, train_rows,
                             args.bsz, args.seed, loss_apply=loss_apply,
                             rng_names=())

    from tvretrieval_tpu.training.checkpoint import save_checkpoint
    from tvretrieval_tpu.utils.logging import MetricsLogger
    metrics_logger = MetricsLogger(results_dir)
    from tvretrieval_tpu.training.early_stop import EarlyStopper
    stopper = EarlyStopper(max_es_cnt=args.max_es_cnt,
                           min_delta=args.es_min_delta, best=-1.0)
    best_metrics = None
    for epoch in range(args.n_epoch):
        losses = trainer.train_epoch(epoch)
        metrics_logger.scalars("train", losses,
                               (epoch + 1) * trainer.steps_per_epoch)
        logger.info("epoch %d loss %.4f", epoch, losses["loss"])
        if not eval_rows:
            continue
        # array-path per-epoch eval (no prediction dicts); the dict
        # submission is built only when a new best is found
        arrays = mee_retrieve_vr(model, trainer.variables(), builder, corpus,
                                 eval_rows, ctx_bsz=args.eval_ctx_bsz,
                                 query_bsz=args.eval_query_bsz,
                                 return_arrays=True)
        metrics = eval_retrieval_arrays(
            eval_rows, corpus.video2idx, vr=arrays["VR"][0],
            use_desc_type=args.dset_name == "tvr")
        stop_score = metrics["VR"]["r1"] + metrics["VR"]["r5"]
        logger.info("epoch %d VR %s", epoch, json.dumps(metrics["VR"]))
        is_best, should_stop = stopper.update(stop_score)
        if is_best:
            best_metrics = metrics
            vid_idx, scores = arrays["VR"]
            submission = {"video2idx": corpus.video2idx, "VR": [
                {"desc_id": r["desc_id"], "desc": r.get("desc", ""),
                 "predictions": [[int(v), 0, 0, float(s)] for v, s in
                                 zip(vid_idx[qi], scores[qi])]}
                for qi, r in enumerate(eval_rows)]}
            submission = submission_top_n(submission, 100)
            save_json(submission,
                      os.path.join(results_dir, "best_predictions.json"))
            save_json(metrics,
                      os.path.join(results_dir, "best_predictions_metrics.json"),
                      pretty=True)
            # checkpoint the FULL variables (params + BatchNorm running stats)
            save_checkpoint(os.path.join(results_dir, "ckpt"),
                            trainer.variables(), trainer.opt_state, cfg, epoch)
        if should_stop:
            logger.info("early stop at epoch %d", epoch)
            break
    metrics_logger.close()
    return {"results_dir": results_dir, "best_metrics": best_metrics}


if __name__ == "__main__":
    start_training()
