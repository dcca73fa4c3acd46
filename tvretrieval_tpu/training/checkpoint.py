"""Orbax checkpointing: params + optimizer state + model config + epoch.

The reference saves {"model": state_dict, "model_cfg", "epoch"} on metric
improvement, with no optimizer state (train.py:219-223). We keep the
best-metric gating but checkpoint optimizer state too, enabling true
resume (SURVEY.md §5 checkpoint/resume)."""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Tuple

import orbax.checkpoint as ocp

from tvretrieval_tpu.utils.io import load_json, save_json


def save_checkpoint(ckpt_dir: str, params, opt_state, model_cfg, epoch: int) -> None:
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(ckpt_dir, "state"),
                   {"params": params, "opt_state": opt_state}, force=True)
    cfg_dict = dataclasses.asdict(model_cfg) if dataclasses.is_dataclass(model_cfg) else dict(model_cfg)
    save_json({"model_cfg": cfg_dict, "epoch": epoch},
              os.path.join(ckpt_dir, "meta.json"), pretty=True)


def load_checkpoint(ckpt_dir: str, target=None) -> Tuple[Any, Any, dict, int]:
    """Returns (params, opt_state, model_cfg_dict, epoch)."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(ckpt_dir, "state"), item=target)
    meta = load_json(os.path.join(ckpt_dir, "meta.json"))
    return state["params"], state.get("opt_state"), meta["model_cfg"], meta["epoch"]
