"""Small host-side IO / math helpers.

Capability parity with reference ``utils/basic_utils.py`` (load/save json(l),
l2_normalize_np_array:82, AverageMeter:118, dissect_by_lengths:146), written
fresh for this framework.
"""
from __future__ import annotations

import json
from typing import Any, Iterable, List, Sequence

import numpy as np


def load_json(path: str) -> Any:
    with open(path, "r") as f:
        return json.load(f)


def save_json(obj: Any, path: str, pretty: bool = False, sort_keys: bool = False) -> None:
    with open(path, "w") as f:
        if pretty:
            json.dump(obj, f, indent=4, sort_keys=sort_keys)
        else:
            json.dump(obj, f)


def load_jsonl(path: str) -> List[Any]:
    with open(path, "r") as f:
        return [json.loads(line) for line in f if line.strip()]


def save_jsonl(rows: Iterable[Any], path: str) -> None:
    with open(path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


def l2_normalize(x: np.ndarray, axis: int = -1, eps: float = 1e-5) -> np.ndarray:
    """L2-normalize along ``axis``.

    Matches reference utils/basic_utils.py:82 (``x / norm(x, axis=-1)``,
    eps=1e-5 added to the denominator).
    """
    norm = np.linalg.norm(x, axis=axis, keepdims=True)
    return x / (norm + eps)


def dissect_by_lengths(arr: np.ndarray, lengths: Sequence[int]) -> List[np.ndarray]:
    """Split the first axis of ``arr`` into consecutive chunks of ``lengths``."""
    assert int(np.sum(lengths)) == arr.shape[0], "lengths must sum to arr length"
    out = []
    offset = 0
    for n in lengths:
        out.append(arr[offset:offset + n])
        offset += n
    return out


class AverageMeter:
    """Track min / max / avg / sum / count of a scalar stream."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0
        self.min = float("inf")
        self.max = float("-inf")

    def update(self, val: float, n: int = 1) -> None:
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
        self.min = min(self.min, val)
        self.max = max(self.max, val)
