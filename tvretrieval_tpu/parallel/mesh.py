"""Device mesh + sharding helpers.

The reference's only parallelism is single-node torch DataParallel
(train.py:132-134). Here parallelism is mesh-based (SURVEY.md §2.6):

  * training: 1-D "data" mesh, batch sharded over it, params replicated —
    XLA inserts the gradient psum over ICI.
  * corpus inference: the corpus cache is sharded over the video axis on the
    same mesh; per-shard top-k results merge with a small all-gather.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (batch or corpus-video axis) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """device_put every array in the dict with axis-0 sharding."""
    sharding = batch_sharding(mesh, axis_name)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
