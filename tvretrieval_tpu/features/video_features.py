"""Video frame feature extraction pipeline (L0 video pipeline).

Capability parity with reference utils/video_feature/: per-frame appearance
features (ResNet-152 pool5, extract_image_features.py:27) and clip motion
features (Kinetics I3D, i3d.py + extract_i3d_features.py), followed by the
frame->clip pooling / alignment / normalize+concat transforms in
tvretrieval_tpu/features/pooling.py.

The frame backbone is dependency-injected (``frame_model_fn: (B, H, W, 3)
uint8 -> (B, D)``): this environment bundles no pretrained vision weights
(zero egress), so the CLI requires a local checkpoint adapter, while the
pipeline mechanics (batching, pooling, h5 layout) are fully testable with a
fake backbone.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, Tuple

import numpy as np

from tvretrieval_tpu.features.pooling import frames_to_clips


def extract_clip_features(
    video_frames: Dict[str, np.ndarray],
    frame_model_fn: Callable[[np.ndarray], np.ndarray],
    out_h5_path: str,
    frames_per_clip: int = 3,
    pool: str = "max",
    batch_size: int = 32,
) -> int:
    """Per video: frame features -> clip features -> h5[vid_name] = (n_clips, D).

    video_frames: {vid_name: (n_frames, H, W, 3) uint8}. The reference
    samples 3 frames per 1.5s clip at 15fps and max-pools them into one clip
    feature (extract_image_features.py + convert_feature_frm_to_clip.py).
    """
    import h5py

    with h5py.File(out_h5_path, "w") as h5:
        for vid_name, frames in video_frames.items():
            feats = []
            for i in range(0, len(frames), batch_size):
                feats.append(np.asarray(frame_model_fn(frames[i:i + batch_size])))
            frame_feats = np.concatenate(feats, axis=0)
            clip_feats = frames_to_clips(frame_feats, frames_per_clip, pool)
            h5.create_dataset(vid_name, data=clip_feats.astype(np.float32))
    return len(video_frames)


def make_flax_resnet_embedder(apply_fn, params, preprocess=None):
    """Adapt a flax CNN (e.g. a local ResNet port) into a frame_model_fn."""
    import jax
    import jax.numpy as jnp

    jitted = jax.jit(apply_fn)

    def frame_model_fn(frames: np.ndarray) -> np.ndarray:
        x = frames.astype(np.float32) / 255.0
        if preprocess is not None:
            x = preprocess(x)
        return np.asarray(jitted(params, jnp.asarray(x)))

    return frame_model_fn
