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

from typing import Callable, Dict

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


def extract_i3d_clip_features(
    video_frames: Dict[str, np.ndarray],
    clip_model_fn: Callable[[np.ndarray], np.ndarray],
    out_h5_path: str,
    frames_per_clip: int = 23,
    batch_size: int = 4,
) -> int:
    """Per video: group frames into fixed-length clips and run a 3D-conv
    clip model -> h5[vid_name] = (n_clips, D).

    The reference feeds 23 frames per 1.5s clip to I3D
    (extract_i3d_features.py:39-41); the last partial clip is padded by
    repeating its final frame.
    """
    import h5py

    with h5py.File(out_h5_path, "w") as h5:
        for vid_name, frames in video_frames.items():
            n = len(frames)
            n_clips = max(1, -(-n // frames_per_clip))
            pad = n_clips * frames_per_clip - n
            if pad:
                frames = np.concatenate(
                    [frames, np.repeat(frames[-1:], pad, axis=0)], axis=0)
            clips = frames.reshape(n_clips, frames_per_clip, *frames.shape[1:])
            feats = []
            for i in range(0, n_clips, batch_size):
                feats.append(np.asarray(clip_model_fn(clips[i:i + batch_size])))
            h5.create_dataset(vid_name,
                              data=np.concatenate(feats, 0).astype(np.float32))
    return len(video_frames)


# ImageNet normalization (reference extract_image_features.py:21-24)
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def make_resnet152_frame_model(variables=None, seed: int = 0,
                               block_counts=(3, 8, 36, 3)):
    """frame_model_fn backed by the in-repo flax ResNet-152
    (features/backbones.py). ``variables`` should come from
    ``torchvision_resnet152_to_flax`` for real released weights; random
    init (zero-egress environments) still exercises the full pipeline."""
    import jax
    import jax.numpy as jnp

    from tvretrieval_tpu.features.backbones import ResNet152

    model = ResNet152(block_counts=tuple(block_counts))
    if variables is None:
        variables = model.init(jax.random.PRNGKey(seed),
                               jnp.zeros((1, 64, 64, 3), jnp.float32))
    jitted = jax.jit(lambda v, x: model.apply(v, x))

    def frame_model_fn(frames: np.ndarray) -> np.ndarray:
        x = (frames.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        return np.asarray(jitted(variables, jnp.asarray(x)))

    return frame_model_fn


def make_i3d_clip_model(variables=None, seed: int = 0):
    """clip_model_fn backed by the in-repo flax InceptionI3d: (B, T, H, W, 3)
    uint8 clips -> (B, 1024) avg_pool3d features (reference
    extract_i3d_features.py:207-208 rescales inputs to [-1, 1])."""
    import jax
    import jax.numpy as jnp

    from tvretrieval_tpu.features.backbones import InceptionI3d

    model = InceptionI3d()
    if variables is None:
        variables = model.init(jax.random.PRNGKey(seed),
                               jnp.zeros((1, 8, 32, 32, 3), jnp.float32))
    jitted = jax.jit(lambda v, x: model.apply(v, x))

    def clip_model_fn(clips: np.ndarray) -> np.ndarray:
        x = clips.astype(np.float32) / 127.5 - 1.0
        return np.asarray(jitted(variables, jnp.asarray(x)))

    return clip_model_fn


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
