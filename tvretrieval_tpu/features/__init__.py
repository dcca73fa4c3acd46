from tvretrieval_tpu.features.pooling import (
    frames_to_clips,
    align_lengths,
    normalize_and_concat,
    tokens_to_clip_features,
)
from tvretrieval_tpu.features.subtitles import parse_srt, subtitles_to_jsonl
from tvretrieval_tpu.features.video_split import build_video_duration_idx

__all__ = [
    "frames_to_clips",
    "align_lengths",
    "normalize_and_concat",
    "tokens_to_clip_features",
    "parse_srt",
    "subtitles_to_jsonl",
    "build_video_duration_idx",
]
