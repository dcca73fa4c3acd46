from tvretrieval_tpu.evaluation.metrics import (
    eval_retrieval,
    temporal_iou,
    TASK_TYPES,
)
from tvretrieval_tpu.evaluation.nms import (
    temporal_nms,
    apply_nms_to_vcmr,
    apply_nms_to_svmr,
)
from tvretrieval_tpu.evaluation.submission import (
    submission_top_n,
    PredictionSet,
)

__all__ = [
    "eval_retrieval",
    "temporal_iou",
    "TASK_TYPES",
    "temporal_nms",
    "apply_nms_to_vcmr",
    "apply_nms_to_svmr",
    "submission_top_n",
    "PredictionSet",
]
