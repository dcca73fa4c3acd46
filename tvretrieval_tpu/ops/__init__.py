from tvretrieval_tpu.ops.masking import mask_logits
from tvretrieval_tpu.ops.span import (
    min_max_length_mask,
    top_spans_from_probs,
    flat_topk_spans,
)

__all__ = [
    "mask_logits",
    "min_max_length_mask",
    "top_spans_from_probs",
    "flat_topk_spans",
]
