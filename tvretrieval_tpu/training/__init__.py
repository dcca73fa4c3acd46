from tvretrieval_tpu.training.optimization import (
    bert_adam,
    make_lr_multiplier,
    no_decay_mask,
)

__all__ = ["bert_adam", "make_lr_multiplier", "no_decay_mask"]
