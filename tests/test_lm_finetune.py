"""MLM fine-tuning loop on a tiny random-init Flax RoBERTa (no downloads)."""
import numpy as np
import pytest


def test_mask_tokens_distribution(rng):
    from tvretrieval_tpu.features.lm_finetune import mask_tokens
    g = np.random.default_rng(0)
    ids = g.integers(4, 90, size=(64, 16)).astype(np.int32)
    mask = np.ones_like(ids)
    out, labels = mask_tokens(g, ids, mask, mask_token_id=3, vocab_size=90,
                              special_ids=(0, 1, 2), mask_prob=0.15)
    picked = labels != -100
    frac = picked.mean()
    assert 0.08 < frac < 0.25
    # unmasked positions unchanged
    np.testing.assert_array_equal(out[~picked], ids[~picked])
    # labels hold the ORIGINAL ids at masked positions
    np.testing.assert_array_equal(labels[picked], ids[picked])


def test_mlm_finetune_reduces_loss():
    transformers = pytest.importorskip("transformers")
    import jax
    from transformers import FlaxRobertaForMaskedLM, RobertaConfig
    from tvretrieval_tpu.features.lm_finetune import (
        MLMSettings, finetune_mlm, mask_tokens)

    cfg = RobertaConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=32)
    model = FlaxRobertaForMaskedLM(cfg, seed=0)

    g = np.random.default_rng(1)
    # highly regular data so a tiny model can learn it
    base = np.tile(np.arange(4, 20, dtype=np.int32), (16, 1))  # (16, 16)

    def batches(n_steps):
        for _ in range(n_steps):
            ids, labels = mask_tokens(g, base.copy(), np.ones_like(base),
                                      mask_token_id=3, vocab_size=64,
                                      special_ids=(0, 1, 2), mask_prob=0.3)
            yield {"input_ids": ids, "attention_mask": np.ones_like(base),
                   "labels": labels}

    settings = MLMSettings(lr=3e-3, warmup_steps=2, total_steps=30,
                           batch_size=16)
    _, losses = finetune_mlm(model, model.params, batches(30), settings)
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])
