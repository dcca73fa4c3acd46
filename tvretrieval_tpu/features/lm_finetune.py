"""MLM fine-tuning of a RoBERTa-style LM on single sentences (L0 text stage).

Capability parity with reference utils/text_feature/
lm_finetuning_on_single_sentences.py's training stage (:317-523): fine-tune
the language model with a masked-LM objective on the dataset's queries
(and/or subtitle sentences) before extracting token features, so the
embeddings adapt to the TV-show domain.

TPU-native: Flax RoBERTa from transformers, one jitted train step with
AdamW + linear warmup/decay, 15% dynamic masking (80% [MASK] / 10% random /
10% keep — the BERT recipe the reference inherits from HF's finetuning
script). Pretrained weights must be local (zero-egress environment); the
loop itself is testable with a random-init tiny config.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclass
class MLMSettings:
    lr: float = 5e-5
    weight_decay: float = 0.01
    warmup_steps: int = 100
    total_steps: int = 1000
    batch_size: int = 32
    max_length: int = 64
    mask_prob: float = 0.15
    seed: int = 0


def mask_tokens(rng: np.random.Generator, input_ids: np.ndarray,
                attention_mask: np.ndarray, mask_token_id: int,
                vocab_size: int, special_ids: Tuple[int, ...],
                mask_prob: float = 0.15):
    """Dynamic MLM masking: labels = original ids at masked positions,
    -100 elsewhere; 80/10/10 mask/random/keep split."""
    labels = np.full_like(input_ids, -100)
    special = np.isin(input_ids, special_ids)
    candidates = (attention_mask == 1) & ~special
    pick = (rng.random(input_ids.shape) < mask_prob) & candidates
    labels[pick] = input_ids[pick]

    out = input_ids.copy()
    r = rng.random(input_ids.shape)
    out[pick & (r < 0.8)] = mask_token_id
    rand_pick = pick & (r >= 0.8) & (r < 0.9)
    out[rand_pick] = rng.integers(0, vocab_size, size=int(rand_pick.sum()))
    return out, labels


def mlm_loss_fn(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over positions with label != -100."""
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return (nll * valid).sum() / jnp.maximum(valid.sum(), 1)


def finetune_mlm(model, params, batches: Iterable[dict],
                 settings: MLMSettings):
    """Run MLM fine-tuning; batches yield {input_ids, attention_mask, labels}
    numpy arrays. Returns (params, losses)."""
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, settings.lr, settings.warmup_steps, settings.total_steps)
    tx = optax.adamw(schedule, weight_decay=settings.weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, input_ids, attention_mask, labels):
        def loss_fn(p):
            logits = model(input_ids=input_ids, attention_mask=attention_mask,
                           params=p, train=False).logits
            return mlm_loss_fn(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for batch in batches:
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]), jnp.asarray(batch["labels"]))
        losses.append(float(loss))
    return params, losses


def make_mlm_batches(sentences: List[str], tokenizer, settings: MLMSettings,
                     n_epochs: int = 1):
    """Tokenize + dynamically mask sentence batches (generator)."""
    rng = np.random.default_rng(settings.seed)
    special_ids = tuple(i for i in (tokenizer.cls_token_id, tokenizer.sep_token_id,
                                    tokenizer.pad_token_id) if i is not None)
    order = np.arange(len(sentences))
    for _ in range(n_epochs):
        rng.shuffle(order)
        for i in range(0, len(order) - settings.batch_size + 1, settings.batch_size):
            chunk = [sentences[j] for j in order[i:i + settings.batch_size]]
            enc = tokenizer(chunk, padding="max_length", truncation=True,
                            max_length=settings.max_length, return_tensors="np")
            ids, labels = mask_tokens(
                rng, enc["input_ids"], enc["attention_mask"],
                tokenizer.mask_token_id, tokenizer.vocab_size, special_ids,
                settings.mask_prob)
            yield {"input_ids": ids, "attention_mask": enc["attention_mask"],
                   "labels": labels}


def main(argv=None):
    import argparse

    from tvretrieval_tpu.utils.io import load_jsonl

    parser = argparse.ArgumentParser(description="MLM fine-tune a local LM")
    parser.add_argument("--annotations", type=str, required=True)
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--out_path", type=str, required=True)
    parser.add_argument("--n_epochs", type=int, default=1)
    parser.add_argument("--lr", type=float, default=5e-5)
    parser.add_argument("--batch_size", type=int, default=32)
    args = parser.parse_args(argv)

    from transformers import AutoTokenizer, FlaxAutoModelForMaskedLM
    tokenizer = AutoTokenizer.from_pretrained(args.model_path)
    model = FlaxAutoModelForMaskedLM.from_pretrained(args.model_path)

    rows = load_jsonl(args.annotations)
    sentences = [r["desc"] for r in rows]
    settings = MLMSettings(lr=args.lr, batch_size=args.batch_size,
                           total_steps=max(len(sentences) // args.batch_size, 1)
                           * args.n_epochs)
    batches = make_mlm_batches(sentences, tokenizer, settings, args.n_epochs)
    params, losses = finetune_mlm(model, model.params, batches, settings)
    model.save_pretrained(args.out_path, params=params)
    tokenizer.save_pretrained(args.out_path)
    print(f"final loss {losses[-1]:.4f}; saved to {args.out_path}")


if __name__ == "__main__":
    main()
