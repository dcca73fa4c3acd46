"""Query / subtitle text feature extraction (L0 text pipeline).

Capability parity with reference utils/text_feature/
lm_finetuning_on_single_sentences.py's *extraction* stage (:524-623): run a
RoBERTa-style encoder over each description (or subtitle sentence stream)
and store per-token contextual embeddings keyed by desc_id / vid_name in
HDF5. (The reference also MLM-fine-tunes RoBERTa first; pass any fine-tuned
checkpoint path here.)

TPU-native: prefers the Flax RoBERTa from HuggingFace transformers, jitted
with fixed-shape padded batches; falls back to the torch model on CPU.
Model weights must be available locally (this environment has no network
egress) — pass --model_path. The core extraction loop is dependency-injected
(encode_fn / embed_fn) so it is testable without any pretrained weights.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import numpy as np


def extract_token_features(
    texts: Dict[str, str],
    encode_fn: Callable[[List[str]], Tuple[np.ndarray, np.ndarray]],
    embed_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
    out_h5_path: str,
    batch_size: int = 64,
) -> int:
    """Extract (n_valid_tokens, D) embeddings per key into an HDF5 file.

    encode_fn: texts -> (input_ids (B, L), attention_mask (B, L)) fixed L.
    embed_fn: (input_ids, attention_mask) -> (B, L, D) token embeddings.
    Only positions with attention_mask==1 are stored (variable-length rows,
    matching the reference's h5 layout: key -> (n_tokens, 768)).
    """
    import h5py

    keys = list(texts.keys())
    with h5py.File(out_h5_path, "w") as h5:
        for i in range(0, len(keys), batch_size):
            chunk = keys[i:i + batch_size]
            ids, mask = encode_fn([texts[k] for k in chunk])
            embs = np.asarray(embed_fn(ids, mask))
            for j, key in enumerate(chunk):
                n = int(mask[j].sum())
                h5.create_dataset(str(key), data=embs[j, :n].astype(np.float32))
    return len(keys)


def make_hf_flax_embedder(model_path: str, max_length: int = 64):
    """(encode_fn, embed_fn) backed by a local HF Flax roberta checkpoint."""
    import jax
    from transformers import AutoTokenizer, FlaxAutoModel

    tokenizer = AutoTokenizer.from_pretrained(model_path)
    model = FlaxAutoModel.from_pretrained(model_path)

    def encode_fn(texts: List[str]):
        enc = tokenizer(texts, padding="max_length", truncation=True,
                        max_length=max_length, return_tensors="np")
        return enc["input_ids"], enc["attention_mask"]

    @jax.jit
    def _run(ids, mask):
        return model(input_ids=ids, attention_mask=mask).last_hidden_state

    def embed_fn(ids, mask):
        return _run(ids, mask)

    return encode_fn, embed_fn


def make_hf_torch_embedder(model_path: str, max_length: int = 64):
    """(encode_fn, embed_fn) backed by a local HF torch checkpoint (CPU)."""
    import torch
    from transformers import AutoModel, AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_path)
    model = AutoModel.from_pretrained(model_path)
    model.eval()

    def encode_fn(texts: List[str]):
        enc = tokenizer(texts, padding="max_length", truncation=True,
                        max_length=max_length, return_tensors="np")
        return enc["input_ids"], enc["attention_mask"]

    def embed_fn(ids, mask):
        with torch.no_grad():
            out = model(input_ids=torch.from_numpy(ids),
                        attention_mask=torch.from_numpy(mask))
        return out.last_hidden_state.numpy()

    return encode_fn, embed_fn


def main(argv=None):
    import argparse

    from tvretrieval_tpu.utils.io import load_jsonl

    parser = argparse.ArgumentParser(description="extract text token features")
    parser.add_argument("--annotations", type=str, required=True,
                        help="jsonl with desc_id + desc fields")
    parser.add_argument("--model_path", type=str, required=True,
                        help="local HF checkpoint dir (e.g. fine-tuned roberta)")
    parser.add_argument("--out_h5", type=str, required=True)
    parser.add_argument("--backend", type=str, default="flax",
                        choices=["flax", "torch"])
    parser.add_argument("--max_length", type=int, default=64)
    args = parser.parse_args(argv)

    rows = load_jsonl(args.annotations)
    texts = {str(r["desc_id"]): r["desc"] for r in rows}
    maker = make_hf_flax_embedder if args.backend == "flax" else make_hf_torch_embedder
    encode_fn, embed_fn = maker(args.model_path, args.max_length)
    n = extract_token_features(texts, encode_fn, embed_fn, args.out_h5)
    print(f"wrote {n} entries to {args.out_h5}")


if __name__ == "__main__":
    main()
