"""Device-resident training/eval data: the HBM-resident corpus design.

Motivation (TVR-scale measurement, BENCH_NOTES.md): the remote-TPU relay
sustains ~25 MB/s host->device, so streaming built batches (~100 MB each at
TVR feature dims) costs ~50 min/epoch — the device sits idle on a ~46 s
compute epoch. The reference never faces this (local PCIe + 8 DataLoader
workers, train.py:136-141), but the fix is the natural TPU design anyway:

  * the corpus context features live in HBM once (quantized float8 with a
    fixed scale: 21.8K videos x 100 clips x 3074-d = 6.7 GB + subs 1.7 GB),
  * each train step gathers its batch's context rows ON DEVICE by video
    slot (XLA row gather), recomputes the TEF dims exactly from clip
    counts, and masks from lengths,
  * only per-query data streams per step (f8 query tokens + int32
    slots/labels ~= 15 MB per 8-step chunk vs ~800 MB),
  * K optimizer steps run per dispatch under ``lax.scan`` with donated
    (params, opt_state), amortizing the ~12 ms relay dispatch overhead.

The same resident context block feeds per-epoch corpus re-encoding
(engine.encode_corpus_resident), eliminating the other per-epoch bulk
transfer (the reference re-encodes from host tensors every eval,
inference.py:32-97).

Quantization: features are l2-normalized per clip row (so |x| <= 1);
float8_e4m3fn stores x*64 (well inside e4m3's normal range — values ~1/sqrt
(3072) = 0.018 would otherwise land in subnormals). TEF dims are stored too
but recomputed exactly in f32 at assembly, so their quantization error never
reaches the model. "float16"/"float32" storage modes exist for differential
tests (f32 is bit-exact vs the host ExampleBuilder path) and small worlds.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tvretrieval_tpu.data.datasets import (
    CorpusIndex,
    ExampleBuilder,
    eval_st_ed_label,
    resolve_ts,
    train_st_ed_label,
)

logger = logging.getLogger(__name__)

#: fixed quantization scales per storage dtype (see module docstring)
_SCALES = {"float8_e4m3fn": 64.0, "int8": 100.0, "float16": 1.0, "float32": 1.0}


def storage_dtype(name: str):
    """Returns (numpy dtype, scale) for a storage-dtype name."""
    if name == "float8_e4m3fn":
        import ml_dtypes
        return np.dtype(ml_dtypes.float8_e4m3fn), _SCALES[name]
    if name == "int8":
        return np.dtype(np.int8), _SCALES[name]
    if name == "float16":
        return np.dtype(np.float16), _SCALES[name]
    if name == "float32":
        return np.dtype(np.float32), _SCALES[name]
    raise ValueError(f"unknown storage dtype {name!r}")


def quantize(x: np.ndarray, dtype_name: str) -> np.ndarray:
    dt, scale = storage_dtype(dtype_name)
    if scale == 1.0:
        return x.astype(dt)
    y = x.astype(np.float32) * scale
    if dt == np.int8:
        y = np.clip(np.rint(y), -127, 127)
    return y.astype(dt)


def dequantize(x: jnp.ndarray, dtype_name: str) -> jnp.ndarray:
    scale = _SCALES[dtype_name]
    y = x.astype(jnp.float32)
    return y if scale == 1.0 else y * (1.0 / scale)


# --------------------------------------------------------------------------
# byte-flat device tables
#
# XLA-TPU lowers row gathers as mini-gather over a LAYOUT COPY of the whole
# operand (temp ~= 1.6x operand size — measured identically for plain
# gather, vmap/scan/unrolled dynamic_slice; see ops/pallas_gather.py
# gather_byte_rows) — fatal for an 8.4 GB resident corpus on a 16 GB chip.
# Device tables are therefore stored as raw BYTES, (N, 8, W) int8 with
# W % 128 == 0, so that
#   * random-row batches gather via the Pallas DMA kernel (zero temp),
#   * contiguous encode chunks use lax.dynamic_slice (zero temp),
# and rows bitcast back to the storage dtype after the copy.
# --------------------------------------------------------------------------

def to_byte_table(arr: np.ndarray) -> np.ndarray:
    """(N, L, D) any fixed-width dtype -> (N, 8, W) int8, W % 128 == 0."""
    n = arr.shape[0]
    flat = np.ascontiguousarray(arr).reshape(n, -1).view(np.int8)
    nbytes = flat.shape[1]
    w = -(-nbytes // 1024) * 1024          # pad to 8 * 128-multiple
    if w != nbytes:
        flat = np.pad(flat, ((0, 0), (0, w - nbytes)))
    return flat.reshape(n, 8, w // 8)


def from_byte_rows(rows: jnp.ndarray, L: int, D: int,
                   dtype_name: str) -> jnp.ndarray:
    """(B, 8, W) int8 -> (B, L, D) storage dtype (bitcast, no copy math)."""
    dt, _ = storage_dtype(dtype_name)
    B = rows.shape[0]
    n = L * D * dt.itemsize
    flat = rows.reshape(B, -1)[:, :n]
    if dt.itemsize == 1:
        out = jax.lax.bitcast_convert_type(flat, dt)
    else:
        out = jax.lax.bitcast_convert_type(
            flat.reshape(B, L * D, dt.itemsize), dt)
    return out.reshape(B, L, D)


def gather_rows(table: jnp.ndarray, slots: jnp.ndarray,
                use_kernel: bool) -> jnp.ndarray:
    """(N, 8, W) byte-table row gather: Pallas DMA kernel on TPU, plain
    indexing elsewhere (CPU tests; XLA's gather copy is harmless there)."""
    if use_kernel:
        from tvretrieval_tpu.ops.pallas_gather import gather_byte_rows
        return gather_byte_rows(table, slots)
    return table[slots]


@dataclass
class ContextTable:
    """Host-built, corpus-ordered context feature block.

    v_feats/s_feats are the builder's padded per-video context features
    (normalized, TEF dims appended when active) in storage dtype; slot i is
    corpus video i (``corpus.vid_names[i]``).
    """

    v_feats: np.ndarray     # (Nv, L, Dv) storage dtype
    s_feats: np.ndarray     # (Nv, L, Ds)
    ctx_l: np.ndarray       # (Nv,) int32
    dtype_name: str
    use_video: bool
    use_sub: bool
    use_tef: bool

    @classmethod
    def build(cls, builder: ExampleBuilder, corpus: CorpusIndex,
              dtype_name: str = "float8_e4m3fn",
              chunk: int = 512) -> "ContextTable":
        """Vectorized: chunks of videos go through the batched
        ExampleBuilder.build_contexts (one normalize + one scatter per
        chunk, bit-identical to the per-row path) and quantize as whole
        blocks; ``chunk`` bounds the transient f32 chunk in host RAM."""
        nv = len(corpus)
        v0, s0, _, _ = builder.context(corpus.vid_names[0], corpus.durations[0])
        dt, _ = storage_dtype(dtype_name)
        v_feats = np.empty((nv,) + v0.shape, dt)
        s_feats = np.empty((nv,) + s0.shape, dt)
        ctx_l = np.empty((nv,), np.int32)
        for i in range(0, nv, chunk):
            v, s, _, cl = builder.build_contexts(
                corpus.vid_names[i:i + chunk], corpus.durations[i:i + chunk])
            v_feats[i:i + chunk] = quantize(v, dtype_name)
            s_feats[i:i + chunk] = quantize(s, dtype_name)
            ctx_l[i:i + chunk] = cl
            if i and i % 5120 < chunk:
                logger.info("context table: %d/%d videos", i, nv)
        return cls(v_feats=v_feats, s_feats=s_feats, ctx_l=ctx_l,
                   dtype_name=dtype_name, use_video=builder.use_video,
                   use_sub=builder.use_sub, use_tef=builder.use_tef)

    def device_arrays(self, sharding=None) -> Dict[str, jnp.ndarray]:
        """Put the table on device as byte-flat (N, 8, W) int8 blocks
        (replicated across any mesh). See the byte-table note above."""
        put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
            else jax.device_put
        return {"v_bytes": put(to_byte_table(self.v_feats)),
                "s_bytes": put(to_byte_table(self.s_feats)),
                "ctx_l": put(self.ctx_l)}

    @property
    def shapes(self) -> dict:
        """Static per-stream (L, D) needed to debyte gathered rows."""
        return dict(v_shape=self.v_feats.shape[1:],
                    s_shape=self.s_feats.shape[1:])

    def nbytes(self) -> int:
        return self.v_feats.nbytes + self.s_feats.nbytes


@dataclass
class QueryTable:
    """Host-side per-rowset query features + labels, slots into the corpus.

    Queries are trimmed to the longest real token count (q_feats.shape[1]
    <= builder.max_desc_l); device assembly zero-pads back to max_desc_l.
    """

    q_feats: np.ndarray     # (Nq, Lq_eff, Dq) storage dtype
    q_len: np.ndarray       # (Nq,) int32
    slot: np.ndarray        # (Nq,) int32 — corpus video index
    st_ed: np.ndarray       # (Nq, 2) int32
    dtype_name: str
    max_desc_l: int

    @classmethod
    def build(cls, builder: ExampleBuilder, rows: List[dict],
              corpus: CorpusIndex, ctx_l: np.ndarray,
              dtype_name: str = "float8_e4m3fn",
              eval_labels: bool = False, chunk: int = 4096) -> "QueryTable":
        """Vectorized like ContextTable.build: chunks of rows go through the
        batched ExampleBuilder.build_queries + block quantize."""
        nq = len(rows)
        vid2slot = {v: i for i, v in enumerate(corpus.vid_names)}
        dt, _ = storage_dtype(dtype_name)
        q_full = np.empty((nq, builder.max_desc_l, builder.query_source.dim), dt)
        q_len = np.empty((nq,), np.int32)
        slot = np.empty((nq,), np.int32)
        st_ed = np.empty((nq, 2), np.int32)
        label_fn = eval_st_ed_label if eval_labels else train_st_ed_label
        for i in range(0, nq, chunk):
            qf, qm = builder.build_queries(
                [r["desc_id"] for r in rows[i:i + chunk]])
            q_full[i:i + chunk] = quantize(qf, dtype_name)
            q_len[i:i + chunk] = qm.sum(axis=1).astype(np.int32)
            if i and i % 20480 < chunk:
                logger.info("query table: %d/%d rows", i, nq)
        for i, row in enumerate(rows):
            s = vid2slot[row["vid_name"]]
            slot[i] = s
            ts = resolve_ts(row, builder.dset_name)
            st_ed[i] = label_fn(ts, builder.clip_length,
                                max_idx=int(ctx_l[s]) - 1)
        l_eff = max(int(q_len.max()), 1) if nq else 1
        return cls(q_feats=np.ascontiguousarray(q_full[:, :l_eff]),
                   q_len=q_len, slot=slot, st_ed=st_ed,
                   dtype_name=dtype_name, max_desc_l=builder.max_desc_l)

    def chunk(self, idx: np.ndarray):
        """Host gather of the streaming arrays for a step/chunk of rows."""
        return (self.q_feats[idx], self.q_len[idx], self.slot[idx],
                self.st_ed[idx])


# --------------------------------------------------------------------------
# device-side assembly (pure jnp; jit-composable)
# --------------------------------------------------------------------------

def _finish_context(v, s, n, *, use_video: bool, use_sub: bool,
                    use_tef: bool):
    """Shared tail of context assembly: mask from clip counts + exact TEF
    recompute (datasets.tef_features) overwriting the quantized TEF dims."""
    L = v.shape[1]
    pos = jnp.arange(L, dtype=jnp.float32)
    mask = (pos[None, :] < n[:, None].astype(jnp.float32)).astype(jnp.float32)
    if use_tef:
        nf = jnp.maximum(n, 1).astype(jnp.float32)[:, None]
        st = pos[None, :] / nf
        tef = jnp.stack([st, st + 1.0 / nf], axis=-1) * mask[..., None]
        if use_video:
            v = jnp.concatenate([v[..., :-2], tef], axis=-1)
        if use_sub:
            s = jnp.concatenate([s[..., :-2], tef], axis=-1)
        if not use_video and not use_sub:
            v = tef
    return v, mask, s, mask


def assemble_context(ctx: Dict[str, jnp.ndarray], slots: jnp.ndarray, *,
                     dtype_name: str, use_video: bool, use_sub: bool,
                     use_tef: bool, v_shape, s_shape, use_kernel: bool = False):
    """Gather + dequantize context rows for ``slots`` (B,), recomputing TEF
    exactly and the mask from clip counts. Returns (video_feat, video_mask,
    sub_feat, sub_mask) matching ExampleBuilder.context + _pad_to output
    bit-for-bit under float32 storage."""
    v = dequantize(from_byte_rows(
        gather_rows(ctx["v_bytes"], slots, use_kernel), *v_shape, dtype_name),
        dtype_name)
    s = dequantize(from_byte_rows(
        gather_rows(ctx["s_bytes"], slots, use_kernel), *s_shape, dtype_name),
        dtype_name)
    n = ctx["ctx_l"][slots]
    return _finish_context(v, s, n, use_video=use_video, use_sub=use_sub,
                           use_tef=use_tef)


def assemble_context_slice(ctx: Dict[str, jnp.ndarray], start, size: int, *,
                           dtype_name: str, use_video: bool, use_sub: bool,
                           use_tef: bool, v_shape, s_shape,
                           use_kernel: bool = False):
    """Contiguous-chunk variant for corpus encoding: lax.dynamic_slice on
    the byte tables (zero-temp on TPU; gather would copy the operand)."""
    del use_kernel
    sl = lambda t: jax.lax.dynamic_slice(
        t, (start, 0, 0), (size,) + t.shape[1:])
    v = dequantize(from_byte_rows(sl(ctx["v_bytes"]), *v_shape, dtype_name),
                   dtype_name)
    s = dequantize(from_byte_rows(sl(ctx["s_bytes"]), *s_shape, dtype_name),
                   dtype_name)
    n = jax.lax.dynamic_slice(ctx["ctx_l"], (start,), (size,))
    return _finish_context(v, s, n, use_video=use_video, use_sub=use_sub,
                           use_tef=use_tef)


def assemble_queries(q_feat: jnp.ndarray, q_len: jnp.ndarray, *,
                     dtype_name: str, max_desc_l: int):
    """Dequantize + zero-pad queries back to (B, max_desc_l, Dq) + mask."""
    q = dequantize(q_feat, dtype_name)                   # (B, Lq_eff, Dq)
    B, l_eff, D = q.shape
    if l_eff < max_desc_l:
        q = jnp.pad(q, ((0, 0), (0, max_desc_l - l_eff), (0, 0)))
    pos = jnp.arange(max_desc_l, dtype=jnp.float32)
    q_mask = (pos[None, :] < q_len[:, None].astype(jnp.float32)).astype(jnp.float32)
    return q, q_mask


def assemble_batch(ctx: Dict[str, jnp.ndarray], q_feat, q_len, slots, st_ed, *,
                   dtype_name: str, use_video: bool, use_sub: bool,
                   use_tef: bool, max_desc_l: int, v_shape, s_shape,
                   use_kernel: bool = False) -> Dict[str, jnp.ndarray]:
    """Full on-device train/eval-loss batch (ExampleBuilder.build_train_batch
    equivalent; exactness-tested under float32 storage)."""
    v, mask, s, _ = assemble_context(
        ctx, slots, dtype_name=dtype_name, use_video=use_video,
        use_sub=use_sub, use_tef=use_tef, v_shape=v_shape, s_shape=s_shape,
        use_kernel=use_kernel)
    q, q_mask = assemble_queries(q_feat, q_len, dtype_name=dtype_name,
                                 max_desc_l=max_desc_l)
    return dict(query_feat=q, query_mask=q_mask,
                video_feat=v, video_mask=mask,
                sub_feat=s, sub_mask=mask,
                st_ed_indices=st_ed)


@dataclass
class DeviceData:
    """Bundle threaded through the trainer/driver for device-resident runs."""

    ctx_table: ContextTable
    ctx_device: Dict[str, jnp.ndarray]
    train_queries: Optional[QueryTable] = None
    eval_queries: Optional[QueryTable] = None       # train-style labels (loss)
    retrieval_queries: Optional[QueryTable] = None  # same features; labels unused

    use_kernel: bool = False   # Pallas DMA gather (TPU) vs plain indexing

    @property
    def assemble_kwargs(self) -> dict:
        t = self.ctx_table
        return dict(dtype_name=t.dtype_name, use_video=t.use_video,
                    use_sub=t.use_sub, use_tef=t.use_tef,
                    use_kernel=self.use_kernel, **t.shapes)


def build_device_data(builder: ExampleBuilder, corpus: CorpusIndex,
                      train_rows: List[dict], eval_rows: List[dict],
                      dtype_name: str = "float8_e4m3fn",
                      sharding=None) -> DeviceData:
    """Build all host tables and put the context block on device."""
    import time
    t0 = time.time()
    ctx = ContextTable.build(builder, corpus, dtype_name)
    logger.info("context table built: %.1f GB in %.0fs",
                ctx.nbytes() / 1e9, time.time() - t0)
    t0 = time.time()
    tq = QueryTable.build(builder, train_rows, corpus, ctx.ctx_l, dtype_name) \
        if train_rows else None
    eq = QueryTable.build(builder, eval_rows, corpus, ctx.ctx_l, dtype_name) \
        if eval_rows else None
    logger.info("query tables built in %.0fs", time.time() - t0)
    t0 = time.time()
    dev = ctx.device_arrays(sharding)
    for a in dev.values():
        a.block_until_ready()
    logger.info("context block resident on device (%.1f GB, %.0fs)",
                ctx.nbytes() / 1e9, time.time() - t0)
    use_kernel = jax.devices()[0].platform != "cpu"
    return DeviceData(ctx_table=ctx, ctx_device=dev, train_queries=tq,
                      eval_queries=eq, retrieval_queries=eq,
                      use_kernel=use_kernel)
