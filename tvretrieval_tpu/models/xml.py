"""XML — Cross-modal Moment Localization, TPU-native.

Functional flax re-design of the reference network
(baselines/crossmodal_moment_localization/model_xml.py): dual video/subtitle
context encoders with cross-attention (model_xml.py:344-375), a modular
query encoder producing one query vector per context stream (:399-423),
video-level cosine retrieval scores (:436-453), and the merged-stream ConvSE
start/end span detector (:455-502) trained with CE span loss + in-batch
hinge/LSE ranking losses with optional hard negatives (:588-637).

Design notes (TPU-first):
  * All shapes static — (B, max_desc_l) queries, (B, max_ctx_l) contexts.
  * The decomposed inference API (``encode_context`` / ``encode_query`` /
    ``get_pred_from_raw_query(cross=True)``) is preserved: corpus retrieval
    pre-encodes contexts once, then scores queries against the whole cached
    corpus as blocked MXU matmuls (see tvretrieval_tpu/retrieval/engine.py).
  * Loss schedule knobs (lw_st_ed activation, hard-negative pool bound) are
    traced scalars, not Python config mutations, so one compiled train step
    serves the whole schedule (reference mutates model.config at epoch
    boundaries, train.py:45-48).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tvretrieval_tpu.models.components import (
    BertAttention,
    BertSelfAttention,
    Conv1dSame,
    ConvEncoder,
    LinearLayer,
    TrainablePositionalEncoding,
    _normal_init,
)
from tvretrieval_tpu.models.rnn import RNNEncoder
from tvretrieval_tpu.ops.masking import mask_logits


class RNNEncoderLayer(nn.Module):
    """Bidirectional scan-RNN with the same (x, mask) interface as the
    attention encoder layers (reference XML encoder_type in {lstm,gru},
    model_xml.py:84-93)."""

    hidden_size: int          # total (split across directions)
    rnn_type: str = "lstm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool = True):
        outputs, _ = RNNEncoder(self.hidden_size // 2, self.rnn_type, True,
                                self.dtype, name="rnn")(x, mask.sum(axis=-1))
        return outputs


@dataclass(frozen=True)
class XMLConfig:
    """Static model configuration (mirrors reference xml_base_config:19-49)."""

    ctx_mode: str = "video_sub"            # "video", "sub", "video_sub" (+"_tef" handled by data layer)
    merge_two_stream: bool = True
    cross_att: bool = True
    span_predictor_type: str = "conv"      # "conv" | "cat_linear"
    # stacked ConvSE variant (reference stack_conv_predictor_conv_kernel_sizes,
    # model_xml.py:30, 163-181: one conv per kernel size, combined by a
    # bias-free linear). None = the single-conv default (reference -1).
    stack_conv_predictor_conv_kernel_sizes: Optional[tuple] = None
    encoder_type: str = "transformer"      # "transformer" | "cnn" | "lstm" | "gru"
    add_pe_rnn: bool = False               # positional embedding for RNN encoders
    visual_input_size: int = 3074          # resnet_i3d 3072 + 2 TEF
    sub_input_size: int = 770              # roberta 768 + 2 TEF
    query_input_size: int = 768
    hidden_size: int = 256
    n_heads: int = 4
    conv_kernel_size: int = 5
    max_ctx_l: int = 100
    max_desc_l: int = 30
    input_drop: float = 0.1
    drop: float = 0.1
    margin: float = 0.1
    ranking_loss_type: str = "hinge"       # "hinge" | "lse"
    lw_neg_q: float = 1.0
    lw_neg_ctx: float = 1.0
    no_modular: bool = False
    # dropout applied inside the cross-attention blocks (reference
    # --cross_att_drop, config.py:147 / train.py:336); None = same as drop
    cross_att_drop: Optional[float] = None
    initializer_range: float = 0.02
    dtype_str: str = "float32"             # compute dtype ("float32" | "bfloat16")

    @property
    def use_video(self) -> bool:
        return "video" in self.ctx_mode

    @property
    def use_sub(self) -> bool:
        return "sub" in self.ctx_mode

    @property
    def n_streams(self) -> int:
        return int(self.use_video) + int(self.use_sub)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32


def cosine_video_scores(query_vec: jnp.ndarray, context_feat1: jnp.ndarray,
                        context_mask: jnp.ndarray) -> jnp.ndarray:
    """Max-over-clips cosine similarity of each query vs each video.

    Args:
        query_vec: (M, D); context_feat1: (N, L, D); context_mask: (N, L)
    Returns:
        (M, N) scores. Reference get_video_level_scores (model_xml.py:436-453).
    """
    q = query_vec / (jnp.linalg.norm(query_vec, axis=-1, keepdims=True) + 1e-12)
    f = context_feat1 / (jnp.linalg.norm(context_feat1, axis=-1, keepdims=True) + 1e-12)
    scores = jnp.einsum("md,nld->mln", q, f, preferred_element_type=jnp.float32)
    scores = mask_logits(scores, context_mask.T[None])  # (1, L, N) mask
    return scores.max(axis=1)


class XML(nn.Module):
    cfg: XMLConfig

    def setup(self):
        c = self.cfg
        dt = c.dtype
        self.query_pos_embed = TrainablePositionalEncoding(c.max_desc_l, c.input_drop, dt)
        self.ctx_pos_embed = TrainablePositionalEncoding(c.max_ctx_l, c.input_drop, dt)
        self.query_input_proj = LinearLayer(c.hidden_size, True, c.input_drop, True, dt)
        self.query_encoder = self._make_encoder()

        if c.use_video:
            self.video_input_proj = LinearLayer(c.hidden_size, True, c.input_drop, True, dt)
            self.video_encoder1 = self._make_encoder()
            self.video_encoder2 = self._make_encoder()
            if c.cross_att:
                cad = c.drop if c.cross_att_drop is None else c.cross_att_drop
                self.video_cross_att = BertSelfAttention(c.n_heads, cad, dt)
                self.video_cross_ln = nn.LayerNorm(epsilon=1e-5, dtype=dt)
            elif c.encoder_type == "transformer":
                self.video_encoder3 = self._make_encoder()
            self.video_query_linear = nn.Dense(c.hidden_size, kernel_init=_normal_init(), dtype=dt)
            if c.span_predictor_type == "conv" and not c.merge_two_stream:
                self.video_st_predictor = Conv1dSame(c.conv_kernel_size, dt)
                self.video_ed_predictor = Conv1dSame(c.conv_kernel_size, dt)
            elif c.span_predictor_type == "cat_linear":
                self.video_st_q = nn.Dense(1, kernel_init=_normal_init(), dtype=dt)
                self.video_st_ctx = nn.Dense(1, kernel_init=_normal_init(), dtype=dt)
                self.video_ed_q = nn.Dense(1, kernel_init=_normal_init(), dtype=dt)
                self.video_ed_ctx = nn.Dense(1, kernel_init=_normal_init(), dtype=dt)

        if c.use_sub:
            self.sub_input_proj = LinearLayer(c.hidden_size, True, c.input_drop, True, dt)
            self.sub_encoder1 = self._make_encoder()
            self.sub_encoder2 = self._make_encoder()
            if c.cross_att:
                cad = c.drop if c.cross_att_drop is None else c.cross_att_drop
                self.sub_cross_att = BertSelfAttention(c.n_heads, cad, dt)
                self.sub_cross_ln = nn.LayerNorm(epsilon=1e-5, dtype=dt)
            elif c.encoder_type == "transformer":
                self.sub_encoder3 = self._make_encoder()
            self.sub_query_linear = nn.Dense(c.hidden_size, kernel_init=_normal_init(), dtype=dt)
            if c.span_predictor_type == "conv" and not c.merge_two_stream:
                self.sub_st_predictor = Conv1dSame(c.conv_kernel_size, dt)
                self.sub_ed_predictor = Conv1dSame(c.conv_kernel_size, dt)
            elif c.span_predictor_type == "cat_linear":
                self.sub_st_q = nn.Dense(1, kernel_init=_normal_init(), dtype=dt)
                self.sub_st_ctx = nn.Dense(1, kernel_init=_normal_init(), dtype=dt)
                self.sub_ed_q = nn.Dense(1, kernel_init=_normal_init(), dtype=dt)
                self.sub_ed_ctx = nn.Dense(1, kernel_init=_normal_init(), dtype=dt)

        self.modular_vector_mapping = nn.Dense(
            self.cfg.n_streams, use_bias=False, kernel_init=_normal_init(), dtype=dt)

        if c.merge_two_stream and c.span_predictor_type == "conv":
            if c.stack_conv_predictor_conv_kernel_sizes is None:
                self.merged_st_predictor = Conv1dSame(c.conv_kernel_size, dt)
                self.merged_ed_predictor = Conv1dSame(c.conv_kernel_size, dt)
            else:
                ks = c.stack_conv_predictor_conv_kernel_sizes
                self.merged_st_predictors = [Conv1dSame(k, dt) for k in ks]
                self.merged_ed_predictors = [Conv1dSame(k, dt) for k in ks]
                self.combine_st_conv = nn.Dense(
                    1, use_bias=False, kernel_init=_normal_init(), dtype=dt)
                self.combine_ed_conv = nn.Dense(
                    1, use_bias=False, kernel_init=_normal_init(), dtype=dt)

    def _make_encoder(self):
        c = self.cfg
        if c.encoder_type == "transformer":
            return BertAttention(c.n_heads, c.drop, c.drop, c.dtype)
        if c.encoder_type == "cnn":
            return ConvEncoder(kernel_size=5, dropout=c.drop, dtype=c.dtype)
        if c.encoder_type in ("lstm", "gru"):
            return RNNEncoderLayer(c.hidden_size, c.encoder_type, c.dtype)
        raise NotImplementedError(f"encoder_type {c.encoder_type}")

    # ------------------------------------------------------------------ input
    def encode_input(self, feat, mask, proj, encoder, pos_embed, deterministic):
        """project -> +pos-embed (LN+drop) -> 1 encoder layer
        (reference model_xml.py:377-397). RNN encoders only add the
        positional embedding when add_pe_rnn is set (:393-397)."""
        x = proj(feat, deterministic=deterministic)
        if self.cfg.encoder_type in ("transformer", "cnn") or self.cfg.add_pe_rnn:
            x = pos_embed(x, deterministic=deterministic)
        return encoder(x, mask, deterministic=deterministic)

    # ------------------------------------------------------------------ query
    def encode_query(self, query_feat, query_mask, deterministic: bool = True):
        encoded = self.encode_input(query_feat, query_mask, self.query_input_proj,
                                    self.query_encoder, self.query_pos_embed, deterministic)
        return self.get_modularized_queries(encoded, query_mask)

    def get_modularized_queries(self, encoded_query, query_mask):
        """Softmax attention pooling into one query vector per stream
        (reference model_xml.py:399-423). Column 0 = video, 1 = sub."""
        if self.cfg.no_modular:
            pooled = mask_logits(encoded_query, query_mask[:, :, None]).max(axis=1)
            return pooled, pooled
        att = self.modular_vector_mapping(encoded_query)          # (N, L, n_streams)
        att = jax.nn.softmax(mask_logits(att, query_mask[:, :, None]), axis=1)
        queries = jnp.einsum("blm,bld->bmd", att, encoded_query,
                             preferred_element_type=jnp.float32).astype(encoded_query.dtype)
        if self.cfg.n_streams == 2:
            return queries[:, 0], queries[:, 1]
        return queries[:, 0], queries[:, 0]

    # ---------------------------------------------------------------- context
    def encode_context(self, video_feat, video_mask, sub_feat, sub_mask,
                       deterministic: bool = True):
        """Returns (video_feat1, video_feat2, sub_feat1, sub_feat2); feat1 is
        the retrieval stream, feat2 the localization stream
        (reference model_xml.py:331-355)."""
        c = self.cfg
        if c.cross_att:
            assert c.use_video and c.use_sub, "cross_att requires both streams"
            ev = self.encode_input(video_feat, video_mask, self.video_input_proj,
                                   self.video_encoder1, self.ctx_pos_embed, deterministic)
            es = self.encode_input(sub_feat, sub_mask, self.sub_input_proj,
                                   self.sub_encoder1, self.ctx_pos_embed, deterministic)
            xv = self._cross_context(ev, video_mask, es, sub_mask,
                                     self.video_cross_att, self.video_cross_ln,
                                     self.video_encoder2, deterministic)
            xs = self._cross_context(es, sub_mask, ev, video_mask,
                                     self.sub_cross_att, self.sub_cross_ln,
                                     self.sub_encoder2, deterministic)
            return ev, xv, es, xs

        vf1 = vf2 = sf1 = sf2 = None
        if c.use_video:
            vf1 = self.encode_input(video_feat, video_mask, self.video_input_proj,
                                    self.video_encoder1, self.ctx_pos_embed, deterministic)
            vf2 = self.video_encoder2(vf1, video_mask, deterministic=deterministic)
            if c.encoder_type == "transformer":
                vf2 = self.video_encoder3(vf2, video_mask, deterministic=deterministic)
        if c.use_sub:
            sf1 = self.encode_input(sub_feat, sub_mask, self.sub_input_proj,
                                    self.sub_encoder1, self.ctx_pos_embed, deterministic)
            sf2 = self.sub_encoder2(sf1, sub_mask, deterministic=deterministic)
            if c.encoder_type == "transformer":
                sf2 = self.sub_encoder3(sf2, sub_mask, deterministic=deterministic)
        return vf1, vf2, sf1, sf2

    def _cross_context(self, main, main_mask, side, side_mask,
                       cross_att, norm, self_att, deterministic):
        """cross-att(main<-side) + LN residual + self-att layer
        (reference model_xml.py:357-375)."""
        cross_mask = jnp.einsum("bm,bn->bmn", main_mask, side_mask)
        out = cross_att(main, side, side, cross_mask, deterministic=deterministic)
        residual = norm(out + main)
        return self_att(residual, main_mask, deterministic=deterministic)

    # ------------------------------------------------------------------ spans
    def _span_conv(self, st_predictor, ed_predictor, similarity):
        return st_predictor(similarity), ed_predictor(similarity)

    def _merged_span_conv(self, similarity):
        """Single or stacked merged-stream ConvSE (reference
        get_merged_st_ed_prob, model_xml.py:469-480: each kernel-size conv
        runs over the similarity rows; a bias-free linear combines them)."""
        if self.cfg.stack_conv_predictor_conv_kernel_sizes is None:
            return (self.merged_st_predictor(similarity),
                    self.merged_ed_predictor(similarity))
        st_stack = jnp.stack([p(similarity) for p in self.merged_st_predictors], axis=-1)
        ed_stack = jnp.stack([p(similarity) for p in self.merged_ed_predictors], axis=-1)
        return (self.combine_st_conv(st_stack)[..., 0],
                self.combine_ed_conv(ed_stack)[..., 0])

    def merged_st_ed_scores(self, video_query, video_feat2, sub_query, sub_feat2,
                            context_mask, cross: bool = False):
        """Merged-stream span logits (reference get_merged_st_ed_prob :455-502).

        cross=False: per-pair (B, L). cross=True: every query against every
        video, (Nq, Nv, L) — the corpus-inference path.
        """
        c = self.cfg
        assert c.use_video and c.use_sub and c.span_predictor_type == "conv"
        vq = self.video_query_linear(video_query)
        sq = self.sub_query_linear(sub_query)
        if cross:
            sim_v = jnp.einsum("md,nld->mnl", vq, video_feat2,
                               preferred_element_type=jnp.float32)
            sim_s = jnp.einsum("md,nld->mnl", sq, sub_feat2,
                               preferred_element_type=jnp.float32)
            similarity = ((sim_v + sim_s) / 2).astype(video_feat2.dtype)
            mask = context_mask[None]                 # (1, Nv, L)
        else:
            sim_v = jnp.einsum("bd,bld->bl", vq, video_feat2,
                               preferred_element_type=jnp.float32)
            sim_s = jnp.einsum("bd,bld->bl", sq, sub_feat2,
                               preferred_element_type=jnp.float32)
            similarity = ((sim_v + sim_s) / 2).astype(video_feat2.dtype)
            mask = context_mask
        st, ed = self._merged_span_conv(similarity)
        return mask_logits(st, mask), mask_logits(ed, mask)

    def merged_st_ed_scores_gathered(self, video_query, video_feat2_g,
                                     sub_query, sub_feat2_g, mask_g):
        """Span logits on per-query GATHERED video rows.

        Exact equivalent of ``merged_st_ed_scores(..., cross=True)`` followed
        by a row gather — the ConvSE conv and masking are per-row, so
        gather-then-conv == conv-then-gather. Lets corpus inference compute
        span scores for only the top-V videos per query (~200x less HBM
        traffic than the reference's conv over every video,
        model_xml.py:463-480).

        Args:
            video_query/sub_query: (Nq, D)
            video_feat2_g/sub_feat2_g: (Nq, V, L, D) gathered rows
            mask_g: (Nq, V, L)
        Returns:
            st, ed logits (Nq, V, L), masked.
        """
        c = self.cfg
        assert c.use_video and c.use_sub and c.span_predictor_type == "conv"
        vq = self.video_query_linear(video_query)
        sq = self.sub_query_linear(sub_query)
        sim_v = jnp.einsum("qd,qvld->qvl", vq.astype(video_feat2_g.dtype),
                           video_feat2_g, preferred_element_type=jnp.float32)
        sim_s = jnp.einsum("qd,qvld->qvl", sq.astype(sub_feat2_g.dtype),
                           sub_feat2_g, preferred_element_type=jnp.float32)
        # the einsum consumes the gathered rows at cache dtype (skips
        # materializing a 2x-size f32 copy in HBM) and accumulates f32; with
        # a bf16 cache the query vector rounds to bf16 exactly like the
        # video-level scoring stage does (engine scores_prenormalized).
        # similarity stays f32 into the conv.
        similarity = (sim_v + sim_s) / 2
        st, ed = self._merged_span_conv(similarity)
        return mask_logits(st, mask_g), mask_logits(ed, mask_g)

    def merged_st_ed_scores_simgather(self, video_query, video_feat2, sub_query,
                                      sub_feat2, context_mask, gather_idx):
        """Span logits for per-query selected videos via a FULL-CORPUS
        similarity sweep + tiny sim-row gather.

        Exact equivalent of ``merged_st_ed_scores_gathered`` on rows
        ``gather_idx`` — the per-(query, video) similarity is one scalar per
        clip, so gathering sim rows moves 2*D fewer bytes than gathering
        feature rows (D=256: ~512x less). The corpus-wide einsum reads the
        feat2 cache SEQUENTIALLY at HBM bandwidth instead of the row
        gather's ~70 GB/s effective random access; conv/softmax run on the
        gathered rows only (per-row ops, reference model_xml.py:463-497).

        Bit-exactness: each stream's einsum contracts the same D=256 at f32
        accumulation as the gathered einsum, the merge (v+s)/2 happens after
        the gather on identical f32 values, and conv/mask are per-row — so
        outputs are bit-equal to the gathered path (tested).

        Args:
            video_query/sub_query: (Nq, D) modular query vectors
            video_feat2/sub_feat2: (Nv, L, D) full corpus cache
            context_mask: (Nv, L)
            gather_idx: (Nq, V) per-query video indices to keep
        Returns:
            st, ed logits (Nq, V, L), masked.
        """
        c = self.cfg
        assert c.use_video and c.use_sub and c.span_predictor_type == "conv"
        vq = self.video_query_linear(video_query)
        sq = self.sub_query_linear(sub_query)
        sim_v = jnp.einsum("qd,nld->qnl", vq.astype(video_feat2.dtype),
                           video_feat2, preferred_element_type=jnp.float32)
        sim_s = jnp.einsum("qd,nld->qnl", sq.astype(sub_feat2.dtype),
                           sub_feat2, preferred_element_type=jnp.float32)
        gv = jnp.take_along_axis(sim_v, gather_idx[:, :, None], axis=1)
        gs = jnp.take_along_axis(sim_s, gather_idx[:, :, None], axis=1)
        similarity = (gv + gs) / 2                       # (Nq, V, L) f32
        mask_g = context_mask[gather_idx]                # (Nq, V, L)
        st, ed = self._merged_span_conv(similarity)
        return mask_logits(st, mask_g), mask_logits(ed, mask_g)

    def merged_st_ed_scores_simgather_cat(self, video_query, sub_query,
                                          feat2_cat, context_mask, gather_idx,
                                          sim_dtype=None):
        """``merged_st_ed_scores_simgather`` with the two feat2 streams
        CONCATENATED in the cache (feat2_cat = [video_feat2 ; sub_feat2] on
        the feature axis): one K=2D einsum replaces two K=D einsums + merge,
        halving the (Nq, Nv, L) f32 similarity traffic.

        The stream merge (sim_v + sim_s) / 2 is folded into the query side:
        halving the query vectors BEFORE the cache-dtype cast is exact (a
        power-of-two scale only shifts the exponent), so the contraction
        accumulates 0.5*vq.vf2 + 0.5*sq.sf2 directly. Values can differ
        from the two-einsum path only by f32 accumulation order (K=2D in
        one sum vs two K=D sums added).

        sim_dtype: optional storage dtype for the corpus-wide similarity
        (e.g. jnp.bfloat16 — engine mode "simsweep_cat_bf16"). The dot
        still accumulates f32; rounding enters ONCE, on the stored
        similarity (relative error <= 2^-9), and the gathered rows are
        upcast so conv/softmax stay f32 (tolerance-tested on CPU). On the
        TPU toolchain in this image the rounding is ELIDED by XLA's
        excess-precision rule and outputs measure bit-equal to
        sim_dtype=None at the same speed (BENCH_NOTES round 3) — the knob
        is for backends/flags where the narrow store is real.

        feat2_cat's clip axis may be LONGER than context_mask's L
        (RetrievalConfig.span_sim_pad_l: cache zero-padded to a lane-tile
        multiple so the materialized similarity is layout-exact). The pad
        columns produce qcat . 0 = 0 similarities that the slice below
        discards before conv — mathematically a no-op; values agree with
        the unpadded cache to accumulation-order slack (the changed dot
        shape may re-tile the contraction; tests/test_span_score_modes.py).
        """
        c = self.cfg
        assert c.use_video and c.use_sub and c.span_predictor_type == "conv"
        vq = self.video_query_linear(video_query)
        sq = self.sub_query_linear(sub_query)
        qcat = jnp.concatenate([vq, sq], axis=-1) * 0.5
        sim = jnp.einsum("qd,nld->qnl", qcat.astype(feat2_cat.dtype),
                         feat2_cat, preferred_element_type=jnp.float32)
        if sim_dtype is not None:
            # optimization_barrier pins the narrow buffer: XLA-TPU's
            # excess-precision rule (xla_allow_excess_precision, default on)
            # otherwise deletes the f32 -> bf16 -> f32 round-trip, silently
            # keeping the f32 similarity (verified on-chip: outputs came
            # back bit-equal and the AOT temp did not shrink)
            sim = jax.lax.optimization_barrier(sim.astype(sim_dtype))
        similarity = jnp.take_along_axis(
            sim, gather_idx[:, :, None],
            axis=1)[:, :, :context_mask.shape[1]].astype(jnp.float32)
        mask_g = context_mask[gather_idx]                # (Nq, V, L)
        st, ed = self._merged_span_conv(similarity)
        return mask_logits(st, mask_g), mask_logits(ed, mask_g)

    def merged_st_ed_scores_simgather_cat_i8(self, video_query, sub_query,
                                             feat2_cat_i8, feat2_scale,
                                             context_mask, gather_idx):
        """``merged_st_ed_scores_simgather_cat`` with the concatenated cache
        stored INT8 (engine mode "simsweep_cat_int8"): the corpus-wide
        similarity einsum contracts s8 x s8 -> s32 on the MXU (2x the bf16
        FLOP rate on v5e, half the feat2 HBM), and the f32 rescale happens
        only on the tiny gathered (Nq, V, L) rows.

        Quantization layout (ops.pallas_score.quantize_rows_i8): feat2_cat
        rows are scaled per (video, clip) over the concatenated 2D feature
        axis — feat2 is not unit-norm, so scales are stored
        (``feat2_scale``, (Nv, L) f32). The halved query vectors quantize
        per query at score time. The gathered integer dot rescales by
        s_q[q] * s_f[v, l]; integer accumulation is exact, so the ONLY
        approximation is the two input roundings (per-component error
        <= row_max / 254 each). NOT a parity mode — accuracy contract is
        the trained-checkpoint metric A/B (BENCH_NOTES round 3).
        Reference op being approximated: model_xml.py:463-480 restricted
        to the top-V rows of inference.py:348.
        """
        c = self.cfg
        assert c.use_video and c.use_sub and c.span_predictor_type == "conv"
        vq = self.video_query_linear(video_query)
        sq = self.sub_query_linear(sub_query)
        qcat = jnp.concatenate([vq, sq], axis=-1).astype(jnp.float32) * 0.5
        q_scale = jnp.maximum(
            jnp.max(jnp.abs(qcat), axis=-1, keepdims=True) / 127.0, 1e-12)
        q8 = jnp.clip(jnp.round(qcat / q_scale), -127, 127).astype(jnp.int8)
        sim_i32 = jnp.einsum("qd,nld->qnl", q8.astype(jnp.int32),
                             feat2_cat_i8.astype(jnp.int32),
                             preferred_element_type=jnp.int32)
        g = jnp.take_along_axis(sim_i32, gather_idx[:, :, None], axis=1)
        scale_g = feat2_scale[gather_idx]                # (Nq, V, L)
        similarity = g.astype(jnp.float32) * (q_scale[:, None] * scale_g)
        mask_g = context_mask[gather_idx]
        st, ed = self._merged_span_conv(similarity)
        return mask_logits(st, mask_g), mask_logits(ed, mask_g)

    def merged_st_ed_scores_pallas_cat_i8(self, video_query, sub_query,
                                          f8_flat, f_scales, context_mask,
                                          gather_idx, chunk_v: int = 16,
                                          q_tile: int = 128,
                                          interpret: bool = False):
        """``merged_st_ed_scores_simgather_cat_i8`` with the corpus-wide
        sweep run as the fused Pallas kernel (engine mode
        ``span_score_mode="simsweep_cat_int8_flat"``).

        The cache is the video-major int8 flat layout from
        ops.pallas_score.build_flat_feat2_i8 ((Nv_pad * lp, 2D) + per-row
        scales); span_sim_pallas_cat_i8 writes the similarity bf16 in a
        gather-friendly (Nq, Nv_pad, lp) layout — the s32 integer dot never
        reaches HBM (what OOM'd the XLA "simsweep_cat_int8" einsum at
        corpus scale, BENCH_NOTES round 3) and the s8 dot runs at 2x the
        bf16 MXU rate. The gathered rows are upcast so conv/softmax stay
        f32.

        Same integer dot as "simsweep_cat_int8"; differs from it only by
        the kernel's rescale association ((s*qs)*fs vs s*(qs*fs)) and the
        bf16 similarity store — NOT a parity mode; accuracy contract =
        trained-checkpoint metric A/B. The kernel itself is bit-equal to
        ops.pallas_score.span_sim_int8_xla (tests/test_pallas_score.py).
        Reference op being approximated: model_xml.py:463-480 restricted
        to the top-V rows of inference.py:348.
        """
        from tvretrieval_tpu.ops.pallas_score import span_sim_pallas_cat_i8
        c = self.cfg
        assert c.use_video and c.use_sub and c.span_predictor_type == "conv"
        vq = self.video_query_linear(video_query)
        sq = self.sub_query_linear(sub_query)
        qcat = jnp.concatenate([vq, sq], axis=-1).astype(jnp.float32) * 0.5
        q_scale = jnp.maximum(
            jnp.max(jnp.abs(qcat), axis=-1, keepdims=True) / 127.0, 1e-12)
        q8 = jnp.clip(jnp.round(qcat / q_scale), -127, 127).astype(jnp.int8)
        lp = f_scales.shape[1]
        sim = span_sim_pallas_cat_i8(q8, q_scale, f8_flat, f_scales, lp=lp,
                                     chunk_v=chunk_v, q_tile=q_tile,
                                     interpret=interpret)  # (Nq, Nv_pad, lp)
        L = context_mask.shape[1]
        similarity = jnp.take_along_axis(
            sim, gather_idx[:, :, None], axis=1)[:, :, :L].astype(jnp.float32)
        mask_g = context_mask[gather_idx]
        st, ed = self._merged_span_conv(similarity)
        return mask_logits(st, mask_g), mask_logits(ed, mask_g)

    def single_stream_st_ed_scores(self, query, feat2, mask, stream: str, cross: bool = False):
        """Per-stream span logits (reference _get_st_ed_prob :512-551)."""
        c = self.cfg
        q = (self.video_query_linear if stream == "video" else self.sub_query_linear)(query)
        if c.span_predictor_type == "conv":
            stp = getattr(self, f"{stream}_st_predictor")
            edp = getattr(self, f"{stream}_ed_predictor")
            if cross:
                sim = jnp.einsum("md,nld->mnl", q, feat2, preferred_element_type=jnp.float32)
                sim = sim.astype(feat2.dtype)
                st, ed = stp(sim), edp(sim)
                mask = mask[None]
            else:
                sim = jnp.einsum("bd,bld->bl", q, feat2, preferred_element_type=jnp.float32)
                sim = sim.astype(feat2.dtype)
                st, ed = stp(sim), edp(sim)
        elif c.span_predictor_type == "cat_linear":
            st_q = getattr(self, f"{stream}_st_q")(q)          # (Nq, 1)
            st_ctx = getattr(self, f"{stream}_st_ctx")(feat2)[..., 0]  # (Nv, L)
            ed_q = getattr(self, f"{stream}_ed_q")(q)
            ed_ctx = getattr(self, f"{stream}_ed_ctx")(feat2)[..., 0]
            if cross:
                st = st_q[:, :, None] + st_ctx[None]            # (Nq, Nv, L)
                ed = ed_q[:, :, None] + ed_ctx[None]
                mask = mask[None]
            else:
                st = st_q + st_ctx
                ed = ed_q + ed_ctx
        else:
            raise NotImplementedError(c.span_predictor_type)
        return mask_logits(st, mask), mask_logits(ed, mask)

    # ------------------------------------------------------------- prediction
    def get_pred_from_raw_query(self, query_feat, query_mask,
                                video_feat1, video_feat2, video_mask,
                                sub_feat1, sub_feat2, sub_mask,
                                cross: bool = False, deterministic: bool = True):
        """(q2ctx_scores, st_logits, ed_logits) — reference model_xml.py:553-586.

        cross=False: in-batch pairs, q2ctx (N, N), spans (N, L).
        cross=True:  all queries x all videos, q2ctx (Nq, Nv), spans (Nq, Nv, L).
        """
        c = self.cfg
        video_query, sub_query = self.encode_query(query_feat, query_mask, deterministic)

        v_scores = cosine_video_scores(video_query, video_feat1, video_mask) if c.use_video else 0
        s_scores = cosine_video_scores(sub_query, sub_feat1, sub_mask) if c.use_sub else 0
        q2ctx = (v_scores + s_scores) / c.n_streams

        if c.merge_two_stream and c.use_video and c.use_sub:
            st, ed = self.merged_st_ed_scores(video_query, video_feat2,
                                              sub_query, sub_feat2, video_mask, cross)
        else:
            vst, ved = (self.single_stream_st_ed_scores(video_query, video_feat2,
                                                        video_mask, "video", cross)
                        if c.use_video else (0, 0))
            sst, sed = (self.single_stream_st_ed_scores(sub_query, sub_feat2,
                                                        sub_mask, "sub", cross)
                        if c.use_sub else (0, 0))
            st = (vst + sst) / c.n_streams
            ed = (ved + sed) / c.n_streams
        return q2ctx, st, ed

    # --------------------------------------------------------- visualization
    def visualization_data(self, query_feat, query_mask, video_feat, video_mask,
                           sub_feat, sub_mask):
        """Per-example introspection tensors (reference get_visualization_data,
        model_xml.py:253-289): modular attention over query tokens, merged
        st/ed probabilities, and the per-stream span similarities. The host
        slices each array by its true length."""
        c = self.cfg
        assert c.merge_two_stream and c.use_video and c.use_sub and not c.no_modular
        vf1, vf2, sf1, sf2 = self.encode_context(video_feat, video_mask,
                                                 sub_feat, sub_mask, True)
        encoded_query = self.encode_input(
            query_feat, query_mask, self.query_input_proj, self.query_encoder,
            self.query_pos_embed, True)
        att = self.modular_vector_mapping(encoded_query)            # (N, Lq, 2)
        att = jax.nn.softmax(mask_logits(att, query_mask[:, :, None]), axis=1)
        queries = jnp.einsum("blm,bld->bmd", att, encoded_query,
                             preferred_element_type=jnp.float32
                             ).astype(encoded_query.dtype)
        vq, sq = queries[:, 0], queries[:, 1]

        vql = self.video_query_linear(vq)
        sql = self.sub_query_linear(sq)
        sim_v = jnp.einsum("bd,bld->bl", vql, vf2,
                           preferred_element_type=jnp.float32)
        sim_s = jnp.einsum("bd,bld->bl", sql, sf2,
                           preferred_element_type=jnp.float32)
        similarity = ((sim_v + sim_s) / 2).astype(vf2.dtype)
        st_raw, ed_raw = self._merged_span_conv(similarity)
        st = mask_logits(st_raw, video_mask)
        ed = mask_logits(ed_raw, video_mask)
        return dict(
            modular_att_scores=att,
            st_prob=jax.nn.softmax(st.astype(jnp.float32), axis=-1),
            ed_prob=jax.nn.softmax(ed.astype(jnp.float32), axis=-1),
            similarity_scores=similarity,
            video_similarity=sim_v,
            sub_similarity=sim_s,
        )

    # -------------------------------------------------------------- training
    def __call__(self, query_feat, query_mask, video_feat, video_mask,
                 sub_feat, sub_mask, st_ed_indices,
                 lw_st_ed: jnp.ndarray = 0.01,
                 neg_sample_upper: Optional[jnp.ndarray] = None,
                 deterministic: bool = False):
        """Training forward: total loss + per-loss dict (reference :212-251).

        Args:
            lw_st_ed: traced span-loss weight (0 before train_span_start_epoch).
            neg_sample_upper: exclusive upper bound of the sampled negative
                *rank*; batch size when hard negatives are off,
                1 + hard_pool_size once they turn on (reference :608-624).
        """
        c = self.cfg
        vf1, vf2, sf1, sf2 = self.encode_context(
            video_feat, video_mask, sub_feat, sub_mask, deterministic)
        q2ctx, st_logits, ed_logits = self.get_pred_from_raw_query(
            query_feat, query_mask, vf1, vf2, video_mask, sf1, sf2, sub_mask,
            cross=False, deterministic=deterministic)

        st_logits = st_logits.astype(jnp.float32)
        ed_logits = ed_logits.astype(jnp.float32)
        loss_st = _cross_entropy(st_logits, st_ed_indices[:, 0])
        loss_ed = _cross_entropy(ed_logits, st_ed_indices[:, 1])
        loss_st_ed = loss_st + loss_ed

        bsz = q2ctx.shape[0]
        if neg_sample_upper is None:
            neg_sample_upper = jnp.asarray(bsz)
        # the sampled negative rank must stay inside the row — the reference
        # derives the bound from the ACTUAL batch size (model_xml.py:612-615),
        # which matters for a smaller final eval batch
        neg_sample_upper = jnp.minimum(neg_sample_upper, bsz)
        key = self.make_rng("negatives") if not deterministic else jax.random.PRNGKey(0)
        loss_neg_ctx, loss_neg_q = video_level_ranking_losses(
            q2ctx.astype(jnp.float32), key, margin=c.margin,
            loss_type=c.ranking_loss_type, neg_sample_upper=neg_sample_upper)

        loss = (lw_st_ed * loss_st_ed
                + c.lw_neg_ctx * loss_neg_ctx
                + c.lw_neg_q * loss_neg_q)
        return loss, {
            "loss_st_ed": lw_st_ed * loss_st_ed,
            "loss_neg_ctx": c.lw_neg_ctx * loss_neg_ctx,
            "loss_neg_q": c.lw_neg_q * loss_neg_q,
            "loss_overall": loss,
        }


def _cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1).mean()


def video_level_ranking_losses(scores: jnp.ndarray, key: jax.Array, margin: float,
                               loss_type: str, neg_sample_upper: jnp.ndarray):
    """In-batch ranking losses with randomized (optionally hard) negatives.

    scores: (N, N) cosine similarities, diagonal = positives. For each row a
    negative is drawn uniformly from ranks [1, neg_sample_upper) of the
    descending-sorted row (diagonal pinned to rank 0 via a +999 mask), then
    hinge or LSE loss pushes pos above neg (reference model_xml.py:588-637).
    """
    n = scores.shape[0]
    idx = jnp.arange(n)
    pos = scores[idx, idx]
    eye = jnp.eye(n, dtype=scores.dtype)
    masked = scores * (1 - eye) + eye * 999.0

    def sample_neg(s, s_masked, k):
        order = jnp.argsort(-s_masked, axis=1)              # rank 0 = diagonal
        ranks = jax.random.randint(k, (n,), 1, jnp.maximum(neg_sample_upper, 2))
        neg_cols = jnp.take_along_axis(order, ranks[:, None], axis=1)[:, 0]
        return s[idx, neg_cols]

    k_ctx, k_q = jax.random.split(key)
    neg_ctx = sample_neg(scores, masked, k_ctx)             # pos query, neg video
    neg_q = sample_neg(scores.T, masked.T, k_q)             # neg query, pos video

    def rank_loss(p, ng):
        if loss_type == "hinge":
            return jnp.maximum(0.0, margin + ng - p).mean()
        if loss_type == "lse":
            return jnp.log1p(jnp.exp(ng - p)).mean()
        raise NotImplementedError(loss_type)

    return rank_loss(pos, neg_ctx), rank_loss(pos, neg_q)
