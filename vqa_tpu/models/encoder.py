"""Question/visual encoders.

TPU-native equivalents of `/root/reference/modules/encoder.py`:

- ``BaseEncoder`` (encoder.py:96-183) — Up-Down VQA encoder: word embed ->
  1-layer GRU question encoding (output of the last *padded* step) -> top-down
  attention over the 36 boxes -> ``v_att * v`` weighted features; also embeds
  caption tokens for downstream heads. Unlike the reference, caption inputs
  are optional (SURVEY.md section 2.1 defect 3: the reference unconditionally
  reads ``batch['c']`` so the plain VQA dataset crashes; fixed here).
- ``RelationEncoder`` (encoder.py:186-272) — ReGAT: BaseEncoder + per-relation
  GCN over the spatial adjacency and/or a fully-connected implicit graph,
  summed into ``v``.
- ``CaptionEncoder`` (encoder.py:66-94) — caption-only minimal encoder.

Batch dict convention (all fixed-shape device arrays):
  ``img`` [B, num_objs, v_dim] float; ``q`` [B, q_len] int32;
  ``c`` [B, c_len] int32 (optional); ``cap_len`` [B] int32 (optional);
  ``graph`` [B, num_objs, num_objs] int32 labels (relation encoder only).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from vqa_tpu.ops.linear import FCNet
from vqa_tpu.ops.rnn import SentenceEmbedding
from vqa_tpu.ops.attention import set_att
from vqa_tpu.ops.embedding import WordEmbedding
from vqa_tpu.ops.gcn import GCN


class CaptionEncoder(nn.Module):
    """Caption-only encoder: embeds caption tokens, passes raw v through
    (encoder.py:66-94)."""

    ntoken: int
    embed_dim: int
    frozen_embedding: Optional[np.ndarray] = None

    def setup(self):
        self.embedding = WordEmbedding(self.ntoken, self.embed_dim,
                                       frozen_table=self.frozen_embedding,
                                       name="embedding")

    def embed(self, tokens: jax.Array) -> jax.Array:
        return self.embedding(tokens)

    def __call__(self, batch: Dict[str, jax.Array], *, deterministic: bool = True
                 ) -> Dict[str, Any]:
        out = {"v": BaseEncoder._visual_input(batch)}
        if "img_q" in batch:
            # factored form for int8-aware consumers: v == v_w * v_q8
            # (no attention here, so the weights are just the dequant
            # scales — see BaseEncoder.base_forward)
            out["v_q8"] = batch["img_q"]
            out["v_w"] = batch["img_scale"]
        if "c" in batch:
            out["c"] = self.embedding(batch["c"])
            out["c_target"] = batch["c"]
            out["cap_len"] = batch["cap_len"]
        return out


class BaseEncoder(nn.Module):
    """Up-Down VQA encoder (encoder.py:96-183)."""

    ntoken: int
    embed_dim: int
    hidden_dim: int
    rnn_layer: int = 1
    dropout: float = 0.5
    rnn_type: str = "GRU"
    att_type: str = "base"
    # MultiplyAttention's joint-dropout rate; the reference hardcodes the
    # default 0.2 (attention.py:61,65) independently of --dropout.
    att_dropout: float = 0.2
    frozen_embedding: Optional[np.ndarray] = None
    use_pallas: bool = False   # fused Pallas question-GRU (opt-in fast path)
    # int8 MXU attention v-projection, fed by the quantized feature feed
    # (img_q/img_scale batches). Inference-only: weight quantization rounds,
    # so the training path keeps the differentiable dequant+f32 GEMM.
    use_int8: bool = False
    # lazy v (inference, int8 feed only): emit 'v_sum' pooled directly over
    # the int8 payload so heads that consume v.sum(1) never materialize the
    # dequantized [B, objs, v_dim] features (exact algebra, fp reorder —
    # PARITY.md "Deterministic folds"). Independent of use_int8: it changes
    # where the dequant multiplies, not whether GEMMs run int8.
    lazy_v: bool = True

    def setup(self):
        self.embedding = WordEmbedding(self.ntoken, self.embed_dim,
                                       frozen_table=self.frozen_embedding,
                                       name="embedding")
        # torch applies RNN dropout only *between* stacked layers, so the
        # reference's SentenceEmbedding(..., dropout=args.dropout)
        # (encoder.py:129-136) is active exactly when rnn_layer > 1.
        self.q_rnn = SentenceEmbedding(self.hidden_dim, rnn_layer=self.rnn_layer,
                                       dropout=self.dropout, rnn_type=self.rnn_type,
                                       use_pallas=self.use_pallas,
                                       name="q_rnn")
        att_kwargs = {"hidden_dim": self.hidden_dim, "name": "attention"}
        if self.att_type == "new":
            att_kwargs["dropout"] = self.att_dropout
        self.attention = set_att(self.att_type)(**att_kwargs)
        self.q_net = FCNet(self.hidden_dim, name="q_net")

    def embed(self, tokens: jax.Array) -> jax.Array:
        """Expose the word embedding for decoders / beam search
        (mirrors model.encoder.embedding use at tools/caption.py:93)."""
        return self.embedding(tokens)

    @staticmethod
    def _visual_input(batch: Dict[str, jax.Array]) -> jax.Array:
        """Visual features, with on-device int8 dequantization when the feed
        ships quantized payloads ('img_q' int8 + 'img_scale' per-box) —
        halves host->HBM bytes vs f16 (see data/shards.py). Dequantizes in
        the *scale's* dtype, so a bf16-scaled feed yields bf16 features (the
        int8 values themselves are exact in bf16)."""
        if "img_q" in batch:
            s = batch["img_scale"]
            return batch["img_q"].astype(s.dtype) * s[..., None]
        return batch["img"]

    def base_forward(self, batch: Dict[str, jax.Array], *,
                     deterministic: bool = True) -> Dict[str, Any]:
        v = self._visual_input(batch)
        q = self.embedding(batch["q"])                 # [B, q_len, embed]
        q = self.q_rnn(q, deterministic=deterministic)  # [B, hidden] (last padded step)
        v_cache = None
        if self.use_int8 and "img_q" in batch and deterministic:
            # use_pallas routes the 3-D-native fused kernel
            # (ops/pallas/int8_matmul.py int8_matmul_dequant_3d: int8 MXU
            # dot + dequant + bias + ReLU all in VMEM, no flatten in the
            # graph). The 2-D kernel and the XLA int8 dot both lose
            # in-situ to epilogue un-fusion / relayout copies — PERF.md
            # "Round-3 int8-GEMM shootout" has the full measured chain.
            v_cache = self.attention.project_v_int8(
                batch["img_q"], batch["img_scale"], q_dim=q.shape[-1],
                use_pallas=self.use_pallas).astype(v.dtype)
        v_att = self.attention(v, q, deterministic=deterministic,
                               v_cache=v_cache)        # [B, objs, 1]
        v = v_att * v
        q = self.q_net(q, deterministic=deterministic)
        out = {"v": v, "q": q, "v_att": v_att}
        if "img_q" in batch:
            # factored attended features: v == v_w[:, :, None] * v_q8
            # exactly (the dequant scale folded into the attention
            # weights). Downstream int8-aware consumers (the decoder's
            # factored_v scan, ops/decode_scan.py) read the int8 payload
            # directly; out['v'] stays for everything else (XLA DCEs it
            # when nothing reads it).
            w = v_att[..., 0] * batch["img_scale"].astype(v.dtype)
            out["v_q8"], out["v_w"] = batch["img_q"], w
            if self.lazy_v:
                # lazy v ("fold the scale into the attention weights"): the
                # base predictors consume v.sum(1) only, so pool directly
                # over the int8 payload — the dequantized [B, objs, v_dim]
                # features never hit HBM on that path. Exact algebra (fp
                # reorder, PARITY.md "Deterministic folds"); active in
                # training too — the einsum differentiates to the same
                # values as sum(v_att * v, 1) up to fp reorder. Replaces
                # the feed economics of /root/reference/dataset.py:93-104.
                pooled = None
                if self.use_int8 and self.use_pallas and deterministic:
                    # in the int8-GEMM graph the pooling einsum's product
                    # materializes (the kernel's row-major output shifts
                    # XLA's layout choices); the fused pooling kernel
                    # reads the int8 payload directly and keeps both
                    # img_q consumers on the same layout
                    from vqa_tpu.ops.pallas import lazyv_pool
                    if lazyv_pool.supports(*batch["img_q"].shape):
                        pooled = lazyv_pool.pool_int8(
                            w, batch["img_q"],
                            interpret=jax.default_backend() != "tpu")
                if pooled is None:
                    pooled = jnp.einsum("bn,bnd->bd", w,
                                        batch["img_q"].astype(w.dtype))
                out["v_sum"] = pooled
        if "c" in batch:
            out["c"] = self.embedding(batch["c"])
            out["c_target"] = batch["c"]
            out["cap_len"] = batch["cap_len"]
        return out

    def __call__(self, batch, *, deterministic: bool = True):
        return self.base_forward(batch, deterministic=deterministic)


class RelationEncoder(BaseEncoder):
    """ReGAT spatial/implicit relation encoder (encoder.py:186-272)."""

    conv_layer: int = 1
    conv_type: str = "corr"
    use_imp: bool = False
    use_spa: bool = True
    use_sem: bool = False  # semantic relations: reference stub (relation.py:48-62)
    num_objs: int = 36
    v_dim: int = 2048

    def setup(self):
        super().setup()
        assert self.use_imp or self.use_spa or self.use_sem, \
            "Should use at least one relation"
        gcn_kwargs = dict(conv_layer=self.conv_layer,
                          conv_type=self.conv_type, dropout=self.dropout,
                          use_pallas=self.use_pallas, use_int8=self.use_int8)
        if self.use_imp:
            self.implicit_encoder = GCN(self.v_dim, name="implicit_encoder",
                                        **gcn_kwargs)
        if self.use_spa:
            self.spatial_encoder = GCN(self.v_dim, name="spatial_encoder",
                                       **gcn_kwargs)
        if self.use_sem:
            # Semantic-relation branch: the graph itself must come from an
            # external relationship detector (see data/relation.py
            # semantic_relation docstring — the reference stubs this too,
            # relation.py:48-62), but the encoder-side wiring is complete:
            # feed int labels as batch['sem_graph'].
            self.semantic_encoder = GCN(self.v_dim, num_labels=15,
                                        name="semantic_encoder",
                                        **gcn_kwargs)

    def __call__(self, batch, graph_alpha: bool = False, *,
                 deterministic: bool = True):
        out = self.base_forward(batch, deterministic=deterministic)
        v = out["v"]
        batch_size, num_objs = v.shape[0], v.shape[1]
        output_v = jnp.zeros_like(v)
        g_att = []
        if self.use_imp:
            # Fully-connected graph: ones - eye (encoder.py:232-234).
            imp = (jnp.ones((num_objs, num_objs), jnp.int32)
                   - jnp.eye(num_objs, dtype=jnp.int32))
            imp = jnp.broadcast_to(imp[None], (batch_size, num_objs, num_objs))
            new_v = self.implicit_encoder(v, imp, graph_alpha,
                                          deterministic=deterministic)
            if graph_alpha:
                new_v, g_att = new_v
            output_v = output_v + new_v
        if self.use_spa:
            graph = batch["graph"].astype(jnp.int32)
            new_v = self.spatial_encoder(v, graph, graph_alpha,
                                         deterministic=deterministic)
            if graph_alpha:
                new_v, g_att = new_v
            output_v = output_v + new_v
        if self.use_sem:
            sem = batch["sem_graph"].astype(jnp.int32)
            new_v = self.semantic_encoder(v, sem, graph_alpha,
                                          deterministic=deterministic)
            if graph_alpha:
                new_v, g_att = new_v
            output_v = output_v + new_v
        if graph_alpha:
            return g_att
        out["v"] = output_v
        # the GCN branches replaced v; the base encoder's lazy pooled sum
        # and factored payload no longer correspond to it
        out.pop("v_sum", None)
        out.pop("v_q8", None)
        out.pop("v_w", None)
        return out


def set_encoder(encoder_type: str,
                ntoken: int,
                v_dim: int,
                embed_dim: int,
                hidden_dim: int,
                dropout: float = 0.5,
                rnn_type: str = "GRU",
                rnn_layer: int = 1,
                att_type: str = "base",
                att_dropout: float = 0.2,
                conv_type: str = "corr",
                conv_layer: int = 1,
                use_spa: bool = True,
                use_imp: bool = False,
                use_sem: bool = False,
                frozen_embedding: Optional[np.ndarray] = None,
                use_pallas: bool = False,
                use_int8: bool = False) -> nn.Module:
    """String-keyed encoder factory mirroring encoder.py:10-58.

    ``frozen_embedding`` plays the role of the reference's
    ``vocab_path``-triggered PretrainedWordEmbedding swap (encoder.py:56-57):
    pass a GloVe table from ``vqa_tpu.ops.embedding.load_glove_table``.
    """
    common = dict(ntoken=ntoken, embed_dim=embed_dim,
                  frozen_embedding=frozen_embedding)
    if encoder_type == "base":
        return BaseEncoder(hidden_dim=hidden_dim, dropout=dropout,
                           rnn_type=rnn_type, rnn_layer=rnn_layer,
                           att_type=att_type, att_dropout=att_dropout,
                           use_pallas=use_pallas, use_int8=use_int8,
                           **common)
    if encoder_type == "relation":
        return RelationEncoder(hidden_dim=hidden_dim, dropout=dropout,
                               rnn_type=rnn_type, rnn_layer=rnn_layer,
                               att_type=att_type, att_dropout=att_dropout,
                               conv_type=conv_type,
                               conv_layer=conv_layer, v_dim=v_dim,
                               use_spa=bool(use_spa), use_imp=bool(use_imp),
                               use_sem=bool(use_sem),
                               use_pallas=use_pallas, use_int8=use_int8,
                               **common)
    if encoder_type == "cap":
        return CaptionEncoder(**common)
    raise ValueError(f"unknown encoder_type: {encoder_type}")
