"""VQA answer-prediction heads.

TPU-native equivalents of `/root/reference/modules/predictor.py`:

- ``BasePredictor`` (predictor.py:54-93): ``v.sum(1) -> FCNet``, joint
  ``q * v``, 2-layer weight-normed classifier. NOTE: the reference classifier
  is an FCNet and FCNet appends a trailing ReLU (modules.py:55), so the
  "logits" fed to BCE-with-logits are non-negative. Replicated faithfully —
  the published 55.8 All-accuracy was trained this way.
- ``BaseCaptionPredictor`` (predictor.py:96-140): + GRU caption embedding,
  joint ``q * (c + v)``.
- ``PredictorwithCaption`` (predictor.py:144-213, "q-cap"): LReLU nets +
  gated CaptionEmbedding, caption-attended visual fusion (softmax over the
  *hidden* axis, predictor.py:202 — replicated), Sigmoid classifier.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from vqa_tpu.ops.linear import FCNet, LReLUNet
from vqa_tpu.ops.rnn import SentenceEmbedding
from vqa_tpu.ops.caption import CaptionEmbedding


class BasePredictor(nn.Module):
    """Up-Down VQA head (predictor.py:54-93)."""

    hidden_dim: int
    ans_dim: int
    cls_layer: int = 2
    dropout: float = 0.5

    def setup(self):
        self.v_net = FCNet(self.hidden_dim, name="v_net")
        self.classifier = FCNet(self.ans_dim, mid_dim=2 * self.hidden_dim,
                                layer=self.cls_layer, dropout=self.dropout,
                                name="classifier")

    def __call__(self, batch: Dict[str, Any], *, deterministic: bool = True
                 ) -> jax.Array:
        # 'v_sum' = the encoder's lazily pooled attended features (int8 feed
        # fast path, encoder.py base_forward) — same value as summing the
        # materialized v up to fp reorder
        v = (batch["v_sum"] if "v_sum" in batch
             else jnp.sum(batch["v"], axis=1))               # [B, v_dim]
        v = self.v_net(v, deterministic=deterministic)       # [B, hidden]
        joint = batch["q"] * v
        return self.classifier(joint, deterministic=deterministic)


class BaseCaptionPredictor(BasePredictor):
    """VQA head consuming an additional caption embedding (predictor.py:96-140)."""

    def setup(self):
        super().setup()
        self.c_rnn = SentenceEmbedding(self.hidden_dim, rnn_type="GRU",
                                       name="c_rnn")
        self.c_net = FCNet(self.hidden_dim, dropout=self.dropout, name="c_net")

    def __call__(self, batch: Dict[str, Any], *, deterministic: bool = True
                 ) -> jax.Array:
        v = (batch["v_sum"] if "v_sum" in batch
             else jnp.sum(batch["v"], axis=1))
        c = self.c_net(self.c_rnn(batch["c"], deterministic=deterministic),
                       deterministic=deterministic)
        v = self.v_net(v, deterministic=deterministic)
        joint = batch["q"] * (c + v)
        return self.classifier(joint, deterministic=deterministic)


class PredictorwithCaption(nn.Module):
    """Q-Relevant caption-aware VQA head (predictor.py:144-213).

    The caption-embedding sub-module implements the *intended* gated
    word-RNN/caption-RNN algorithm (the reference's active path is broken;
    see vqa_tpu/ops/caption.py and SURVEY.md section 2.1 defect 2).
    Output passes through Sigmoid (predictor.py:181-184) — the classifier
    emits probabilities, not logits; the loss path replicates the reference's
    BCE-with-logits-on-sigmoid double-squash.
    """

    hidden_dim: int
    ans_dim: int
    cls_layer: int = 2
    dropout: float = 0.5
    neg_slope: float = 0.01

    def setup(self):
        self.v_net = LReLUNet(self.hidden_dim, self.neg_slope, name="v_net")
        self.caption_embedding = CaptionEmbedding(self.hidden_dim,
                                                  dropout=self.dropout,
                                                  neg_slope=self.neg_slope,
                                                  name="caption_embedding")
        self.c_net = LReLUNet(self.hidden_dim, self.neg_slope, name="c_net")
        self.vq_net = LReLUNet(self.hidden_dim, self.neg_slope, name="vq_net")
        self.joint_net = LReLUNet(self.hidden_dim, self.neg_slope, name="joint_net")
        self.vqc_net = LReLUNet(self.hidden_dim, self.neg_slope, name="vqc_net")
        self.cls_net = LReLUNet(self.ans_dim, self.neg_slope, name="cls_net")

    def __call__(self, batch: Dict[str, Any], *, deterministic: bool = True
                 ) -> jax.Array:
        v_proj = self.v_net(batch["v"])                      # [B, objs, hidden]
        v = jnp.sum(v_proj, axis=1)                          # [B, hidden]
        c = self.caption_embedding(v, batch["q"], batch["c"],
                                   batch.get("cap_len"),
                                   deterministic=deterministic)
        vq = self.vq_net(v)
        c = self.c_net(c)
        joint = self.joint_net(c * vq)
        joint = jax.nn.softmax(joint, axis=1)                # over hidden axis
        v = jnp.sum(joint[:, None, :] * v_proj, axis=1)      # [B, hidden]
        v = self.vqc_net(v)
        joint = batch["q"] * (v + c)
        return jax.nn.sigmoid(self.cls_net(joint))


def set_predictor(predictor_type: str,
                  hidden_dim: int,
                  ans_dim: int,
                  cls_layer: int = 2,
                  dropout: float = 0.5,
                  neg_slope: float = 0.01):
    """String-keyed predictor factory mirroring predictor.py:9-52."""
    if predictor_type == "none":
        return None
    if predictor_type == "base":
        return BasePredictor(hidden_dim, ans_dim, cls_layer, dropout)
    if predictor_type == "base-cap":
        return BaseCaptionPredictor(hidden_dim, ans_dim, cls_layer, dropout)
    if predictor_type == "q-cap":
        return PredictorwithCaption(hidden_dim, ans_dim, cls_layer, dropout,
                                    neg_slope)
    raise ValueError(f"unknown predictor_type: {predictor_type}")
