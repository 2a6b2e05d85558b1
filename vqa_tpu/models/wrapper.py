"""Model composition: encoder + optional predictor + optional generator.

TPU-native equivalent of `/root/reference/modules/wrapper.py`. The stateful
``Wrapper(nn.Module)`` becomes a flax ``VQAModel`` whose ``get_loss`` is a
pure function of (params, batch, rng) — the single jitted train step
differentiates through it. Multi-task variants share one compiled graph:
task branches are resolved at *build* time (module presence) and sequence
validity is masked at *run* time, per SURVEY.md section 7.1.

Losses / metric (wrapper.py:8-36):
- ``instance_bce_with_logits`` — mean BCE-with-logits scaled by ans_dim.
- ``ce_for_language_model`` — token cross-entropy over non-pad positions;
  the reference packs valid positions (generator.py:117-120) — here the same
  mean is computed with a mask (identical value, static shapes).
- ``compute_score`` — VQA soft-score: one_hot(argmax) dot target.
- MTL uncertainty weighting (wrapper.py:47-52, 89-102): learnable
  ``log_vars``; loss = sum_i exp(-s_i) * L_i + s_i  (Kendall et al. 2018).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from vqa_tpu.models.encoder import set_encoder
from vqa_tpu.models.predictor import set_predictor
from vqa_tpu.models.generator import set_decoder


def compute_score(predict: jax.Array, target: jax.Array,
                  get_label: bool = False):
    """VQA evaluation metric (wrapper.py:8-22).

    predict: [B, ans_dim] scores; target: [B, ans_dim] soft answer scores.
    Returns scores [B, ans_dim] (= one_hot(argmax) * target) and optionally
    the argmax labels.
    """
    logits = jnp.argmax(predict, axis=1)
    one_hots = jax.nn.one_hot(logits, predict.shape[1], dtype=target.dtype)
    scores = one_hots * target
    if get_label:
        return scores, logits
    return scores


def _at_least_f32(x: jax.Array) -> jax.Array:
    """Upcast bf16/f16 to f32 but keep f64 (the x64 parity tests) intact."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def instance_bce_with_logits(predict: jax.Array, target: jax.Array) -> jax.Array:
    """Mean BCE-with-logits x num_answers (wrapper.py:25-29)."""
    # Loss math in >=f32: under bf16 mixed-precision training the
    # logits arrive as bf16 and log1p/exp would lose the low-order bits
    # that the optimizer needs (see PERF.md "bf16 training").
    predict = _at_least_f32(predict)
    target = _at_least_f32(target)
    # log(1 + exp(-|x|)) + max(x, 0) - x * z  — numerically stable BCE.
    loss = jnp.maximum(predict, 0) - predict * target + jnp.log1p(
        jnp.exp(-jnp.abs(predict)))
    return jnp.mean(loss) * predict.shape[1]


def ce_for_language_model(predict: jax.Array, target: jax.Array,
                          mask: jax.Array) -> jax.Array:
    """Masked token cross-entropy == packed-CE mean (wrapper.py:32-36).

    predict: [B, T, ntoken]; target: [B, T] int; mask: [B, T] {0,1}.
    """
    # nll = lse - logits[target]: same value as log_softmax + gather but the
    # [.., ntoken] log-prob array never materializes (reductions + a gather)
    predict = _at_least_f32(predict)
    lse = jax.scipy.special.logsumexp(predict, axis=-1)
    tgt = jnp.take_along_axis(predict, target[..., None], axis=-1)[..., 0]
    return jnp.sum((lse - tgt) * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class VQAModel(nn.Module):
    """Encoder + optional predictor + optional generator (wrapper.py:39-123)."""

    encoder: nn.Module
    predictor: Optional[nn.Module] = None
    generator: Optional[nn.Module] = None
    use_mtl: bool = False
    # get_loss computes the caption CE inside the decoder's time scan
    # (remat'd, logits never stacked — generator.caption_loss). Same value
    # as the stacked path at fp tolerance; False restores the stacked
    # logits + ce_for_language_model layout.
    fused_cap_loss: bool = True

    @property
    def mtl_active(self) -> bool:
        # Single-task configurations ignore use_mtl (wrapper.py:50).
        return self.use_mtl and self.predictor is not None \
            and self.generator is not None

    def setup(self):
        if self.mtl_active:
            self.log_vars = self.param("log_vars", nn.initializers.zeros, (2,))

    def __call__(self, batch: Dict[str, Any], *, deterministic: bool = True
                 ) -> Tuple[Optional[jax.Array], Optional[Dict[str, jax.Array]]]:
        embed = self.encoder(batch, deterministic=deterministic)
        caption = (self.generator(embed, deterministic=deterministic)
                   if self.generator is not None else None)
        predict = (self.predictor(embed, deterministic=deterministic)
                   if self.predictor is not None else None)
        return predict, caption

    def get_loss(self, batch: Dict[str, Any], *, deterministic: bool = False
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Joint loss + scalar metrics dict (wrapper.py:76-105)."""
        embed = self.encoder(batch, deterministic=deterministic)
        if self.generator is not None and self.fused_cap_loss:
            # training hot path: CE fused into the remat'd decoder scan
            loss_cap = self.generator.caption_loss(
                embed, deterministic=deterministic)["loss"]
        elif self.generator is not None:
            caption = self.generator(embed, deterministic=deterministic)
            loss_cap = ce_for_language_model(caption["predict"],
                                             caption["target"],
                                             caption["mask"])
        else:
            loss_cap = None
        predict = (self.predictor(embed, deterministic=deterministic)
                   if self.predictor is not None else None)
        loss = jnp.float32(0.0)
        writes: Dict[str, jax.Array] = {}
        log_vars = self.log_vars if self.mtl_active else None

        if predict is not None:
            target = _at_least_f32(batch["a"])
            loss_vqa = instance_bce_with_logits(predict, target)
            writes["train/loss"] = loss_vqa
            writes["train/score"] = jnp.sum(compute_score(predict, target))
            if log_vars is not None:
                loss = loss + jnp.exp(-log_vars[0]) * loss_vqa + log_vars[0]
            else:
                loss = loss + loss_vqa

        if loss_cap is not None:
            writes["train/cap/loss"] = loss_cap
            if log_vars is not None:
                loss = loss + jnp.exp(-log_vars[1]) * loss_cap + log_vars[1]
            else:
                loss = loss + loss_cap

        return loss, writes

    def forward_vqa(self, batch: Dict[str, Any]
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Eval path: (scores [B, ans], labels [B], target [B, ans])
        (wrapper.py:113-118)."""
        target = _at_least_f32(batch["a"])
        embed = self.encoder(batch, deterministic=True)
        predict = self.predictor(embed, deterministic=True)
        score, label = compute_score(predict, target, get_label=True)
        return score, label, target

    def forward_cap(self, batch: Dict[str, Any], *, deterministic: bool = True):
        """Caption-only forward (wrapper.py:120-123)."""
        embed = self.encoder(batch, deterministic=deterministic)
        return (self.generator(embed, deterministic=deterministic)
                if self.generator is not None else None)

    def get_att(self, batch: Dict[str, Any]):
        """(predict, v_att) for visualization (wrapper.py:107-110)."""
        embed = self.encoder(batch, deterministic=True)
        predict = self.predictor(embed, deterministic=True)
        return predict, embed["v_att"]


def set_model(encoder_type: str = "base",
              predictor_type: str = "base",
              decoder_type: str = "base",
              ntoken: int = 0,
              v_dim: int = 0,
              embed_dim: int = 0,
              hidden_dim: int = 0,
              decoder_hidden_dim: int = 0,
              rnn_layer: int = 1,
              ans_dim: int = 0,
              cls_layer: int = 2,
              c_len: int = 20,
              dropout: float = 0.5,
              neg_slope: float = 0.01,
              rnn_type: str = "GRU",
              att_type: str = "base",
              att_dropout: float = 0.2,
              conv_layer: int = 2,
              conv_type: str = "corr",
              use_spa: bool = True,
              use_imp: bool = False,
              use_sem: bool = False,
              use_mtl: bool = False,
              frozen_embedding: Optional[np.ndarray] = None,
              use_pallas: bool = False,
              use_int8: bool = False) -> VQAModel:
    """Single model-construction factory mirroring wrapper.py:125-191.

    The reference's ``decoder_device`` two-device placement (wrapper.py:148-150)
    is superseded by mesh sharding — on TPU the whole model lives on one
    jit-compiled graph sharded over the mesh (SURVEY.md section 5.8).
    """
    encoder = set_encoder(
        encoder_type=encoder_type, ntoken=ntoken, v_dim=v_dim,
        embed_dim=embed_dim, hidden_dim=hidden_dim, dropout=dropout,
        rnn_type=rnn_type, rnn_layer=rnn_layer, att_type=att_type,
        att_dropout=att_dropout, conv_type=conv_type, conv_layer=conv_layer,
        use_spa=use_spa, use_imp=use_imp, use_sem=use_sem,
        frozen_embedding=frozen_embedding, use_pallas=use_pallas,
        use_int8=use_int8,
    )
    predictor = set_predictor(
        predictor_type=predictor_type, hidden_dim=hidden_dim, ans_dim=ans_dim,
        cls_layer=cls_layer, dropout=dropout, neg_slope=neg_slope,
    )
    generator = set_decoder(
        decoder_type=decoder_type, ntoken=ntoken,
        hidden_dim=decoder_hidden_dim, max_len=c_len, dropout=dropout,
        rnn_type=rnn_type, att_type=att_type, att_dropout=att_dropout,
        pallas_att=use_pallas,
    )
    return VQAModel(encoder=encoder, predictor=predictor, generator=generator,
                    use_mtl=use_mtl)
