"""Caption attention / embedding for question-relevant captioning (q-cap).

TPU-native equivalent of `/root/reference/modules/modules.py:202-306`
("Generating Question Relevant Captions to Aid Visual Question Answering").

The reference's active path ``CaptionEmbedding.forward_all`` is broken — it
references undefined ``word_hidden`` / ``cap_hidden`` (modules.py:292-295) and
would crash (SURVEY.md section 2.1 defect 2). We implement the *intended*
algorithm, reconstructed from the module docstrings and the commented
per-time-step implementation (modules.py:308-356):

1. word RNN over the caption token embeddings      -> h_word [B, T, H]
2. gate = sigmoid(drop(h_word * f(v)) + drop(h_word * f(q)))   [B, T, H]
3. caption RNN over gate * h_word                  -> h_cap  [B, T, H]
4. LReLU FC layer                                  -> out    [B, T, H]
5. element-wise max-pool over valid time steps     -> [B, H]

Padded steps contribute 0 to the max (the commented reference pre-fills the
output buffer with zeros and only writes valid steps, modules.py:319,352-355)
— replicated exactly, including the consequence that all-negative activations
max-pool to 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from vqa_tpu.ops.linear import LReLUNet
from vqa_tpu.ops.rnn import SentenceEmbedding


class CaptionAttention(nn.Module):
    """gate = sigmoid(drop(h * f(v)) + drop(h * f(q)))  (modules.py:202-243)."""

    hidden_dim: int
    neg_slope: float = 0.01
    dropout: float = 0.2

    @nn.compact
    def __call__(self, h: jax.Array, v: jax.Array, q: jax.Array,
                 *, deterministic: bool = True) -> jax.Array:
        """h: [B, T, H]; v: [B, v_dim]; q: [B, q_dim] -> [B, T, H] in (0,1)."""
        fv = LReLUNet(self.hidden_dim, self.neg_slope, name="W_v")(v)
        fq = LReLUNet(self.hidden_dim, self.neg_slope, name="W_q")(q)
        drop = nn.Dropout(self.dropout)
        jv = drop(h * fv[:, None, :], deterministic=deterministic)
        jq = drop(h * fq[:, None, :], deterministic=deterministic)
        return jax.nn.sigmoid(jv + jq)


class CaptionEmbedding(nn.Module):
    """Question/visual-gated caption embedding with max-pool (modules.py:246-306)."""

    hidden_dim: int
    dropout: float = 0.2
    neg_slope: float = 0.01
    rnn_type: str = "GRU"

    @nn.compact
    def __call__(self, v: jax.Array, q: jax.Array, c: jax.Array,
                 cap_len: jax.Array | None = None,
                 *, deterministic: bool = True) -> jax.Array:
        """v: [B, v_dim]; q: [B, q_dim]; c: [B, T, c_dim] token embeddings;
        cap_len: optional [B] valid lengths. -> [B, hidden_dim]."""
        assert self.rnn_type in ("LSTM", "GRU")
        word_rnn = SentenceEmbedding(self.hidden_dim, rnn_type=self.rnn_type,
                                     name="word_rnn")
        cap_rnn = SentenceEmbedding(self.hidden_dim, rnn_type=self.rnn_type,
                                    name="caption_rnn")
        h_word = word_rnn.forward_all(c, deterministic=deterministic)  # [B,T,H]
        gate = CaptionAttention(self.hidden_dim, self.neg_slope, self.dropout,
                                name="attention")(h_word, v, q,
                                                  deterministic=deterministic)
        h_cap = cap_rnn.forward_all(gate * h_word, deterministic=deterministic)
        out = LReLUNet(self.hidden_dim, self.neg_slope, name="fcnet")(h_cap)
        if cap_len is not None:
            t_len = c.shape[1]
            step = jnp.arange(t_len)[None, :, None]  # [1, T, 1]
            valid = step < cap_len[:, None, None]
            out = jnp.where(valid, out, 0.0)
        return jnp.max(out, axis=1)
