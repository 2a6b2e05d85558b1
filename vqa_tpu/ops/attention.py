"""Top-down attention fusion ops over the 36 visual objects.

TPU-native equivalents of `/root/reference/modules/attention.py`:

- ``ConcatAttention`` (attention.py:18-51): softmax over objects of
  ``WN-Linear(ReLU(WN-Linear([v ; q])))``.
- ``MultiplyAttention`` (attention.py:55-86): softmax over objects of
  ``WN-Linear(dropout(FCNet(v) * FCNet(q)))``. Note the reference declares the
  final projection as ``nn.Linear(q_dim, 1)`` applied to a hidden_dim tensor
  (attention.py:66,75) — it only works because q_dim == hidden_dim there; we
  declare it on the actual hidden dim (SURVEY.md section 2.1 defect 8).

Both return [batch, num_objs, 1] attention weights (softmax over axis 1).
On TPU the whole fusion is a handful of MXU matmuls + a tiny softmax; a fused
Pallas kernel for the MultiplyAttention + weighted-sum pipeline lives in
``vqa_tpu.ops.pallas.fused_attention`` (optional; this module is the reference
implementation and the default path — XLA already fuses the elementwise chain
into the matmuls).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from vqa_tpu.ops.linear import FCNet, WNDense


class ConcatAttention(nn.Module):
    """softmax_objs(WN([v;q]) -> ReLU -> WN -> 1)  (attention.py:18-51)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, v: jax.Array, q: jax.Array, *, deterministic: bool = True
                 ) -> jax.Array:
        """v: [batch, num_objs, v_dim], q: [batch, q_dim] -> [batch, num_objs, 1]."""
        num_objs = v.shape[1]
        q_tiled = jnp.broadcast_to(q[:, None, :], (q.shape[0], num_objs, q.shape[-1]))
        vq = jnp.concatenate([v, q_tiled], axis=2)
        logits = WNDense(self.hidden_dim, name="fc0")(vq)
        logits = nn.relu(logits)
        logits = WNDense(1, name="fc1")(logits)
        return jax.nn.softmax(logits, axis=1)


class MultiplyAttention(nn.Module):
    """softmax_objs(WN(dropout(FCNet(v) * FCNet(q))))  (attention.py:55-86)."""

    hidden_dim: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, v: jax.Array, q: jax.Array, *, deterministic: bool = True
                 ) -> jax.Array:
        """v: [batch, num_objs, v_dim], q: [batch, q_dim] -> [batch, num_objs, 1]."""
        vp = FCNet(self.hidden_dim, name="W_v")(v)           # [batch, k, hidden]
        qp = FCNet(self.hidden_dim, name="W_q")(q)           # [batch, hidden]
        joint = vp * qp[:, None, :]
        joint = nn.Dropout(self.dropout)(joint, deterministic=deterministic)
        logits = WNDense(1, name="linear")(joint)            # [batch, k, 1]
        return jax.nn.softmax(logits, axis=1)


def set_att(att_type: str):
    """String-keyed factory mirroring the reference CLI surface (attention.py:11-15)."""
    return {
        "base": ConcatAttention,
        "new": MultiplyAttention,
    }[att_type]
