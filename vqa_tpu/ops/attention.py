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
    """softmax_objs(WN([v;q]) -> ReLU -> WN -> 1)  (attention.py:18-51).

    The concat projection splits exactly: ``[v;q] @ W == v @ W_v + q @ W_q``
    (a Linear is linear before the ReLU), so callers that attend over the
    *same* boxes every decode step hoist the v half once via ``project_v``
    and pass it back as ``v_cache`` — the per-step cost drops from a
    [B*objs, v_dim+q_dim] GEMM to a [B, q_dim] GEMM. This is the decisive
    beam-decode optimization (the reference recomputes the full projection
    all 19 steps, generator.py:177-190).
    """

    hidden_dim: int

    def setup(self):
        self.fc0 = WNDense(self.hidden_dim)
        self.fc1 = WNDense(1)

    def project_v(self, v: jax.Array, q_dim: int) -> jax.Array:
        """Loop-invariant v-side projection [batch, num_objs, hidden]
        (no bias — the bias joins on the per-step q side)."""
        return self.fc0(v, in_dim=v.shape[-1] + q_dim, row_start=0,
                        add_bias=False)

    def project_v_int8(self, img_q: jax.Array, img_scale: jax.Array,
                       q_dim: int, use_pallas: bool = False) -> jax.Array:
        """``project_v`` consuming the quantized feed directly: the v-side
        rows of the concat kernel run as one int8 MXU GEMM (ops/quant.py)."""
        return self.fc0(img_q, in_dim=img_q.shape[-1] + q_dim, row_start=0,
                        add_bias=False, x_scale=img_scale,
                        int8_pallas=use_pallas)

    def __call__(self, v: jax.Array, q: jax.Array, *,
                 deterministic: bool = True,
                 v_cache: jax.Array | None = None) -> jax.Array:
        """v: [batch, num_objs, v_dim], q: [batch, q_dim] -> [batch, num_objs, 1].

        Beam mode: q may be [batch, k, q_dim] against a *shared* v — one
        v-side read serves all k beams of an image (beam search repeats v
        per beam otherwise; at B=4096 k=3 bf16 that is ~0.6 GB of HBM
        traffic per decode step saved). Returns [batch, k, num_objs, 1].
        """
        full = v.shape[-1] + q.shape[-1]
        if v_cache is None:
            v_cache = self.project_v(v, q.shape[-1])
        qp = self.fc0(q, in_dim=full, row_start=v.shape[-1])  # + bias
        if q.ndim == 3:
            logits = self.fc1(nn.relu(v_cache[:, None] + qp[:, :, None, :]))
            return jax.nn.softmax(logits, axis=2)
        logits = self.fc1(nn.relu(v_cache + qp[:, None, :]))
        return jax.nn.softmax(logits, axis=1)


class MultiplyAttention(nn.Module):
    """softmax_objs(WN(dropout(FCNet(v) * FCNet(q))))  (attention.py:55-86).

    ``W_v(v)`` is loop-invariant across decode steps — hoist with
    ``project_v`` / ``v_cache`` exactly like ConcatAttention.
    """

    hidden_dim: int
    dropout: float = 0.2

    def setup(self):
        self.W_v = FCNet(self.hidden_dim)
        self.W_q = FCNet(self.hidden_dim)
        self.linear = WNDense(1)
        self.drop = nn.Dropout(self.dropout)

    def project_v(self, v: jax.Array, q_dim: int = 0) -> jax.Array:
        del q_dim
        return self.W_v(v)                                   # [batch, k, hidden]

    def project_v_int8(self, img_q: jax.Array, img_scale: jax.Array,
                       q_dim: int = 0, use_pallas: bool = False) -> jax.Array:
        """``project_v`` consuming the quantized feed directly — the
        dominant forward GEMM (~2.5 of ~3.9 TFLOP/batch) runs int8 on the
        MXU at ~1.8x the bf16 rate (ops/quant.py, PERF.md "int8 MXU").
        ``use_pallas`` fuses the dequant epilogue in VMEM
        (ops/pallas/int8_matmul.py)."""
        del q_dim
        return self.W_v(img_q, x_scale=img_scale, int8_pallas=use_pallas)

    def __call__(self, v: jax.Array, q: jax.Array, *,
                 deterministic: bool = True,
                 v_cache: jax.Array | None = None) -> jax.Array:
        """v: [batch, num_objs, v_dim], q: [batch, q_dim] -> [batch, num_objs, 1].

        Beam mode: q [batch, k, q_dim] against shared v (see
        ConcatAttention) -> [batch, k, num_objs, 1].

        At inference dropout is identity, so ``(vp * qp) @ w`` folds exactly
        into ``vp @ (qp * w)`` — a [hidden]-contraction per (batch, obj)
        instead of materializing the [batch(, k), objs, hidden] joint
        tensor (a ~2.4 GB HBM round-trip at B=16k, more in beam mode). The
        training path keeps the joint (dropout needs it).
        """
        vp = v_cache if v_cache is not None else self.project_v(v)
        qp = self.W_q(q)                                     # [batch(, k), hidden]
        if deterministic:
            wq = self.linear.fold_vector(qp)                 # [batch(, k), hidden]
            # output dtype follows numpy promotion of (vp, qp) — exactly the
            # dtype the joint form produces (vp * qp promotes, the linear
            # kernel is cast to the joint's dtype); forcing vp.dtype here
            # broke mixed f32-params/bf16-features graphs (decoder scan
            # carries changed dtype mid-graph)
            out_dt = jnp.promote_types(vp.dtype, wq.dtype)
            if q.ndim == 3:
                logits = jnp.einsum("bnd,bkd->bkn", vp, wq,
                                    preferred_element_type=out_dt)[..., None]
                return jax.nn.softmax(logits, axis=2)
            logits = jnp.einsum("bnd,bd->bn", vp, wq,
                                preferred_element_type=out_dt)[..., None]
            return jax.nn.softmax(logits, axis=1)
        if q.ndim == 3:
            joint = vp[:, None] * qp[:, :, None, :]
            joint = self.drop(joint, deterministic=deterministic)
            return jax.nn.softmax(self.linear(joint), axis=2)
        joint = vp * qp[:, None, :]
        joint = self.drop(joint, deterministic=deterministic)
        logits = self.linear(joint)                          # [batch, objs, 1]
        return jax.nn.softmax(logits, axis=1)


def set_att(att_type: str):
    """String-keyed factory mirroring the reference CLI surface (attention.py:11-15)."""
    return {
        "base": ConcatAttention,
        "new": MultiplyAttention,
    }[att_type]
