"""Relation-aware graph convolutions (ReGAT) over the 36-object graph.

TPU-native equivalent of `/root/reference/modules/gcn.py`:

- ``BaseGraphConv`` (gcn.py:16-51): ``graph @ (feature @ W) + bias``.
- ``DirectedGraphConv`` (gcn.py:54-110): 3 direction weights
  ``W2(f) + adj @ W0(f) + adj @ W1(f)`` plus a per-label bias
  ``sum_j bias[graph[i,j]]``. The reference gathers that bias with a
  host round-trip per batch (``self.bias[graph.cpu().numpy(),:]``,
  gcn.py:107); here it is a device-side one-hot label-count matmul on the MXU
  — count labels per row, multiply by the [num_labels, out] bias table.
- ``CorrelatedGraphConv`` (gcn.py:113-168): directed conv re-weighted by a
  ReLU'd bilinear correlation ``alpha`` propagated through the adjacency and
  softmax-normalized over axis 1 (exactly the reference's
  ``nn.Softmax(dim=1)``, gcn.py:117,127).
- ``GCN`` (gcn.py:171-215): conv -> dropout -> ReLU stack. The reference keeps
  its conv layers in a plain Python list so their parameters are invisible to
  the optimizer/checkpoint (SURVEY.md section 2.1 defect 1); here they are
  registered flax submodules, i.e. we build the *intended* trainable model.

The active reference path does NOT add the residual ``feature +`` despite its
comment (gcn.py:104-107) — replicated as-is.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from vqa_tpu.ops.linear import DotProduct, torch_linear_uniform


def _uniform(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def grouped_self_similarity(a: jax.Array, b: jax.Array,
                            group: int = 8) -> jax.Array:
    """``einsum('bik,bjk->bij', a, b)`` in image groups — measured
    NEGATIVE result on TPU; NOT wired into the model.

    Idea: the direct batched einsum produces a tiny [N, N] output per
    image (N = 36 objects) and runs latency-bound at ~1.7 TF/s on the MXU
    (trace: 12.8 ms of a 73 ms ReGAT call at B=8192,
    scripts/trace_regat.py); packing ``group`` images into one
    [G*N, D] @ [D, G*N] product trades a G-fold FLOP surplus for dense
    GEMM rates — the gcn_chain.py trick in pure XLA. Measured same-window
    at B=8192 bf16: **91.4 ms grouped vs 75.2 ms plain** end to end — the
    grouped product forces a materialized relayout of the j-side operand
    (contracting lanes), which the per-image einsum amortizes into its
    tiny matmuls. Exact and tested; kept as a library op only.
    """
    B, N, D = a.shape
    g = next(x for x in (group, 4, 2, 1) if B % x == 0)
    if g == 1:
        return jnp.einsum("bik,bjk->bij", a, b,
                          preferred_element_type=a.dtype)
    big = jnp.einsum("bik,bjk->bij", a.reshape(B // g, g * N, D),
                     b.reshape(B // g, g * N, D),
                     preferred_element_type=a.dtype)   # [B/g, gN, gN]
    # keep the g block-diagonal [N, N] blocks, drop the image-cross rest
    # (static slices — jnp.diagonal lowers to a gather, measured slower)
    blocks = [big[:, i * N:(i + 1) * N, i * N:(i + 1) * N] for i in range(g)]
    return jnp.stack(blocks, axis=1).reshape(B, N, N)


def label_bias_sum(graph: jax.Array, bias: jax.Array, num_labels: int) -> jax.Array:
    """Device-side ``sum_j bias[graph[b, i, j]]`` -> [B, N, out].

    graph: int labels [B, N, N]; bias: [num_labels, out]. Implemented as
    one-hot label counts [B, N, num_labels] @ bias — a single MXU matmul,
    replacing the reference's per-batch GPU->CPU sync (gcn.py:107).
    """
    counts = jnp.sum(jax.nn.one_hot(graph, num_labels, dtype=bias.dtype), axis=2)
    return jnp.matmul(counts, bias, preferred_element_type=bias.dtype)


class BaseGraphConv(nn.Module):
    """Kipf-style conv: ``graph @ (feature @ W) + b``  (gcn.py:16-51)."""

    out_dim: int
    num_labels: int = 12
    use_bias: bool = True

    @nn.compact
    def __call__(self, feature: jax.Array, graph: jax.Array,
                 *, deterministic: bool = True) -> jax.Array:
        """feature: [B, N, in]; graph: float adjacency [B, N, N] -> [B, N, out]."""
        stdv = 1.0 / (self.out_dim ** 0.5)
        w = self.param("weight", _uniform(stdv), (feature.shape[-1], self.out_dim))
        out = jnp.matmul(feature, w.astype(feature.dtype),
                         preferred_element_type=feature.dtype)
        out = jnp.matmul(graph.astype(out.dtype), out,
                         preferred_element_type=out.dtype)
        if self.use_bias:
            b = self.param("bias", _uniform(stdv), (self.out_dim,))
            out = out + b.astype(out.dtype)
        return out


class DirectedGraphConv(nn.Module):
    """Direction-typed conv with per-label bias (gcn.py:54-110).

    out = W[dir-1](f) + sum_{i<dir-1} adj @ W[i](f) + sum_j bias[graph[:, :, j]]
    """

    out_dim: int
    num_labels: int = 12
    dir_num: int = 3
    use_pallas: bool = False
    # int8 MXU projections at inference: the layer input is dynamically
    # row-quantized ONCE and contracted by all big GEMMs (w_self, folded
    # directions, correlation) — the quantize pass amortizes (ops/quant.py).
    use_int8: bool = False

    @nn.compact
    def conv(self, feature: jax.Array, graph: jax.Array,
             return_parts: bool = False, fq=None):
        in_dim = feature.shape[-1]

        def project(x, w):
            if fq is not None:
                from vqa_tpu.ops.quant import int8_dot
                # XLA int8 route on purpose: the fused Pallas int8 GEMM
                # loses in-situ at the flagship shape (PERF.md round-3
                # shootout), so it is not routed into models by default
                return int8_dot(fq[0], fq[1], w, out_dtype=x.dtype)
            return jnp.matmul(x, w.astype(x.dtype),
                              preferred_element_type=x.dtype)

        # torch nn.Linear(bias=False) default init (reset_parameters only
        # touches the label bias, gcn.py:69-76).
        w_self = self.param(f"w{self.dir_num - 1}", torch_linear_uniform(in_dim),
                            (in_dim, self.out_dim))
        out = project(feature, w_self)
        # All direction projections propagate through the SAME adjacency
        # (reference gcn.py:93-107), so sum_i adj@(f@Wi) == adj@(f@sum(Wi)):
        # folding the direction weights turns dir_num-1 big GEMMs into one
        # [in, out] add + one GEMM. Exact, and autodiff through the fold
        # yields the same per-weight gradients as the unfolded form.
        ws = [self.param(f"w{i}", torch_linear_uniform(in_dim),
                         (in_dim, self.out_dim))
              for i in range(self.dir_num - 1)]
        bias = self.param("label_bias", _uniform(1.0 / (self.out_dim ** 0.5)),
                          (self.num_labels, self.out_dim))
        proj = None
        if ws:
            w_fold = sum(ws[1:], start=ws[0])
            proj = project(feature, w_fold)
        if return_parts:
            # pieces for the fused Pallas chain (ops/pallas/gcn_chain.py):
            # the big MXU GEMMs stay here in XLA, the graph-local chain fuses
            return out, proj, bias
        adj = (graph != 0).astype(feature.dtype)
        if proj is not None:
            out = out + jnp.matmul(adj, proj, preferred_element_type=out.dtype)
        return out + label_bias_sum(graph.astype(jnp.int32), bias.astype(out.dtype),
                                    self.num_labels)

    def __call__(self, feature: jax.Array, graph: jax.Array,
                 *, deterministic: bool = True) -> jax.Array:
        fq = None
        if self.use_int8 and deterministic:
            from vqa_tpu.ops.quant import quantize_rows
            fq = quantize_rows(feature)
        return self.conv(feature, graph, fq=fq)


class CorrelatedGraphConv(DirectedGraphConv):
    """Directed conv re-weighted by bilinear correlation alpha (gcn.py:113-168)."""

    def _pallas_eligible(self, feature: jax.Array,
                         deterministic: bool) -> bool:
        # inference only (the kernel defines no VJP — training always
        # differentiates through the XLA chain) and needs the folded
        # direction projection (dir_num >= 2, always true in the model).
        return self.use_pallas and deterministic and self.dir_num >= 2

    @nn.compact
    def attend(self, feature: jax.Array, graph: jax.Array, *,
               deterministic: bool = True,
               need_alpha: bool = False) -> Tuple[jax.Array, jax.Array]:
        # One dynamic row-quantization of the layer input serves every big
        # GEMM below (inference-only; training differentiates the f32 path).
        fq = None
        if self.use_int8 and deterministic:
            from vqa_tpu.ops.quant import quantize_rows
            fq = quantize_rows(feature)
        if self._pallas_eligible(feature, deterministic) and not need_alpha:
            from vqa_tpu.ops.pallas.gcn_chain import gcn_chain_fused
            out_self, proj, bias = self.conv(feature, graph,
                                             return_parts=True, fq=fq)
            # one [*, D]@[D, D] GEMM instead of two out_dim projections:
            # alpha = relu((f C) f^T + u_i + w_j); the tiny [36, 36]
            # contraction stays in XLA (batched einsum — an in-kernel
            # version forces transpose relayouts and measures ~3x slower)
            fc, u, w = DotProduct(self.out_dim, name="dot_product"
                                  ).similarity_parts(feature, aq=fq)
            alpha_raw = jnp.maximum(
                jnp.einsum("bik,bjk->bij", fc, feature,
                           preferred_element_type=feature.dtype)
                + u[:, :, None] + w[:, None, :], 0.0)         # gcn.py:124
            out = gcn_chain_fused(out_self, proj, alpha_raw,
                                  graph.astype(jnp.int32),
                                  bias.astype(out_self.dtype),
                                  num_labels=self.num_labels,
                                  # f32 at D=2048 exceeds VMEM with 8-image
                                  # blocks (measured OOM); bf16 fits
                                  block_b=next(b for b in (
                                      (8, 4, 2, 1)
                                      if feature.dtype.itemsize <= 2
                                      else (4, 2, 1))
                                      if feature.shape[0] % b == 0),
                                  interpret=jax.default_backend() != "tpu")
            # the fused kernel does not materialize alpha; get_alpha
            # visualization uses the XLA path (GCN.__call__ routes there)
            return out, None
        adj = (graph != 0).astype(feature.dtype)
        out = self.conv(feature, graph, fq=fq)
        if deterministic:
            # similarity_parts form: one [*, D]@[D, D] GEMM instead of the
            # two out_dim projections of DotProduct.__call__ (exact algebra;
            # training keeps the reference-shaped path so the f64 trajectory
            # parity vs torch is bit-compatible).
            fc, u, w = DotProduct(self.out_dim, name="dot_product"
                                  ).similarity_parts(feature, aq=fq)
            alpha = (jnp.einsum("bik,bjk->bij", fc, feature,
                                preferred_element_type=feature.dtype)
                     + u[:, :, None] + w[:, None, :])
        else:
            alpha = DotProduct(self.out_dim, name="dot_product")(feature,
                                                                 feature)
        alpha = jnp.maximum(alpha, 0.0)                       # gcn.py:124
        alpha = jnp.matmul(adj, alpha, preferred_element_type=alpha.dtype)
        alpha = jax.nn.softmax(alpha, axis=1)                 # dim=1, gcn.py:117
        out = jnp.matmul(alpha, out, preferred_element_type=out.dtype)
        return out, alpha

    def __call__(self, feature: jax.Array, graph: jax.Array,
                 *, deterministic: bool = True) -> jax.Array:
        out, _ = self.attend(feature, graph, deterministic=deterministic)
        return out


def get_graph_conv(conv_type: str):
    """String-keyed factory mirroring gcn.py:9-14."""
    return {
        "base": BaseGraphConv,
        "direct": DirectedGraphConv,
        "corr": CorrelatedGraphConv,
    }[conv_type]


class GCN(nn.Module):
    """conv -> dropout -> ReLU stack (gcn.py:171-215), properly registered."""

    out_dim: int
    num_labels: int = 12
    conv_layer: int = 1
    conv_type: str = "corr"
    dropout: float = 0.5
    use_pallas: bool = False   # fused chain kernel at inference (corr only)
    use_int8: bool = False     # int8 MXU projections at inference

    @nn.compact
    def __call__(self, feature: jax.Array, graph: jax.Array,
                 get_alpha: bool = False, *, deterministic: bool = True):
        conv_cls = get_graph_conv(self.conv_type)
        extra = ({"use_pallas": self.use_pallas, "use_int8": self.use_int8}
                 if self.conv_type != "base" else {})
        alphas = []
        for i in range(self.conv_layer):
            conv = conv_cls(self.out_dim, self.num_labels, name=f"conv{i}",
                            **extra)
            if get_alpha and self.conv_type == "corr":
                feature, alpha = conv.attend(feature, graph,
                                             deterministic=deterministic,
                                             need_alpha=True)
                alphas.append(alpha)
            else:
                feature = conv(feature, graph, deterministic=deterministic)
            feature = nn.Dropout(self.dropout)(feature, deterministic=deterministic)
            feature = nn.relu(feature)
        if get_alpha:
            return feature, alphas
        return feature
