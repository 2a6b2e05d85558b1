"""Fused GCN relation-chain kernel (ReGAT corr-conv, VERDICT r1 item 3).

One CorrelatedGraphConv layer (reference `/root/reference/modules/gcn.py:
93-168`) splits into two regimes:

- the four big ``[B*N, D] @ [D, D]`` projections (W_self, the folded
  direction weights, and the DotProduct q/k projections) — dense MXU work
  that XLA already schedules at speed-of-light, so they stay in XLA;
- the *graph-local chain* that follows: adjacency aggregation
  ``adj @ proj``, the per-label bias gather-sum, the correlation
  re-weighting ``softmax_axis1(adj @ relu(q k^T)) @ out`` — a string of
  small batched matmuls ([N, N] x [N, D] with N = 36 objects) and
  elementwise ops whose intermediates XLA materializes in HBM.

This kernel fuses the whole graph-local chain: per grid step it holds a
block of ``block_b`` images in VMEM and emits the final conv output with a
single HBM read of (out_self, proj, alpha_raw, graph) and a single write —
no intermediate round-trips. The per-image [36, x] matmuls run on the MXU
(M = N = 36 underfills the 128-lane array, but the chain is only ~60 GFLOP
at B = 4096 — bandwidth, not FLOPs, is what the fusion buys back).

alpha_raw = relu((f Wq + bq)(f Wk + bk)^T) is computed in XLA and passed in
as a [B, N, N] tensor: it is 40x smaller than the pq/pk operands, so
handing the batched q k^T matmul to XLA both shrinks the kernel's HBM reads
and lets XLA fuse the ReLU into the GEMM epilogue.

Parity: bit-comparable to the XLA chain in ops/gcn.py (same op order, f32
accumulation); `tests/test_pallas.py::test_gcn_chain_*`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(out_self_ref, proj_ref, alpha_ref, graph_ref, bias_ref, out_ref,
            *, block_b: int, num_labels: int):
    f32 = jnp.float32
    bias = bias_ref[:].astype(f32)                       # [L, D]
    for g in range(block_b):                             # static unroll
        graph = graph_ref[g]                             # [N, N] int32
        adj = (graph != 0).astype(f32)
        # out = W_self f + adj @ (W_fold f) + sum_j bias[graph[i, j]]
        o = out_self_ref[g].astype(f32)
        o = o + jnp.dot(adj, proj_ref[g].astype(f32),
                        preferred_element_type=f32)
        for label in range(num_labels):                  # per-label bias sum
            cnt = jnp.sum((graph == label).astype(f32), axis=1, keepdims=True)
            o = o + cnt * bias[label][None, :]
        # correlation: softmax over dim 1 (rows i, the reference's
        # nn.Softmax(dim=1) quirk, gcn.py:117) of adj @ relu(q k^T)
        a = jnp.dot(adj, alpha_ref[g].astype(f32), preferred_element_type=f32)
        a = jax.nn.softmax(a, axis=0)                    # per-image [i, j]
        out_ref[g] = jnp.dot(a, o, preferred_element_type=f32
                             ).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_labels", "block_b", "interpret"))
def gcn_chain_fused(out_self: jax.Array, proj: jax.Array,
                    alpha_raw: jax.Array, graph: jax.Array, bias: jax.Array,
                    num_labels: int = 12, block_b: int = 4,
                    interpret: bool = False) -> jax.Array:
    """Fused graph-local chain of one CorrelatedGraphConv layer.

    out_self:  [B, N, D]  f W_self
    proj:      [B, N, D]  f W_fold (summed direction weights, see ops/gcn.py)
    alpha_raw: [B, N, N]  relu((f Wq + bq)(f Wk + bk)^T)
    graph:     [B, N, N]  int edge labels (0 = no edge)
    bias:      [L, D]     per-label bias table
    Returns [B, N, D] in out_self.dtype (f32 accumulation throughout).
    """
    B, N, D = out_self.shape
    assert B % block_b == 0, f"batch {B} not divisible by block {block_b}"
    kernel = functools.partial(_kernel, block_b=block_b,
                               num_labels=num_labels)
    grid = (B // block_b,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, N, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, N, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, N, N), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, N, N), lambda i: (i, 0, 0)),
            pl.BlockSpec((bias.shape[0], D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, N, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, D), out_self.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * N * (2 * D + N),
            bytes_accessed=(2 * B * N * D + B * N * D) *
            out_self.dtype.itemsize + 2 * B * N * N * 4,
            transcendentals=B * N * N,
        ),
        interpret=interpret,
    )(out_self, proj, alpha_raw, graph, bias)
