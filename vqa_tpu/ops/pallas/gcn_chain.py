"""Fused GCN relation-chain kernel (ReGAT corr-conv, VERDICT r1 item 3).

One CorrelatedGraphConv layer (reference `/root/reference/modules/gcn.py:
93-168`) splits into two regimes:

- the four big ``[B*N, D] @ [D, D]`` projections (W_self, the folded
  direction weights, and the DotProduct q/k projections) — dense MXU work
  that XLA already schedules at speed-of-light, so they stay in XLA;
- the *graph-local chain* that follows: adjacency aggregation
  ``adj @ proj``, the per-label bias sum, the correlation re-weighting
  ``softmax_axis1(adj @ relu(q k^T)) @ out`` — batched matmuls over tiny
  [N, N] per-image operands (N = 36 objects) that leave the 128x128 MXU
  ~8% occupied and latency-bound, in XLA and naive kernels alike (both
  measured ~39-45 ms at B = 4096, PERF.md "ReGAT / GCN kernel").

The fusion trick here is **block-diagonal batching**: a grid step loads
``block_b`` images and assembles

    M   = [ blockdiag(adj_0..adj_{G-1})  |  label_counts ]   [G*N, G*N+L]
    rhs = [ stack(proj_g) | stack(alpha_g) ]                 [G*N+L, D+N]
          [ bias          | 0              ]

so ONE MXU matmul ``M @ rhs`` yields, for every image at once, both the
adjacency aggregation + label bias (columns :D) and the alpha propagation
``adj @ relu(q k^T)`` (columns D:). A second block-diagonal matmul applies
the softmaxed correlation to the aggregated features. G*N rows = 288 at
G = 8 fill the MXU; the zero blocks waste G-fold FLOPs but the chain is
only ~60 GFLOP at B = 4096 — occupancy, not FLOPs, is what the batching
buys back. Everything is built as values (iota masks + lane concatenation),
no scratch, no unaligned stores.

alpha_raw = relu((f Wq + bq)(f Wk + bk)^T) is computed in XLA and passed in
as a [B, N, N] tensor: it is 40x smaller than its pq/pk operands, and XLA
fuses the ReLU into the batched GEMM epilogue. (The caller shrinks its cost
with the ``DotProduct.similarity_parts`` identity — one [*, D]@[D, D] GEMM
instead of two out_dim projections; see ops/gcn.py. An in-kernel variant
that also fused this contraction was measured ~3x slower than XLA's batched
einsum: contracting on lane dims forces a per-block transpose relayout.)

Parity: matches the XLA chain in ops/gcn.py (f32 accumulation);
`tests/test_pallas.py::test_gcn_chain_*`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(out_self_ref, proj_ref, alpha_ref, graph_ref, bias_ref, out_ref,
            *, block_b: int, n_objs: int, num_labels: int):
    G, N, L = block_b, n_objs, num_labels
    D = out_self_ref.shape[-1]
    f32 = jnp.float32
    mm_dtype = out_self_ref.dtype

    graph2d = graph_ref[:].reshape(G * N, N)              # [GN, N] int32
    adj2d = (graph2d != 0).astype(mm_dtype)

    # same-image mask: entry (r, c) lives in image r//N == c//N
    row_img = jax.lax.broadcasted_iota(jnp.int32, (G * N, G * N), 0) // N
    col_img = jax.lax.broadcasted_iota(jnp.int32, (G * N, G * N), 1) // N
    same = (row_img == col_img).astype(mm_dtype)

    # blockdiag(adj): tile the local adjacency across the lane axis and
    # zero everything off the diagonal blocks
    bd_adj = jnp.concatenate([adj2d] * G, axis=1) * same  # [GN, GN]

    # per-row label counts (bias table is shared across images, so the
    # count columns need no block structure): counts[r, l] = #{j: g[r,j]=l}
    counts = jnp.concatenate(
        [jnp.sum((graph2d == l).astype(mm_dtype), axis=1, keepdims=True)
         for l in range(L)], axis=1)                      # [GN, L]

    m = jnp.concatenate([bd_adj, counts], axis=1)         # [GN, GN+L]
    rhs_top = jnp.concatenate(
        [proj_ref[:].reshape(G * N, D).astype(mm_dtype),
         alpha_ref[:].reshape(G * N, N).astype(mm_dtype)], axis=1)
    rhs_bot = jnp.concatenate(
        [bias_ref[:].astype(mm_dtype),
         jnp.zeros((L, N), mm_dtype)], axis=1)
    rhs = jnp.concatenate([rhs_top, rhs_bot], axis=0)     # [GN+L, D+N]

    big = jnp.dot(m, rhs, preferred_element_type=f32)     # [GN, D+N]
    o_stack = out_self_ref[:].reshape(G * N, D).astype(f32) + big[:, :D]

    # softmax over dim 1 of [B, i, j] (rows i within each image — the
    # reference's nn.Softmax(dim=1) quirk, gcn.py:117)
    aa = big[:, D:].reshape(G, N, N)
    aa = jax.nn.softmax(aa, axis=1).reshape(G * N, N).astype(mm_dtype)
    bd_aa = jnp.concatenate([aa] * G, axis=1) * same      # [GN, GN]

    out = jnp.dot(bd_aa, o_stack.astype(mm_dtype), preferred_element_type=f32)
    out_ref[:] = out.reshape(G, N, D).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_labels", "block_b", "interpret"))
def gcn_chain_fused(out_self: jax.Array, proj: jax.Array,
                    alpha_raw: jax.Array, graph: jax.Array, bias: jax.Array,
                    num_labels: int = 12, block_b: int = 8,
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
    kernel = functools.partial(_kernel, block_b=block_b, n_objs=N,
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
            flops=2 * B * N * (block_b * N + num_labels) * (D + N)
            + 2 * B * N * block_b * N * D,
            bytes_accessed=3 * B * N * D * out_self.dtype.itemsize
            + 2 * B * N * N * 4,
            transcendentals=B * N * N,
        ),
        interpret=interpret,
    )(out_self, proj, alpha_raw, graph, bias)
