"""Fused top-down attention + weighted pooling kernel.

Computes, for the Up-Down MultiplyAttention path (reference
attention.py:55-86 feeding predictor.py:85):

    vp     = relu(v @ Wv + bv)            [B, N, H]
    qp     = relu(q @ Wq + bq)            [B, H]
    logits = (vp * qp[:, None, :]) @ wl + bl
    att    = softmax_N(logits)            [B, N]
    pooled = sum_N att * v                [B, Dv]

as ONE Pallas kernel tiled over the batch. The [B, N, H] intermediate —
2 * B * N * H * bytes of HBM round-trip in the unfused graph (≈ 2.4 GB at
B=16k) — never leaves VMEM. Weight-norm scalars are folded into the dense
kernels by the caller (they're scalar multiplies on weights).

Inference path only (no dropout). The XLA reference implementation
(`multiply_attention_pool_reference`) is the correctness oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def multiply_attention_pool_reference(v, q, wv, bv, wq, bq, wl, bl):
    """Pure-XLA oracle. v: [B, N, Dv]; q: [B, Hq]; returns (pooled [B, Dv],
    att [B, N])."""
    vp = jax.nn.relu(jnp.einsum("bnd,dh->bnh", v, wv) + bv)
    qp = jax.nn.relu(q @ wq + bq)
    logits = jnp.einsum("bnh,h->bn", vp * qp[:, None, :], wl[:, 0]) + bl[0]
    att = jax.nn.softmax(logits, axis=1)
    pooled = jnp.einsum("bn,bnd->bd", att, v)
    return pooled, att


def _kernel(v_ref, q_ref, wv_ref, bv_ref, wq_ref, bq_ref, wl_ref, bl_ref,
            pooled_ref, att_ref, *, tile_b: int, num_objs: int):
    v = v_ref[:]                                   # [T, N, Dv]
    t, n, dv = v.shape
    h = wv_ref.shape[1]
    v2d = v.reshape(t * n, dv)
    vp = jnp.dot(v2d, wv_ref[:], preferred_element_type=jnp.float32)
    vp = jax.nn.relu(vp + bv_ref[:].astype(jnp.float32))
    qp = jnp.dot(q_ref[:], wq_ref[:], preferred_element_type=jnp.float32)
    qp = jax.nn.relu(qp + bq_ref[:].astype(jnp.float32))         # [T, H]
    # broadcast gate per box: [T*N, H] * [T, H] expanded
    gated = vp.reshape(t, n, h) * qp[:, None, :]
    logits = jnp.dot(gated.reshape(t * n, h), wl_ref[:],
                     preferred_element_type=jnp.float32)          # [T*N, 1]
    logits = (logits + bl_ref[:].astype(jnp.float32)).reshape(t, n)
    att = jax.nn.softmax(logits, axis=1)                          # [T, N]
    att_ref[:] = att.astype(att_ref.dtype)
    # pooled = sum_N att * v  (VPU broadcast-multiply-reduce; Mosaic does not
    # support batched dot_general here)
    pooled = jnp.sum(att[:, :, None] * v.astype(jnp.float32), axis=1)
    pooled_ref[:] = pooled.astype(pooled_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def fused_multiply_attention_pool(v, q, wv, bv, wq, bq, wl, bl,
                                  tile_b: int = 16, interpret: bool = False):
    """Fused kernel entry. v: [B, N, Dv] (B % tile_b == 0); q: [B, Hq].

    Returns (pooled [B, Dv] float32, att [B, N] float32).
    """
    B, N, Dv = v.shape
    H = wv.shape[1]
    assert B % tile_b == 0, f"batch {B} not divisible by tile {tile_b}"
    grid = (B // tile_b,)

    kernel = functools.partial(_kernel, tile_b=tile_b, num_objs=N)
    weight_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    pooled, att = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, N, Dv), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, q.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            weight_spec(wv.shape),
            weight_spec(bv.shape),
            weight_spec(wq.shape),
            weight_spec(bq.shape),
            weight_spec(wl.shape),
            weight_spec(bl.shape),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, Dv), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Dv), jnp.float32),
            jax.ShapeDtypeStruct((B, N), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * Dv * H + 2 * B * N * H + 2 * B * N * Dv,
            bytes_accessed=B * N * Dv * v.dtype.itemsize + Dv * H * 4,
            transcendentals=B * N,
        ),
        interpret=interpret,
    )(v, q, wv, bv, wq, bq, wl, bl)
    return pooled, att
