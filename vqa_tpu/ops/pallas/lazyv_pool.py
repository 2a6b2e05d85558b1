"""Fused lazy-v pooling over the int8 feature payload.

The shipping fast config pools attended features directly over the int8
feed (models/encoder.py ``lazy_v``):

    v_sum[b, d] = sum_n w[b, n] * img_q[b, n, d]     # w = att * img_scale

In XLA this einsum ("bn,bnd->bd") materializes its multiply operand — a
[B, objs, v_dim] bf16 tensor (2.4 GB at B=16384) written and re-read around
the reduce (seen in the TPU-optimized HLO, scripts/dump_int8_hlo.py), i.e.
the lazy-v rewrite still pays one dense materialization it was meant to
avoid.

This kernel keeps the product in VMEM: each grid step loads a [TB, objs,
v_dim] int8 tile plus its [TB, objs] weights, forms w[:, :, None] * q8 on
the VPU and reduces over objs in registers — HBM sees only the int8 read
(1.2 GB) and the [B, v_dim] output (64 MB). Same op order as the XLA
einsum (cast to the weight dtype, multiply, sum over objs).

Inference-only by design (the training path keeps the differentiable XLA
einsum). Replaces the feed economics of the reference's f32 features
(/root/reference/dataset.py:93-104); the pooled consumer is the base
predictor's ``v.sum(1)`` (/root/reference/modules/predictor.py:81-93).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(w_ref, x_ref, out_ref):
    # f32 for the broadcast product: Mosaic only supports non-no-op minor
    # dim insertion for 32-bit types, and the f32 multiply+reduce is at
    # least as precise as the XLA einsum's (which accumulates f32 too)
    prod = w_ref[:].astype(jnp.float32)[:, :, None] \
        * x_ref[:].astype(jnp.float32)
    out_ref[:] = jnp.sum(prod, axis=1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def pool_int8(w: jax.Array, x_q: jax.Array, *, tile_b: int = 32,
              interpret: bool = False) -> jax.Array:
    """``einsum('bn,bnd->bd', w, x_q.astype(w.dtype))`` fused in VMEM.

    w:   [B, N] float (attention weights x dequant scales)
    x_q: [B, N, D] int8 (the quantized feature payload)
    Returns [B, D] w.dtype. B is padded to a tile multiple internally;
    gate callers with :func:`supports`.
    """
    b, n = w.shape
    d = x_q.shape[-1]
    pad = (-b) % tile_b
    if pad:
        w = jnp.pad(w, ((0, pad), (0, 0)))
        x_q = jnp.pad(x_q, ((0, pad), (0, 0), (0, 0)))
    grid = ((b + pad) // tile_b,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b + pad, d), w.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * (b + pad) * n * d,
            bytes_accessed=(b + pad) * n * d + (b + pad) * d * w.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(w, x_q)
    return out[:b] if pad else out


def supports(b: int, n: int, d: int, tile_b: int = 32,
             itemsize: int = 2) -> bool:
    """Shape gate against v5e VMEM (16 MB physical).

    The f32 intermediates are budgeted explicitly at 4 bytes/element
    (ADVICE r3: the old gate priced the product temp at ``itemsize`` and
    omitted the cast entirely, underestimating real demand ~2.5x). One
    fusion assumption, backed by evidence: Mosaic folds the broadcast
    product into the ``jnp.sum`` reduction rather than materializing the
    full [tile_b, n, d] f32 product — the flagship tile (32, 36, 2048)
    compiles and runs (PERF.md round-3 int8-GEMM shootout) while int8
    tiles + cast + a materialized product would need ~24 MB > physical
    VMEM. What provably coexists: the double-buffered int8 tiles, the
    f32 cast of one tile, the weight tile + its cast, the f32
    accumulator, and the double-buffered output.
    """
    vmem = (2 * tile_b * n * d                  # int8 tiles (pipelined)
            + 4 * tile_b * n * d                # f32 cast of one tile
            + tile_b * n * (itemsize + 4)       # w tile + f32 cast
            + 4 * tile_b * d                    # f32 accumulator
            + 2 * tile_b * d * itemsize)        # out tiles (pipelined)
    return b >= tile_b and d % 128 == 0 and vmem <= 15 * 1024 * 1024
