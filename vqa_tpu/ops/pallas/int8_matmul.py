"""Fused int8 MXU matmul with in-VMEM dequant epilogue.

``int8_dot`` (ops/quant.py) expressed in XLA pays for its epilogue in HBM:
the int8 GEMM's [M, N] int32 accumulator round-trips to HBM before the
(x_scale x w_scale) dequant pass, and the f32 product round-trips again
before the final model-dtype cast — at the flagship v-projection shape
([B*36, 2048] @ [2048, 1024], B=16384) that is ~7 GB of traffic the MXU
never needed. Measured model-level consequence: the int8 GEMM path LOST to
bf16 (34.6 vs 22.9 ms/call, PERF.md "int8 MXU compute") despite the int8
MXU's ~1.8x rate advantage.

This kernel keeps the whole epilogue in VMEM: each grid step loads one
[TM, K] int8 activation tile and the VMEM-resident [K, N] int8 weight, runs
the int8 x int8 -> int32 MXU dot, applies ``acc_f32 * (x_scale * w_scale)``
on the VPU, and writes the final output dtype — the int32/f32 intermediates
never exist in HBM. The math is bit-identical to the XLA path in
ops/quant.py (same int32-exact dot, same f32 scale product, same final
cast), so the kernel is a pure layout optimization, pinned by
tests/test_pallas.py::test_int8_matmul_*.

MEASURED VERDICT (round 3, PERF.md "Round-3 int8-GEMM shootout"): isolated
at the flagship shape the kernel ties the XLA int8 dot (6.79 vs 6.66 ms —
XLA fuses the epilogue fine in isolation); in-situ in the model graph it
LOSES (37.8 vs 35.0 ms/call at B=16384) to operand relayout copies. It
therefore ships as an opt-in library path (``int8_dot(use_pallas=True)``)
and is NOT routed into any model.

VMEM budget at TM=512, K=2048, N=1024: x tile 1 MB + w 2 MB + int32 acc
2 MB + f32 epilogue 2 MB + bf16 out 1 MB (x2 pipeline buffers on the small
operands) — comfortably inside 16 MB.

Replaces the feed economics of the reference's f32 features
(/root/reference/dataset.py:93-104); the reference has no quantized path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, xs_ref, w_ref, ws_ref, out_ref):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                    # [TM, N] int32
    # identical op order to ops/quant.py int8_dot: scales multiply first
    # (f32), then scale the f32-cast accumulator, then cast once.
    scale = xs_ref[:].astype(jnp.float32) * ws_ref[:].astype(jnp.float32)
    out_ref[:] = (acc.astype(jnp.float32) * scale).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "tile_m", "interpret"))
def int8_matmul_dequant(x_q: jax.Array, x_scale: jax.Array, w_q: jax.Array,
                        w_scale: jax.Array, *, out_dtype=jnp.bfloat16,
                        tile_m: int = 512,
                        interpret: bool = False) -> jax.Array:
    """``(x_q @ w_q) * x_scale[:, None] * w_scale[None, :]`` fused.

    x_q:     [M, K] int8
    x_scale: [M] float (any float dtype; upcast to f32 in-kernel)
    w_q:     [K, N] int8 (the [K, N] block must fit VMEM: K*N <= ~4 MB)
    w_scale: [N] float32
    Returns [M, N] ``out_dtype``. Rows are padded to a tile multiple
    internally; use :func:`supports` to gate callers.
    """
    m, k = x_q.shape
    n = w_q.shape[1]
    pad = (-m) % tile_m
    if pad:
        x_q = jnp.pad(x_q, ((0, pad), (0, 0)))
        x_scale = jnp.pad(x_scale, (0, pad))
    grid = ((m + pad) // tile_m,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m + pad, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * (m + pad) * k * n,
            bytes_accessed=(m + pad) * k + k * n + (m + pad) * n * 2,
            transcendentals=0),
        interpret=interpret,
    )(x_q, x_scale.reshape(-1, 1), w_q, w_scale.reshape(1, -1))
    return out[:m] if pad else out


def supports(m: int, k: int, n: int, tile_m: int = 512) -> bool:
    """Shape gate: the weight block and one activation tile must fit VMEM
    alongside the epilogue temporaries (~4x the [TM, N] f32 block)."""
    vmem = k * n + tile_m * k + tile_m * n * 10 + 4 * n
    return (k % 128 == 0 and n % 128 == 0 and m >= tile_m
            and vmem <= 12 * 1024 * 1024)
