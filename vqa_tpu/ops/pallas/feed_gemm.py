"""Fused int8-feed dequant -> bf16 MXU GEMM (the shipping v-projection).

The shipping fast config (int8 feature feed + bf16 GEMMs + lazy v,
PERF.md "int8 MXU compute") pays its v-projection like this in XLA:

    v  = img_q.astype(bf16) * img_scale[..., None]   # 2.4 GB HBM write
    vp = v @ W                                       # 2.4 GB HBM read

The dequantized ``v`` exists ONLY to be the GEMM operand (lazy-v pooling
reads the int8 payload, everything else is DCE'd), yet XLA materializes it
because elementwise producers cannot fuse into a convolution's operand
read. At B=16384 that is ~4.8 GB of HBM traffic the MXU never needed —
the measured 12.75 ms for a 4.9 ms-of-compute GEMM
(scripts/bench_int8_kernel.py).

This kernel dequantizes per activation tile in VMEM: load one [TM, K] int8
tile + its [TM] scales, cast+scale on the VPU, run the bf16 MXU dot against
the VMEM-resident [K, N] bf16 weight, write the output. Same math and
operand order as the XLA path (dequant first, then GEMM), so the only
difference is where the dequantized tile lives.

Gradient-free by design: the int8 feature feed is inference-only data
(features are inputs, not parameters), so no custom VJP is needed; the
training path keeps the XLA form.

Replaces the feed economics of the reference's f32 feature files
(/root/reference/dataset.py:93-104); the reference has no quantized path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, xs_ref, w_ref, out_ref):
    # dequant in VMEM: identical op order to the XLA path
    # (x.astype(w.dtype) * scale, then the GEMM). The MXU accumulates in
    # f32 either way (Mosaic requires the 32-bit accumulator explicitly;
    # XLA's bf16 dot does the same internally), cast once on write.
    xb = x_ref[:].astype(w_ref.dtype) * xs_ref[:].astype(w_ref.dtype)
    acc = jax.lax.dot_general(
        xb, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("tile_m", "interpret"))
def dequant_matmul(x_q: jax.Array, x_scale: jax.Array, w: jax.Array, *,
                   tile_m: int = 512, interpret: bool = False) -> jax.Array:
    """``(x_q.astype(w.dtype) * x_scale[:, None]) @ w`` without the HBM
    round-trip of the dequantized activation.

    x_q:     [M, K] int8
    x_scale: [M] float (cast to w.dtype in-kernel, matching the XLA path
             where the scale multiplies in the feature dtype)
    w:       [K, N] float (bf16 in the shipping config; the [K, N] block
             must fit VMEM)
    Returns [M, N] w.dtype. Rows are padded to a tile multiple internally;
    gate callers with :func:`supports`.
    """
    m, k = x_q.shape
    n = w.shape[1]
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
        ],
        out_specs=pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m + pad, n), w.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * (m + pad) * k * n,
            bytes_accessed=(m + pad) * k + k * n * w.dtype.itemsize
            + (m + pad) * n * w.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x_q, x_scale.reshape(-1, 1), w)
    return out[:m] if pad else out


def supports(m: int, k: int, n: int, tile_m: int = 512,
             itemsize: int = 2) -> bool:
    """Shape gate: weight block + double-buffered activation/output tiles
    + the dequant temp must fit VMEM."""
    vmem = (k * n * itemsize                       # resident weight
            + 2 * tile_m * k * (1 + itemsize)      # int8 tile + dequant temp
            + 2 * tile_m * n * (itemsize + 4))     # out + f32 acc
    return (k % 128 == 0 and n % 128 == 0 and m >= tile_m
            and vmem <= 12 * 1024 * 1024)
