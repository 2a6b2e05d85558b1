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
at the flagship shape the 2-D kernel ties the XLA int8 dot (6.79 vs 6.66 ms
— XLA fuses the epilogue fine in isolation); in-situ in the model graph it
LOSES (37.8 vs 35.0 ms/call at B=16384) to operand relayout copies. The
3-D-native variant (``int8_matmul_dequant_3d``, no graph flatten) closed
most of that gap and IS routed into BaseEncoder's v-projection whenever
``use_int8`` and ``use_pallas`` are both set — but its best measured
model-level time (31.4 ms) still loses to the shipping configuration
(int8 *feed* + bf16 GEMMs + lazy v, 23.2 ms): with one quantized activation
shared by a GEMM and 3-D pooling/attention consumers, layout friction
consumes the int8 MXU's entire 1.9x rate advantage. Enabling both flags is
therefore a measured regression at the flagship shape; the pair remains
supported for shapes where the GEMM dominates.

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


def _kernel(x_ref, xs_ref, w_ref, ws_ref, out_ref, *, relu: bool = False,
            b_ref=None):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                    # [TM, N] int32
    # identical op order to ops/quant.py int8_dot: scales multiply first
    # (f32), then scale the f32-cast accumulator, then cast once.
    scale = xs_ref[:].astype(jnp.float32) * ws_ref[:].astype(jnp.float32)
    y = (acc.astype(jnp.float32) * scale).astype(out_ref.dtype)
    if b_ref is not None:     # bias/ReLU in VMEM — see _kernel3
        y = y + b_ref[:].astype(out_ref.dtype)
    if relu:
        y = jnp.maximum(y, jnp.zeros((), out_ref.dtype))
    out_ref[:] = y


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "tile_m", "relu",
                                    "interpret"))
def int8_matmul_dequant(x_q: jax.Array, x_scale: jax.Array, w_q: jax.Array,
                        w_scale: jax.Array, *, out_dtype=jnp.bfloat16,
                        bias: jax.Array | None = None, relu: bool = False,
                        tile_m: int = 512,
                        interpret: bool = False) -> jax.Array:
    """``(x_q @ w_q) * x_scale[:, None] * w_scale[None, :]`` fused.

    x_q:     [M, K] int8
    x_scale: [M] float (any float dtype; upcast to f32 in-kernel)
    w_q:     [K, N] int8 (the [K, N] block must fit VMEM: K*N <= ~4 MB)
    w_scale: [N] float32
    bias/relu: optional epilogue in VMEM (same op order as ops/quant.py)
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
    in_specs = [
        pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x_q, x_scale.reshape(-1, 1), w_q, w_scale.reshape(1, -1)]
    kernel = functools.partial(_kernel, relu=relu)
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, n), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bias.reshape(1, -1))

        def kernel(x, xs, w, ws, b, o):            # noqa: F811
            _kernel(x, xs, w, ws, o, relu=relu, b_ref=b)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m + pad, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * (m + pad) * k * n,
            bytes_accessed=(m + pad) * k + k * n + (m + pad) * n * 2,
            transcendentals=0),
        interpret=interpret,
    )(*operands)
    return out[:m] if pad else out


def supports(m: int, k: int, n: int, tile_m: int = 512) -> bool:
    """Shape gate: the weight block and one activation tile must fit VMEM
    alongside the epilogue temporaries (~4x the [TM, N] f32 block)."""
    vmem = k * n + tile_m * k + tile_m * n * 10 + 4 * n
    return (k % 128 == 0 and n % 128 == 0 and m >= tile_m
            and vmem <= 12 * 1024 * 1024)


def _kernel3(x_ref, xs_ref, w_ref, ws_ref, out_ref, *, flatten: bool,
             relu: bool, b_ref=None):
    if flatten:
        # flatten to rows IN VMEM (register relayout, not an HBM reshape)
        # so the MXU sees a tall [TB*G, K] M-dim instead of G=36-row
        # batched matmuls that starve its 128-lane M dimension
        tb, g, k = x_ref.shape
        n = w_ref.shape[1]
        acc = jax.lax.dot_general(
            x_ref[:].reshape(tb * g, k), w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).reshape(tb, g, n)
    else:
        acc = jax.lax.dot_general(
            x_ref[:], w_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)            # [TB, G, N] int32
    scale = xs_ref[:].astype(jnp.float32)[:, :, None] \
        * ws_ref[:].astype(jnp.float32)[None, :, :]
    y = (acc.astype(jnp.float32) * scale).astype(out_ref.dtype)
    # bias/ReLU epilogue IN VMEM: XLA fuses these into its own GEMMs but
    # cannot fuse into a pallas_call, so leaving them outside costs a
    # full [B, G, N] elementwise HBM pass. Same op order as the XLA
    # fallback in ops/quant.py (cast, + bias in out dtype, then max).
    if b_ref is not None:
        y = y + b_ref[:].astype(out_ref.dtype)
    if relu:
        y = jnp.maximum(y, jnp.zeros((), out_ref.dtype))
    out_ref[:] = y


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "tile_b", "flatten",
                                    "relu", "interpret"))
def int8_matmul_dequant_3d(x_q: jax.Array, x_scale: jax.Array,
                           w_q: jax.Array, w_scale: jax.Array, *,
                           bias: jax.Array | None = None,
                           relu: bool = False,
                           out_dtype=jnp.bfloat16, tile_b: int = 16,
                           flatten: bool = True,
                           interpret: bool = False) -> jax.Array:
    """3-D-native variant: ``[B, G, K] int8 @ [K, N] -> [B, G, N]`` fused.

    Exists because the 2-D kernel's in-situ loss was traced to the graph
    around it, not the kernel: flattening ``img_q`` to rows forces XLA to
    reconcile the reshape against the {2,0,1} layout its 3-D einsum
    consumers prefer — ~14 ms/step of reshape/copy data movement at
    B=16384 (scripts/trace_int8_pallas.py). Consuming the natural [B, G, K]
    blocks leaves no reshape in the graph. Same math, same single cast.
    """
    b, g, k = x_q.shape
    n = w_q.shape[1]
    pad = (-b) % tile_b
    if pad:
        x_q = jnp.pad(x_q, ((0, pad), (0, 0), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, pad), (0, 0)))
    grid = ((b + pad) // tile_b,)
    in_specs = [
        pl.BlockSpec((tile_b, g, k), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_b, g), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x_q, x_scale, w_q, w_scale.reshape(1, -1)]
    kernel = functools.partial(_kernel3, flatten=flatten, relu=relu)
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, n), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bias.reshape(1, -1))

        def kernel(x, xs, w, ws, b, o):            # noqa: F811
            _kernel3(x, xs, w, ws, o, flatten=flatten, relu=relu, b_ref=b)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_b, g, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b + pad, g, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * (b + pad) * g * k * n,
            bytes_accessed=(b + pad) * g * k + k * n
            + (b + pad) * g * n * 2,
            transcendentals=0),
        interpret=interpret,
    )(*operands)
    return out[:b] if pad else out


def supports_3d(b: int, g: int, k: int, n: int, tile_b: int = 16) -> bool:
    """Shape gate for the 3-D kernel. Sublane padding: int8 tiles are
    (32, 128) on the last two dims, so g pads to a multiple of 32 in VMEM.
    The epilogue temporaries are transient vector registers, not resident
    VMEM blocks — budget the pipelined operand/output blocks (TB=16 at the
    flagship shape measured fine and fastest, scripts/bench_int8_kernel.py
    main_3d)."""
    g_pad = -(-g // 32) * 32
    vmem = (k * n                                  # resident int8 weight
            + 2 * tile_b * g_pad * k               # int8 tiles (pipelined)
            + 2 * tile_b * g_pad * n * 2           # out blocks (pipelined)
            + 4 * n)
    return (k % 128 == 0 and n % 128 == 0 and b >= tile_b
            and vmem <= 12 * 1024 * 1024)
