"""int8 MXU matmul path for the quantized feature feed.

The v5e MXU runs int8 x int8 -> int32 at ~1.8x the bf16 FLOP rate
(measured: 251 vs 142 TF/s at the flagship GEMM shape — PERF.md "int8
MXU"). The win is only real when the activation is *already* int8: a
dynamic row-requantization pass costs one full HBM read/write of the
activation and eats most of the rate gain (measured 162 TF/s).

The int8 feature feed (data/shards.py) delivers exactly that: ``img_q``
[B, objs, v_dim] int8 with per-box scales ``img_scale`` [B, objs]. The
dominant forward GEMM — the attention v-projection, ~2.5 TFLOP/batch of the
~3.9 TFLOP Up-Down forward (PERF.md "Where the forward time goes") — can
therefore consume the quantized payload directly and fold both scales into
the GEMM epilogue:

    y[r, j] = (sum_k x_q[r, k] * w_q[k, j]) * x_scale[r] * w_scale[j] + b[j]

Weights are quantized symmetrically per *output channel* at apply time (one
[in, out] elementwise pass — negligible next to the batch GEMM, and it keeps
checkpoints in f32 so the path is a pure inference-time reinterpretation).

The reference has no quantized path at all (features are f32 npz files,
/root/reference/dataset.py:93-104); this is TPU-native surface, exposed as
``--use_int8`` / ``set_model(..., use_int8=True)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_rows(x: jax.Array):
    """Dynamic symmetric per-row int8 quantization of [..., in] activations.

    Returns (x_q int8, x_scale [...] float32). One elementwise pass (abs-max
    reduce + scale + round); worth paying only when the quantized activation
    feeds SEVERAL int8 GEMMs — e.g. the GCN layer input, contracted by the
    w_self / folded-direction / correlation projections (ops/gcn.py). For a
    single GEMM the pass eats most of the int8 rate gain (measured 162 vs
    251 TF/s, scripts/profile_int8.py).
    """
    # abs-max reduce in the input dtype (no f32 copy of x — at serving
    # batches that copy alone is multiple GB of HBM); only the tiny scale
    # vector and the fused elementwise requant run in f32.
    x_scale = jnp.maximum(
        jnp.max(jnp.abs(x), axis=-1).astype(jnp.float32) / 127.0, 1e-8)
    inv = (1.0 / x_scale)[..., None]
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127
                   ).astype(jnp.int8)
    return x_q, x_scale


def quantize_weight_per_col(kernel: jax.Array):
    """Symmetric per-output-channel int8 quantization of an [in, out] kernel.

    Returns (w_q int8 [in, out], w_scale float32 [out]) with
    ``kernel ~= w_q * w_scale``.
    """
    kernel = kernel.astype(jnp.float32)
    w_scale = jnp.max(jnp.abs(kernel), axis=0) / 127.0
    w_scale = jnp.maximum(w_scale, jnp.finfo(jnp.float32).tiny)
    w_q = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)
    return w_q, w_scale


def int8_dot(x_q: jax.Array, x_scale: jax.Array, kernel: jax.Array,
             *, out_dtype=None, use_pallas: bool = False,
             bias: jax.Array | None = None,
             relu: bool = False) -> jax.Array:
    """``dequant(x_q) @ kernel`` computed as one int8 MXU GEMM.

    x_q:     [..., in] int8 (pre-quantized activation, e.g. ``img_q``)
    x_scale: [...] float — per-row dequant scales (e.g. ``img_scale``)
    kernel:  [in, out] float — quantized per output channel on the fly
    Returns [..., out] in ``out_dtype`` (default float32).

    ``use_pallas`` routes qualifying shapes through the fused Pallas kernel
    (ops/pallas/int8_matmul.py): the int32 accumulator and the f32 dequant
    product stay in VMEM instead of round-tripping HBM between the GEMM and
    its epilogue — pass the FINAL consumer dtype as ``out_dtype`` so the
    only HBM write is the finished output. Bit-identical to the XLA path
    (same int32-exact dot, same f32 scale product, same single cast).

    ``bias``/``relu`` extend the epilogue (y + bias in the out dtype, then
    max(0)): XLA fuses these into its own GEMM but cannot fuse into a
    pallas_call, so the Pallas route applies them in VMEM; the XLA route
    applies the identical ops so both routes agree bit-for-bit.
    """
    assert x_q.dtype == jnp.int8, f"x_q must be int8, got {x_q.dtype}"
    w_q, w_scale = quantize_weight_per_col(kernel)
    lead = x_q.shape[:-1]
    rows = x_q.reshape(-1, x_q.shape[-1])
    m, k = rows.shape
    n = kernel.shape[-1]
    if use_pallas:
        from vqa_tpu.ops.pallas import int8_matmul
        interp = jax.default_backend() != "tpu"
        if x_q.ndim == 3:
            # 3-D-native kernel: no flatten in the GRAPH (the in-situ loss
            # of the 2-D route was ~14 ms/step of reshape/relayout copies
            # around the kernel — PERF.md "Round-3 int8-GEMM shootout")
            for tb in (16, 8):
                if int8_matmul.supports_3d(*x_q.shape, n, tb):
                    return int8_matmul.int8_matmul_dequant_3d(
                        x_q, x_scale, w_q, w_scale, bias=bias, relu=relu,
                        out_dtype=out_dtype or jnp.float32, tile_b=tb,
                        interpret=interp)
        for tile_m in (512, 256):   # shrink the tile until VMEM fits
            if int8_matmul.supports(m, k, n, tile_m):
                y = int8_matmul.int8_matmul_dequant(
                    rows, x_scale.reshape(-1), w_q, w_scale,
                    bias=bias, relu=relu,
                    out_dtype=out_dtype or jnp.float32, tile_m=tile_m,
                    interpret=interp)
                return y.reshape(*lead, n)
    acc = jax.lax.dot_general(
        rows, w_q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                  # [rows, out]
    y = acc.astype(jnp.float32) \
        * (x_scale.astype(jnp.float32).reshape(-1, 1) * w_scale[None, :])
    if out_dtype is not None:
        y = y.astype(out_dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    if relu:
        y = jnp.maximum(y, jnp.zeros((), y.dtype))
    return y.reshape(*lead, n)
