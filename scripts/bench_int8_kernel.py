"""Flagship v-projection GEMM shootout: bf16 vs XLA int8_dot vs fused Pallas.

The model-level int8-GEMM row LOST to bf16 (34.6 vs 22.9 ms/call, PERF.md
"int8 MXU compute") even though the int8 MXU runs ~1.8x bf16 standalone.
MEASURED RESULT (round 3): isolated, XLA *does* fuse the dequant epilogue —
XLA int8_dot 6.66 ms beats bf16 12.75 ms, and the Pallas kernel merely ties
it (6.79 ms). The model-level loss is a model-context fusion failure
(scripts/dump_int8_hlo.py names the materialized s32/f32 epilogue), and the
Pallas kernel loses in-situ to relayout copies (PERF.md "Round-3 int8-GEMM
shootout").

This script isolates the exact flagship shape ([B*36, 2048] @ [2048, 1024]
-> bf16, B=16384) with relay cost canceled:

  1. bf16 GEMM (dequant of the int8 feed fused into the operand read) —
     the shipping fast-config path
  2. XLA int8_dot, out_dtype=bf16
  3. Pallas int8_matmul_dequant (epilogue in VMEM, only the bf16 output
     touches HBM)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_int8_kernel.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _bench_util import chained_ms

from vqa_tpu.ops.quant import int8_dot, quantize_weight_per_col
from vqa_tpu.ops.pallas.int8_matmul import int8_matmul_dequant

B, NOBJ, K, N = 16384, 36, 2048, 1024
M = B * NOBJ
REPS = 8
FLOPS = 2 * M * K * N


def chain(c, y):
    """Fold a slice of the [M, N] output back into row 0 of the int8 carry
    (data dependency; identical tiny cost across all variants)."""
    row = jnp.tile(y[0].astype(jnp.int8), K // N)[None]
    return jax.lax.dynamic_update_slice(c, row, (0, 0))


def bench(name, step, carry, args):
    ms = chained_ms(step, carry, args, reps=REPS, mode="cancel")
    print(f"{name:52s} {ms:8.2f} ms  ({FLOPS / (ms / 1e3) / 1e12:6.1f} TF/s)",
          flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    x_q = jax.device_put(rng.integers(-127, 128, (M, K), dtype=np.int8))
    x_scale = jax.device_put(
        (rng.random(M, dtype=np.float32) * 0.02 + 1e-3).astype(jnp.bfloat16))
    kernel = jax.device_put(
        (rng.standard_normal((K, N), dtype=np.float32) * 0.03))
    w_bf = kernel.astype(jnp.bfloat16)
    w_q, w_scale = jax.jit(quantize_weight_per_col)(kernel)
    w_q, w_scale = jax.device_put(w_q), jax.device_put(w_scale)

    def bf16_step(c, xs, w):
        x = c.astype(jnp.bfloat16) * xs[:, None]     # feed dequant (fused)
        y = jnp.matmul(x, w, preferred_element_type=jnp.bfloat16)
        return chain(c, y)
    bench("bf16 GEMM (int8 feed dequant fused into operand)",
          bf16_step, x_q, (x_scale, w_bf))

    def xla_int8_step(c, xs, w):
        y = int8_dot(c, xs, w, out_dtype=jnp.bfloat16)
        return chain(c, y)
    bench("XLA int8_dot -> bf16 (f32 epilogue in HBM)",
          xla_int8_step, x_q, (x_scale, kernel))

    def pallas_step(c, xs, wq, ws):
        y = int8_matmul_dequant(c, xs, wq, ws, out_dtype=jnp.bfloat16)
        return chain(c, y)
    bench("Pallas int8_matmul_dequant -> bf16 (VMEM epilogue)",
          pallas_step, x_q, (x_scale, w_q, w_scale))


def main_3d():
    """3-D-native kernel variants at the flagship shape (see PERF.md
    "Round-3 int8-GEMM shootout" — run after main() in the same window)."""
    from vqa_tpu.ops.pallas.int8_matmul import int8_matmul_dequant_3d
    rng = np.random.default_rng(0)
    x_q = jax.device_put(rng.integers(-127, 128, (B, NOBJ, K), dtype=np.int8))
    x_scale = jax.device_put(
        (rng.random((B, NOBJ), dtype=np.float32) * 0.02 + 1e-3)
        .astype(jnp.bfloat16))
    kernel = jax.device_put(
        (rng.standard_normal((K, N), dtype=np.float32) * 0.03))
    w_q, w_scale = jax.jit(quantize_weight_per_col)(kernel)

    def chain3(c, y):
        row = jnp.tile(y[0, 0].astype(jnp.int8), K // N)[None, None]
        return jax.lax.dynamic_update_slice(c, row, (0, 0, 0))

    for flatten in (True, False):
        for tb in (8, 16):
            def step(c, xs, wq, ws, tb=tb, flatten=flatten):
                y = int8_matmul_dequant_3d(c, xs, wq, ws,
                                           out_dtype=jnp.bfloat16,
                                           tile_b=tb, flatten=flatten)
                return chain3(c, y)
            name = f"Pallas 3d flatten={flatten} TB={tb}"
            try:
                ms = chained_ms(step, x_q, (x_scale, w_q, w_scale),
                                reps=REPS, mode="cancel")
                print(f"{name:52s} {ms:8.2f} ms  "
                      f"({FLOPS / (ms / 1e3) / 1e12:6.1f} TF/s)", flush=True)
            except Exception as e:
                print(f"{name:52s} FAILED: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    import os
    if os.environ.get("VQA_3D_ONLY"):
        print(f"devices: {jax.devices()}", flush=True)
        main_3d()
    else:
        main()
        main_3d()
