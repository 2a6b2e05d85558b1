"""Shipping-config HBM levers: dequant-GEMM fusion + lazy-v pooling fusion.

The shipping fast config (int8 feed + bf16 GEMMs + lazy v, 23.2 ms/call at
B=16384) still materializes two dense [B, objs, v_dim] bf16 tensors the HLO
says it doesn't need (scripts/dump_int8_hlo.py):

  1. the dequantized features, written only to be the v-projection GEMM's
     operand (elementwise producers cannot fuse into a convolution read);
  2. the lazy-v pooling einsum's multiply operand.

Each is ~2.4 GB written + re-read (~6 ms/pair at the ~819 GB/s HBM floor).
This script measures the fused Pallas replacements in isolation, relay cost
canceled (chained reps, _bench_util.chained_ms):

  A. v-projection [B*36, 2048] @ [2048, 1024] -> bf16:
     a) XLA dequant-then-GEMM (shipping)        b) XLA GEMM-then-scale fold
     c) Pallas dequant_matmul (dequant in VMEM, ops/pallas/feed_gemm.py)
  B. pooling einsum('bn,bnd->bd', w, q8):
     a) XLA einsum (shipping)                   b) Pallas pool_int8
     (ops/pallas/lazyv_pool.py)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_lazyv.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _bench_util import chained_ms

from vqa_tpu.ops.pallas.feed_gemm import dequant_matmul
from vqa_tpu.ops.pallas.lazyv_pool import pool_int8

B, NOBJ, K, N = 16384, 36, 2048, 1024
M = B * NOBJ
REPS = 8
GEMM_FLOPS = 2 * M * K * N
POOL_GB = M * K / 1e9  # dominant traffic: the int8 payload read


def chain_rows(c, y):
    row = jnp.tile(y[0].astype(jnp.int8), K // y.shape[-1])[None]
    return jax.lax.dynamic_update_slice(c, row, (0, 0))


def bench(name, step, carry, args, flops=None, gb=None):
    ms = chained_ms(step, carry, args, reps=REPS, mode="cancel")
    rate = (f"{flops / (ms / 1e3) / 1e12:6.1f} TF/s" if flops
            else f"{gb / (ms / 1e3):6.0f} GB/s")
    print(f"{name:56s} {ms:8.2f} ms  ({rate})", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    x2 = jax.device_put(rng.integers(-127, 128, (M, K), dtype=np.int8))
    xs2 = jax.device_put(
        (rng.random(M, dtype=np.float32) * 0.02 + 1e-3).astype(jnp.bfloat16))
    w_bf = jax.device_put(
        (rng.standard_normal((K, N), dtype=np.float32) * 0.03)
        .astype(jnp.bfloat16))

    # --- A: v-projection ---
    def xla_pre(c, xs, w):
        x = c.astype(jnp.bfloat16) * xs[:, None]
        return chain_rows(c, jnp.matmul(x, w,
                                        preferred_element_type=jnp.bfloat16))
    bench("A.a XLA dequant-then-GEMM (shipping)", xla_pre, x2, (xs2, w_bf),
          flops=GEMM_FLOPS)

    def xla_post(c, xs, w):
        y = jnp.matmul(c.astype(jnp.bfloat16), w,
                       preferred_element_type=jnp.bfloat16)
        return chain_rows(c, y * xs[:, None])
    bench("A.b XLA GEMM-then-scale fold", xla_post, x2, (xs2, w_bf),
          flops=GEMM_FLOPS)

    def pallas_gemm(c, xs, w):
        return chain_rows(c, dequant_matmul(c, xs, w, tile_m=256))
    bench("A.c Pallas dequant_matmul (VMEM dequant)", pallas_gemm, x2,
          (xs2, w_bf), flops=GEMM_FLOPS)

    # --- B: lazy-v pooling ---
    x3 = jax.device_put(
        rng.integers(-127, 128, (B, NOBJ, K), dtype=np.int8))
    wts = jax.device_put(
        (rng.random((B, NOBJ), dtype=np.float32) * 0.05).astype(jnp.bfloat16))

    def chain_pool(c, y):
        col = jnp.tile(y[:, :1].astype(jnp.int8), NOBJ)  # [B, NOBJ]
        return jax.lax.dynamic_update_slice(c, col[:, :, None], (0, 0, 0))

    def xla_pool(c, w):
        y = jnp.einsum("bn,bnd->bd", w, c.astype(w.dtype),
                       preferred_element_type=w.dtype)
        return chain_pool(c, y)
    bench("B.a XLA pooling einsum (shipping)", xla_pool, x3, (wts,),
          gb=POOL_GB)

    for tb in (32, 16, 64):
        def pallas_pool(c, w, tb=tb):
            return chain_pool(c, pool_int8(w, c, tile_b=tb))
        try:
            bench(f"B.b Pallas pool_int8 (VMEM product, TB={tb})",
                  pallas_pool, x3, (wts,), gb=POOL_GB)
        except Exception as e:
            print(f"B.b TB={tb} failed: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
