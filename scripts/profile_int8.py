"""int8 MXU GEMM rate vs bf16 on the real chip (round-2 "remaining lever").

The flagship forward is dominated by the attention v-projection
([B*36, 2048] @ [2048, 1024], PERF.md "Where the forward time goes"). The
v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 FLOP rate; since the int8
feature feed already delivers `img_q` (int8) + `img_scale`, the projection
can consume int8 directly — no dynamic-quantization pass — and fold
(img_scale x w_scale) into the GEMM epilogue.

Measurement: relay-cost-canceling chained harness (scripts/_bench_util.py,
mode='cancel'). All device buffers are jit arguments (never closures).

Candidates at M = 147456 (B=4096 x 36 objs), K = 2048:
  - bf16 [M,K]@[K,K] GEMM                      (the current fast config)
  - int8 [M,K]@[K,K] -> int32 GEMM, epilogue dequant, bf16 activation
    dynamically requantized per step (the requant pass costs HBM bandwidth)
  - int8-fed: activation already int8 (the int8-feed case) — only the GEMM
    + epilogue dequant+requant are paid
  - the rectangular flagship shape [M, 2048]@[2048, 1024]

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_int8.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _bench_util import chained_ms

M, K = 4096 * 36, 2048
REPS = 8


def bench(step, carry, args, name="", flops=None):
    ms = chained_ms(step, carry, args, reps=REPS, mode="cancel")
    rate = f"  ({flops / (ms / 1e3) / 1e12:6.1f} TF/s)" if flops else ""
    print(f"{name:52s} {ms:8.2f} ms{rate}", flush=True)
    return ms


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    flops = 2 * M * K * K

    x = jax.device_put(
        (rng.standard_normal((M, K), dtype=np.float32) * 0.1)
        .astype(jnp.bfloat16))
    w_bf = jax.device_put(
        (rng.standard_normal((K, K), dtype=np.float32) * 0.02)
        .astype(jnp.bfloat16))
    wq = jax.device_put(rng.integers(-127, 128, (K, K), dtype=np.int8))
    w_scale = jax.device_put(
        np.full((K,), 2e-4, np.float32).astype(jnp.bfloat16))

    def norm(o):
        o = o.astype(jnp.float32)
        return (o * jax.lax.rsqrt(jnp.mean(o * o) + 1e-6)).astype(jnp.bfloat16)

    # bf16 baseline
    bench(lambda c, w: norm(jnp.dot(c, w)), x, (w_bf,),
          name="bf16 [M,K]@[K,K]", flops=flops)

    # int8 path, bf16 carry re-quantized per step with a fixed scale
    def int8_static(c, wq, ws):
        cq = jnp.clip(jnp.round(c.astype(jnp.float32) * 127.0), -127, 127
                      ).astype(jnp.int8)
        acc = jax.lax.dot_general(cq, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return norm(acc.astype(jnp.bfloat16) * ws / 127.0)
    bench(int8_static, x, (wq, w_scale),
          name="int8 [M,K]@[K,K] + row requant + epilogue dequant",
          flops=flops)

    # int8-fed: the carry itself is int8 (the int8-feed case)
    xq = jax.device_put(rng.integers(-127, 128, (M, K), dtype=np.int8))
    x_scale = jax.device_put(
        np.full((M, 1), 1e-2, np.float32).astype(jnp.bfloat16))

    def int8_fed_step(c, wq, ws, xs):
        acc = jax.lax.dot_general(c, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        o = (acc.astype(jnp.bfloat16) * ws) * xs
        return jnp.clip(jnp.round(o.astype(jnp.float32)), -127, 127
                        ).astype(jnp.int8)
    bench(int8_fed_step, xq, (wq, w_scale, x_scale),
          name="int8-fed [M,K]@[K,K] + epilogue dequant+requant",
          flops=flops)

    # rectangular flagship shape [M, 2048] @ [2048, 1024]
    N2 = 1024
    flops2 = 2 * M * K * N2
    wq2 = jax.device_put(rng.integers(-127, 128, (K, N2), dtype=np.int8))
    w2_bf = jax.device_put(
        (rng.standard_normal((K, N2), dtype=np.float32) * 0.02)
        .astype(jnp.bfloat16))
    up_bf = jax.device_put(
        (rng.standard_normal((N2, K), dtype=np.float32) * 0.02)
        .astype(jnp.bfloat16))
    upq = jax.device_put(rng.integers(-127, 128, (N2, K), dtype=np.int8))

    def rect_bf16(c, w, up):
        return norm(jnp.dot(jnp.dot(c, w), up))
    bench(rect_bf16, x, (w2_bf, up_bf),
          name="bf16 [M,2048]@[2048,1024] (+up)", flops=flops2 * 2)

    def rect_int8(c, wq2, upq):
        cq = jnp.clip(jnp.round(c.astype(jnp.float32) * 127.0), -127, 127
                      ).astype(jnp.int8)
        a1 = jax.lax.dot_general(cq, wq2, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        a1q = jnp.clip(a1 // 1024, -127, 127).astype(jnp.int8)
        a2 = jax.lax.dot_general(a1q, upq, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        return norm(a2.astype(jnp.bfloat16) * 2e-4)
    bench(rect_int8, x, (wq2, upq),
          name="int8 [M,2048]@[2048,1024] (+up, requant between)",
          flops=flops2 * 2)


if __name__ == "__main__":
    main()
