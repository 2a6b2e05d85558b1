"""Top-k-over-vocab variants on the real chip ([12288, 20000] f32, k=3).

The beam trace showed lax.top_k's custom call at 3.7 ms/step; candidate
replacements must beat that *as lowered*, not in theory — gathers in
particular lower badly on TPU. Chained cancel-mode harness.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_topk.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _bench_util import chained_ms

R, V, K, GRP = 12288, 20000, 3, 128
G = -(-V // GRP)
PAD = G * GRP - V


def bench(step, carry, args, name):
    ms = chained_ms(step, carry, args, reps=6, mode="cancel")
    print(f"{name:46s} {ms:8.2f} ms", flush=True)


def feedback(vals, x):
    # data dependency: fold the top value back into the carry cheaply
    return x + (jnp.max(vals) * 0).astype(x.dtype)


def lax_topk(x):
    vals, _ = jax.lax.top_k(x, K)
    return feedback(vals, x)


def two_stage_gather(x):
    xp = jnp.concatenate([x, jnp.full((R, PAD), -1e30, x.dtype)], axis=1)
    xg = xp.reshape(R, G, GRP)
    gmax = jnp.max(xg, axis=2)
    _, gidx = jax.lax.top_k(gmax, K)
    cand = jnp.take_along_axis(xg, gidx[:, :, None], axis=1)
    vals, _ = jax.lax.top_k(cand.reshape(R, K * GRP), K)
    return feedback(vals, x)


def two_stage_onehot(x):
    xp = jnp.concatenate([x, jnp.full((R, PAD), -1e30, x.dtype)], axis=1)
    xg = xp.reshape(R, G, GRP)
    gmax = jnp.max(xg, axis=2)
    _, gidx = jax.lax.top_k(gmax, K)
    onehot = jax.nn.one_hot(gidx, G, dtype=x.dtype)        # [R, K, G]
    cand = jnp.einsum("rkg,rgc->rkc", onehot, xg)
    vals, _ = jax.lax.top_k(cand.reshape(R, K * GRP), K)
    return feedback(vals, x)


def masked_3pass(x):
    # 3 x (max + mask) without argmax/indices
    vals = []
    y = x
    for _ in range(K):
        m = jnp.max(y, axis=1, keepdims=True)
        vals.append(m)
        y = jnp.where(y == m, -1e30, y)
    return feedback(jnp.concatenate(vals, axis=1), x)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((R, V), dtype=np.float32))
    for fn, name in ((lax_topk, "lax.top_k custom call"),
                     (two_stage_gather, "two-stage, take_along_axis"),
                     (two_stage_onehot, "two-stage, one-hot matmul select"),
                     (masked_3pass, "3x max+mask (values only)")):
        bench(lambda c, _fn=fn: _fn(c), x, (), name)


if __name__ == "__main__":
    main()
