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


def approx_95(x):
    vals, _ = jax.lax.approx_max_k(x, K, recall_target=0.95)
    return feedback(vals, x)


def approx_99(x):
    vals, _ = jax.lax.approx_max_k(x, K, recall_target=0.99)
    return feedback(vals, x)


def bf16_select(x):
    # exact-modulo-bf16-ties: select indices on a bf16 copy (half the sort
    # bandwidth), gather the f32 values for the scores
    _, idx = jax.lax.top_k(x.astype(jnp.bfloat16), K)
    vals = jnp.take_along_axis(x, idx, axis=1)
    return feedback(vals, x)


def approx_99_both(x):
    # both outputs consumed (beam needs vals AND word ids) — guard against
    # XLA DCE-ing the index side in the values-only row
    vals, idx = jax.lax.approx_max_k(x, K, recall_target=0.99)
    return feedback(vals + idx.astype(x.dtype) * 0, x)


def lax_topk_both(x):
    vals, idx = jax.lax.top_k(x, K)
    return feedback(vals + idx.astype(x.dtype) * 0, x)


def approx_99_f32gather(x):
    _, idx = jax.lax.approx_max_k(x, K, recall_target=0.99)
    vals = jnp.take_along_axis(x, idx, axis=1)
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


def approx_99_both_bf16(x):
    xb = x.astype(jnp.bfloat16)
    vals, idx = jax.lax.approx_max_k(xb, K, recall_target=0.99)
    return feedback((vals + idx.astype(xb.dtype) * 0).astype(x.dtype), x)


def lax_topk_both_bf16(x):
    xb = x.astype(jnp.bfloat16)
    vals, idx = jax.lax.top_k(xb, K)
    return feedback((vals + idx.astype(xb.dtype) * 0).astype(x.dtype), x)


def masked_3pass_idx(x):
    # EXACT top-k incl. indices: sequential argmax+mask picks the lowest
    # index first among equal values each pass — identical selection AND
    # order to lax.top_k's tie rule
    vals, idxs = [], []
    iota = jnp.arange(x.shape[1], dtype=jnp.int32)[None, :]
    y = x
    for _ in range(K):
        i = jnp.argmax(y, axis=1).astype(jnp.int32)
        vals.append(jnp.take_along_axis(y, i[:, None], axis=1))
        idxs.append(i[:, None])
        y = jnp.where(iota == i[:, None], -jnp.inf, y)
    vals = jnp.concatenate(vals, axis=1)
    idx = jnp.concatenate(idxs, axis=1)
    return feedback(vals + idx.astype(x.dtype) * 0, x)


def masked_3pass_idx_bf16(x):
    xb = x.astype(jnp.bfloat16)
    vals, idxs = [], []
    iota = jnp.arange(x.shape[1], dtype=jnp.int32)[None, :]
    y = xb
    for _ in range(K):
        i = jnp.argmax(y, axis=1).astype(jnp.int32)
        vals.append(jnp.take_along_axis(y, i[:, None], axis=1))
        idxs.append(i[:, None])
        y = jnp.where(iota == i[:, None], jnp.bfloat16(-jnp.inf), y)
    vals = jnp.concatenate(vals, axis=1).astype(x.dtype)
    idx = jnp.concatenate(idxs, axis=1)
    return feedback(vals + idx.astype(x.dtype) * 0, x)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((R, V), dtype=np.float32))
    for fn, name in ((lax_topk, "lax.top_k custom call"),
                     (two_stage_gather, "two-stage, take_along_axis"),
                     (two_stage_onehot, "two-stage, one-hot matmul select"),
                     (masked_3pass, "3x max+mask (values only)"),
                     (approx_95, "approx_max_k recall=0.95"),
                     (approx_99, "approx_max_k recall=0.99"),
                     (approx_99_both, "approx_max_k .99, vals+idx used"),
                     (lax_topk_both, "lax.top_k, vals+idx used"),
                     (approx_99_both_bf16, "approx .99 bf16, vals+idx"),
                     (lax_topk_both_bf16, "lax.top_k bf16, vals+idx"),
                     (approx_99_f32gather, "approx_max_k .99 + f32 gather"),
                     (bf16_select, "bf16 top_k select + f32 gather"),
                     (masked_3pass_idx, "3x argmax+mask, exact w/ idx"),
                     (masked_3pass_idx_bf16, "3x argmax+mask bf16, w/ idx")):
        bench(lambda c, _fn=fn: _fn(c), x, (), name)


if __name__ == "__main__":
    main()
