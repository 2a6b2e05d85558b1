"""Exact two-stage top-k over wide axes — measured NEGATIVE result on TPU.

Idea: for small k over a wide axis, reduce each row to G = ceil(V/group)
group maxima (one pass), ``top_k`` the maxima, gather the k winning
groups, ``top_k`` the gathered candidates. Exact: if a value v is in the
global top-k but its group is not among the top-k groups by max, then k
groups each contain a value > v — contradiction. (Tie *ordering* can
differ from ``lax.top_k``'s lowest-index rule when equal values span
groups.)

Measured at the beam-decode shape ([12288, 20000] f32, k=3,
scripts/profile_topk.py, relay cost canceled): **lax.top_k 8.6 ms,
two-stage w/ take_along_axis 12.9 ms, w/ one-hot-matmul select 12.1 ms**
— the pad copy + [R, G, group] reduction + gather relayouts cost more
than the custom call saves, so the beam vocab step stays on ``lax.top_k``
(tools/beam.py). Kept as a library op with a parity test: the algebra is
sound and the trade may flip at much larger vocabularies or on other
backends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = jnp.finfo(jnp.float32).min


def topk_wide(x: jax.Array, k: int, group: int = 128):
    """Exact top-k along the last axis of a 2-D array.

    x: [R, V] float; returns (values [R, k], indices [R, k] int32), values
    sorted descending per row. Falls back to ``lax.top_k`` when the width
    does not justify the two-stage pass.
    """
    R, V = x.shape
    G = -(-V // group)
    if G <= k or V <= 4096:
        return jax.lax.top_k(x, k)
    pad = G * group - V
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((R, pad), _NEG, x.dtype)], axis=1)
    xg = x.reshape(R, G, group)
    gmax = jnp.max(xg, axis=2)                             # [R, G]
    _, gidx = jax.lax.top_k(gmax, k)                       # [R, k]
    cand = jnp.take_along_axis(xg, gidx[:, :, None], axis=1)  # [R, k, group]
    vals, ci = jax.lax.top_k(cand.reshape(R, k * group), k)
    g = jnp.take_along_axis(gidx, ci // group, axis=1)
    return vals, (g * group + ci % group).astype(jnp.int32)


def topk_maskloop(x: jax.Array, k: int):
    """Exact top-k via k sequential argmax+mask sweeps — measured NEGATIVE.

    Bit-identical to ``lax.top_k`` including the lowest-index-first tie
    rule: each ``argmax`` picks the lowest index among equal maxima, so
    equal values come out in ascending-index order across passes exactly
    as the custom call orders them. Measured at the beam vocab shape
    ([12288, 20000], k=3, scripts/profile_topk.py, 2026-08-19): the
    values-only max+mask loop runs 6.8 ms vs the custom call's 9.0, but
    WITH indices consumed this loop costs **15.2 ms f32 / 14.5 bf16**
    (vs 9.0/8.6) — the per-pass index-carrying argmax reduce plus [R, 1]
    gathers relayout badly on TPU. Kept as a library op with a tie-order
    parity test; ``jax.lax.approx_max_k`` (recall 0.99: 5.4-5.9 ms f32,
    6.9 bf16) is the measured winner and ships as the beam's opt-in
    ``approx_topk`` path (tools/beam.py).

    Precondition: rows must hold at least k entries strictly greater than
    -inf (masked picks use -inf as the sentinel; a row of fewer finite
    entries can repeat an index where ``lax.top_k`` would not). Beam
    logits are raw GEMM outputs, always finite.

    x: [R, V] float; returns (values [R, k], indices [R, k] int32),
    sorted descending per row.
    """
    iota = jnp.arange(x.shape[-1], dtype=jnp.int32)[None, :]
    neg = jnp.array(-jnp.inf, x.dtype)
    vals, idxs = [], []
    y = x
    for _ in range(k):
        i = jnp.argmax(y, axis=-1).astype(jnp.int32)[..., None]
        vals.append(jnp.take_along_axis(y, i, axis=-1))
        idxs.append(i)
        y = jnp.where(iota == i, neg, y)
    return jnp.concatenate(vals, -1), jnp.concatenate(idxs, -1)
