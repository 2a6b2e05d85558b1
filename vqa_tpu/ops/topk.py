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
