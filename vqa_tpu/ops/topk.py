"""Exact two-stage top-k over wide axes (vocab-sized).

``lax.top_k`` lowers to a TPU custom call whose cost grows steeply with
row width: 3.7 ms/step over [12288, 20000] f32 in the beam-decode trace
(PERF.md "Beam decode", scripts/trace_beam.py) — 27% of the whole decode
step. For small k over a wide axis the exact answer needs only one cheap
full pass:

1. reduce the row into G = ceil(V/group) group maxima        (one VPU pass)
2. ``top_k`` over the [R, G] maxima                          (tiny)
3. gather the k winning groups                               ([R, k*group])
4. ``top_k`` over the gathered candidates                    (tiny)

Exactness: if a value v is in the global top-k but its group is not among
the top-k groups by max, then k groups each contain a value > v, so at
least k values exceed v — contradiction. (Tie *ordering* can differ from
``lax.top_k``'s lowest-index rule when equal values span groups; beam
search is insensitive to the order of equal scores.)
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
