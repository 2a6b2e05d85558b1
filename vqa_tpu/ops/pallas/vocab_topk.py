"""Fused vocab-head kernel: GEMM + exact running top-k + online logsumexp.

The beam-search hot loop ends every step with ``logits = h @ W + b`` over
the full vocabulary followed by per-row top-k and logsumexp
(`vqa_tpu/tools/beam.py` candidate-shrink; reference loop at
`/root/reference/tools/caption.py:40-130` via generator.py:249-267).
XLA materializes the [rows, V] logits in HBM (0.5 GB at rows = 12288,
V = 20000, bf16), re-reads them for ``top_k`` (a slow multi-pass lane sort
on TPU), and again for the logsumexp.

This kernel streams W in [H, tile_v] chunks (grid inner dim), keeps the
row-block activations VMEM-resident across the sweep (their block index
does not depend on the inner grid dim, so Mosaic fetches them once), and
folds the top-k + logsumexp into the GEMM epilogue:

- running exact top-k: per chunk, k passes of (max, argmax, mask) extract
  the chunk's top-k; a concat + k more passes merge them with the running
  top-k scratch — O(k) VPU sweeps, no sort;
- online logsumexp in the streaming-softmax style: running (m, s) with
  rescale on a new max.

HBM traffic per call drops from ~3 passes over [rows, V] to one pass over
W per row block + the [rows, k] outputs. Returns (values [R, k] f32,
indices [R, k] int32, logsumexp [R] f32) — exactly what the beam step's
log-prob shift needs, bit-comparable to XLA top_k + logsumexp
(tests/test_pallas.py::test_vocab_topk_*).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _topk_rows(x: jax.Array, k: int, col0):
    """Exact top-k along lanes of x [R, C] -> (vals [R, k], idx [R, k]).

    idx are global column ids (col0 = this chunk's first column).
    """
    R, C = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.max(x, axis=1, keepdims=True)                  # [R, 1]
        a = jnp.argmax(x, axis=1)                              # [R]
        vals.append(m)
        idxs.append((a + col0)[:, None])
        x = jnp.where(lane == a[:, None], _NEG, x)
    return jnp.concatenate(vals, axis=1), jnp.concatenate(idxs, axis=1)


def _kernel(h_ref, w_ref, b_ref, vals_ref, idx_ref, lse_ref,
            top_v, top_i, m_s, *, k: int, tile_v: int, vocab: int):
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        top_v[:] = jnp.full_like(top_v, _NEG)
        top_i[:] = jnp.zeros_like(top_i)
        m_s[:] = jnp.concatenate(
            [jnp.full((m_s.shape[0], 1), _NEG, jnp.float32),
             jnp.zeros((m_s.shape[0], 1), jnp.float32)], axis=1)

    logits = jnp.dot(h_ref[:], w_ref[:],
                     preferred_element_type=jnp.float32)
    logits = logits + b_ref[:].astype(jnp.float32)
    # mask the ragged tail of the last chunk (vocab need not divide tile_v)
    col0 = c * tile_v
    lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + col0
    logits = jnp.where(lane < vocab, logits, _NEG)

    # online logsumexp
    m_old = m_s[:, 0:1]
    s_old = m_s[:, 1:2]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=1, keepdims=True))
    s_new = s_old * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True)
    m_s[:] = jnp.concatenate([m_new, s_new], axis=1)

    # merge chunk top-k into the running top-k
    cv, ci = _topk_rows(logits, k, col0)
    merged_v = jnp.concatenate([top_v[:], cv], axis=1)         # [R, 2k]
    merged_i = jnp.concatenate([top_i[:], ci], axis=1)
    lane2k = jax.lax.broadcasted_iota(jnp.int32, merged_v.shape, 1)
    vs, is_ = [], []
    for _ in range(k):
        mx = jnp.max(merged_v, axis=1, keepdims=True)
        am = jnp.argmax(merged_v, axis=1)
        vs.append(mx)
        # lane gather via select+sum (dynamic lane gathers don't lower)
        sel = (lane2k == am[:, None])
        is_.append(jnp.sum(jnp.where(sel, merged_i, 0), axis=1,
                           keepdims=True))
        merged_v = jnp.where(sel, _NEG, merged_v)
    top_v[:] = jnp.concatenate(vs, axis=1)
    top_i[:] = jnp.concatenate(is_, axis=1)

    @pl.when(c == nc - 1)
    def _():
        vals_ref[:] = top_v[:]
        idx_ref[:] = top_i[:]
        lse_ref[:] = m_s[:, 0:1] + jnp.log(m_s[:, 1:2])


@functools.partial(jax.jit,
                   static_argnames=("k", "tile_r", "tile_v", "interpret"))
def vocab_topk_lse(h: jax.Array, w: jax.Array, b: jax.Array, k: int = 3,
                   tile_r: int = 1024, tile_v: int = 1024,
                   interpret: bool = False):
    """h: [R, H], w: [H, V], b: [V] -> (top values [R, k] f32,
    global indices [R, k] int32, logsumexp [R, 1] f32).

    tile budget: the f32 logits block [tile_r, tile_v] plus the ~2 masking
    temps the running-top-k keeps live must fit the 16 MB scoped-VMEM
    stack — tile_r=1024 x tile_v=2048 overflows it (measured 21.6 MB at
    H=1024); 1024 x 1024 fits. W HBM traffic is tile_v-independent (W
    streams once per row block), so shrinking tile_v costs only per-chunk
    merge overhead."""
    R, H = h.shape
    V = w.shape[1]
    tile_r = min(tile_r, R)
    assert R % tile_r == 0, f"rows {R} not divisible by tile {tile_r}"
    nv = pl.cdiv(V, tile_v)
    kernel = functools.partial(_kernel, k=k, tile_v=tile_v, vocab=V)
    vals, idx, lse = pl.pallas_call(
        kernel,
        grid=(R // tile_r, nv),
        in_specs=[
            pl.BlockSpec((tile_r, H), lambda r, c: (r, 0)),
            pl.BlockSpec((H, tile_v), lambda r, c: (0, c)),
            pl.BlockSpec((tile_v,), lambda r, c: (c,)),
        ],
        out_specs=[
            pl.BlockSpec((tile_r, k), lambda r, c: (r, 0)),
            pl.BlockSpec((tile_r, k), lambda r, c: (r, 0)),
            pl.BlockSpec((tile_r, 1), lambda r, c: (r, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, k), jnp.float32),
            jax.ShapeDtypeStruct((R, k), jnp.int32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_r, k), jnp.float32),
            pltpu.VMEM((tile_r, k), jnp.int32),
            pltpu.VMEM((tile_r, 2), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * R * H * V,
            bytes_accessed=R * H * h.dtype.itemsize
            + (R // tile_r) * H * V * w.dtype.itemsize,
            transcendentals=R * V,
        ),
        interpret=interpret,
    )(h, w, b)
    return vals, idx, lse
