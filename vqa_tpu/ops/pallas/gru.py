"""GRU sequence kernel: recurrent weights resident in VMEM across all steps.

The question encoder runs a 10-step GRU over the embedded question
(reference modules.py:98-163 via cuDNN). The XLA scan reloads the [H, 3H]
recurrent weight from HBM every step; this kernel DMAs it into a VMEM
scratch ONCE (first grid step) and reuses it for every batch tile and time
step — the weight never moves again for the whole batch.

The input-side projection ``xi = x @ Wi + bi`` for all steps stays an XLA
matmul outside the kernel (one big MXU-friendly GEMM). Kernel inputs:
``xi_all`` [B, T, 3H] and the recurrent params; output: the LAST-step hidden
state [B, H] — exactly what the question encoder consumes (the reference
takes the last padded step's output, modules.py:156-159).

Layout notes (Mosaic constraints):
- xi is passed time-major [T, tile, 3H] so the dynamic per-step index lands
  on the leading, untiled dimension.
- the weight lives in ``pltpu.HBM`` and is copied to
  a single-buffered VMEM scratch via async DMA — Pallas would otherwise
  double-buffer it per grid step and blow the 16 MB VMEM budget.

Gate math matches torch/vqa_tpu.ops.rnn.gru_step (r, z, n order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqa_tpu.ops.rnn import rnn_scan


def gru_last_state_reference(xi_all, wh, bh):
    """Pure-XLA oracle built on rnn_scan (wi/bi already applied in xi_all)."""
    B, T, G = xi_all.shape
    eye = jnp.eye(G, dtype=xi_all.dtype)
    params = {"wi": eye, "bi": jnp.zeros((G,), xi_all.dtype),
              "wh": wh, "bh": bh}
    out = rnn_scan(params, xi_all, "GRU")
    return out[:, -1]


def _kernel(xi_ref, wh_hbm, bh_ref, out_ref, wh_vmem, dma_sem,
            *, t_len: int, hidden: int):
    tile = xi_ref.shape[1]

    # Load the recurrent weight into VMEM once; it persists across grid steps.
    @pl.when(pl.program_id(0) == 0)
    def _():
        dma = pltpu.make_async_copy(wh_hbm, wh_vmem, dma_sem)
        dma.start()
        dma.wait()

    bh = bh_ref[:].astype(jnp.float32)
    w_dtype = wh_vmem.dtype

    def step(t, h):
        xi = xi_ref[t].astype(jnp.float32)                # [tile, 3H]
        # read the weight inside the matmul so Mosaic streams it from the
        # VMEM scratch instead of materializing a 6 MB register value
        hi = jnp.dot(h.astype(w_dtype), wh_vmem[:],
                     preferred_element_type=jnp.float32) + bh
        xr, xz, xn = (xi[:, :hidden], xi[:, hidden:2 * hidden],
                      xi[:, 2 * hidden:])
        hr, hz, hn = (hi[:, :hidden], hi[:, hidden:2 * hidden],
                      hi[:, 2 * hidden:])
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h

    h = jnp.zeros((tile, hidden), jnp.float32)
    h = jax.lax.fori_loop(0, t_len, step, h)
    out_ref[:] = h.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def gru_last_state(xi_all, wh, bh, tile_b: int = 32,
                   interpret: bool = False):
    """Last GRU hidden state. xi_all: [B, T, 3H] (B % tile_b == 0)."""
    B, T, G = xi_all.shape
    H = wh.shape[0]
    assert G == 3 * H
    assert B % tile_b == 0, f"batch {B} not divisible by tile {tile_b}"
    xi_tbh = jnp.swapaxes(xi_all, 0, 1)       # time-major [T, B, 3H]

    kernel = functools.partial(_kernel, t_len=T, hidden=H)
    out = pl.pallas_call(
        kernel,
        grid=(B // tile_b,),
        in_specs=[
            pl.BlockSpec((T, tile_b, G), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),      # wh: DMA'd manually
            pl.BlockSpec((G,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H, G), wh.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * H * G,
            bytes_accessed=B * T * G * xi_all.dtype.itemsize + H * G * 4,
            transcendentals=3 * B * T * H,
        ),
        interpret=interpret,
    )(xi_tbh, wh, bh)
    return out
