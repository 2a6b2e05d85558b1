"""GRU sequence kernel v2: big batch tiles + per-step double-buffered DMA.

The v1 kernel (gru.py) keeps the whole [T, tile, 3H] input block in VMEM,
which caps the batch tile at 32 rows — a [32, H] x [H, 3H] matmul uses a
quarter of the MXU's sublanes. This version streams one timestep slice
[tile, 3H] at a time from HBM with two rotating buffers (DMA for step t+1
overlaps the step-t compute), so the batch tile can be 256 rows: full MXU
occupancy while VMEM holds only 2 step slices + the resident weight.

VMEM budget (tile 256, bf16): 2 x 1.6 MB xi slices + 6.3 MB weight +
~2 MB live values ~= 11 MB.. The input is transposed
to time-major [T, B, 3H] first (Mosaic requires HBM slice alignment on the
second-to-last dim, so per-step slicing must land on the leading dim).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xi_hbm, wh_hbm, bh_ref, out_ref, xi_buf, wh_vmem, sems, wh_sem,
            *, t_len: int, hidden: int, tile_b: int):
    tile_start = pl.program_id(0) * tile_b

    @pl.when(pl.program_id(0) == 0)
    def _():
        w_dma = pltpu.make_async_copy(wh_hbm, wh_vmem, wh_sem)
        w_dma.start()
        w_dma.wait()

    def step_dma(slot, t):
        # time-major input: Mosaic requires HBM slices aligned on the
        # second-to-last dim, so per-step slicing must land on dim 0
        return pltpu.make_async_copy(
            xi_hbm.at[t, pl.ds(tile_start, tile_b), :],
            xi_buf.at[slot],
            sems.at[slot],
        )

    step_dma(0, 0).start()
    bh = bh_ref[:].astype(jnp.float32)

    def step(t, h):
        slot = t % 2

        @pl.when(t + 1 < t_len)
        def _():
            step_dma((t + 1) % 2, t + 1).start()

        step_dma(slot, t).wait()
        xi = xi_buf[slot].astype(jnp.float32)
        hi = jnp.dot(h.astype(wh_vmem.dtype), wh_vmem[:],
                     preferred_element_type=jnp.float32) + bh
        xr, xz, xn = (xi[:, :hidden], xi[:, hidden:2 * hidden],
                      xi[:, 2 * hidden:])
        hr, hz, hn = (hi[:, :hidden], hi[:, hidden:2 * hidden],
                      hi[:, 2 * hidden:])
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h

    h = jnp.zeros((tile_b, hidden), jnp.float32)
    h = jax.lax.fori_loop(0, t_len, step, h)
    out_ref[:] = h.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def gru_last_state_v2(xi_all, wh, bh, tile_b: int = 256,
                      interpret: bool = False):
    """Last GRU hidden state, streaming variant. xi_all: [B, T, 3H]."""
    B, T, G = xi_all.shape
    H = wh.shape[0]
    assert G == 3 * H
    assert B % tile_b == 0, f"batch {B} not divisible by tile {tile_b}"
    xi_tbh = jnp.swapaxes(xi_all, 0, 1)          # time-major [T, B, 3H]

    kernel = functools.partial(_kernel, t_len=T, hidden=H, tile_b=tile_b)
    out = pl.pallas_call(
        kernel,
        grid=(B // tile_b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # xi: DMA'd per step
            pl.BlockSpec(memory_space=pltpu.HBM),   # wh: DMA'd once
            pl.BlockSpec((G,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile_b, G), xi_all.dtype),
            pltpu.VMEM((H, G), wh.dtype),
            pltpu.SemaphoreType.DMA((2,)),
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
