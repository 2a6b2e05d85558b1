"""GRU sequence kernel v3: input projection folded into the kernel.

v2 (gru_v2.py) consumes precomputed gate pre-activations ``xi = x @ Wi + bi``
— XLA writes the [B, T, 3H] tensor (1 GB at B=16k bf16) to HBM, transposes
it time-major, and the kernel reads it back. v3 moves the input GEMM inside
the kernel: it streams the raw *embeddings* [T, B, E] (E=300: ~10x smaller),
keeps both weight matrices (Wi [E, 3H] and Wh [H, 3H]) resident in VMEM, and
computes ``xi`` per step on the MXU. Same math, ~3 GB less HBM traffic per
batch.

VMEM budget (tile 256, bf16, E=300, H=1024): 2 x 0.16 MB emb slices +
Wi 1.8 MB + Wh 6.3 MB + live values ~2 MB ~= 10.5 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(emb_hbm, wi_hbm, bi_ref, wh_hbm, bh_ref, out_ref,
            emb_buf, wi_vmem, wh_vmem, sems, w_sems,
            *, t_len: int, hidden: int, tile_b: int):
    tile_start = pl.program_id(0) * tile_b

    @pl.when(pl.program_id(0) == 0)
    def _():
        wi_dma = pltpu.make_async_copy(wi_hbm, wi_vmem, w_sems.at[0])
        wh_dma = pltpu.make_async_copy(wh_hbm, wh_vmem, w_sems.at[1])
        wi_dma.start()
        wh_dma.start()
        wi_dma.wait()
        wh_dma.wait()

    def step_dma(slot, t):
        return pltpu.make_async_copy(
            emb_hbm.at[t, pl.ds(tile_start, tile_b), :],
            emb_buf.at[slot],
            sems.at[slot],
        )

    step_dma(0, 0).start()
    bi = bi_ref[:].astype(jnp.float32)
    bh = bh_ref[:].astype(jnp.float32)

    def step(t, h):
        slot = t % 2

        @pl.when(t + 1 < t_len)
        def _():
            step_dma((t + 1) % 2, t + 1).start()

        step_dma(slot, t).wait()
        xi = jnp.dot(emb_buf[slot], wi_vmem[:],
                     preferred_element_type=jnp.float32) + bi
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
def gru_last_state_v3(emb, wi, bi, wh, bh, tile_b: int = 128,
                      interpret: bool = False):
    """Last GRU hidden state from raw inputs. emb: [B, T, E]."""
    B, T, E = emb.shape
    H = wh.shape[0]
    G = wh.shape[1]
    assert G == 3 * H and wi.shape == (E, G)
    assert B % tile_b == 0, f"batch {B} not divisible by tile {tile_b}"
    # Mosaic DMA slices must be lane-aligned: pad E up to a multiple of 128
    # (zero input rows of wi contribute nothing to xi)
    if E % 128 != 0:
        e_pad = (128 - E % 128)
        emb = jnp.pad(emb, ((0, 0), (0, 0), (0, e_pad)))
        wi = jnp.pad(wi, ((0, e_pad), (0, 0)))
        E = E + e_pad
    emb_tbe = jnp.swapaxes(emb, 0, 1)            # time-major [T, B, E]

    kernel = functools.partial(_kernel, t_len=T, hidden=H, tile_b=tile_b)
    out = pl.pallas_call(
        kernel,
        grid=(B // tile_b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # emb: DMA'd per step
            pl.BlockSpec(memory_space=pltpu.HBM),   # wi: DMA'd once
            pl.BlockSpec((G,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # wh: DMA'd once
            pl.BlockSpec((G,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile_b, E), emb.dtype),
            pltpu.VMEM((E, G), wi.dtype),
            pltpu.VMEM((H, G), wh.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (E + H) * G,
            bytes_accessed=B * T * E * emb.dtype.itemsize + (E + H) * G * 4,
            transcendentals=3 * B * T * H,
        ),
        interpret=interpret,
    )(emb_tbe, wi, bi, wh, bh)
    return out
