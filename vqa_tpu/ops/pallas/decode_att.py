"""Fused decode-step attention kernels with in-kernel dropout PRNG.

The MTL caption-training scan (reference hot loop
`/root/reference/modules/generator.py:66-120`; TPU redesign in
`vqa_tpu/ops/decode_scan.py`) is bandwidth-bound on the attention
dropout mask: XLA's `rng-bit-generator` writes the [B, objs, H] byte mask
to HBM, the joint/logits fusion reads it back, the forward emits it as a
scan residual (dynamic-update-slice), the backward re-reads it
(dynamic-slice + the masked contraction), and the deferred grad-of-vp
t-reduction reads the whole [T, B, objs, H] stack — ~1.0 ms/step of mask
HBM traffic in-scan plus a 1.66 GB post-scan read at the flagship
B=4096, c=12 shape (PERF.md "MTL train step", round-3 trace).

These kernels make the mask *free of HBM entirely*: the TPU hardware PRNG
(`pltpu.prng_seed` / `prng_random_bits`) is seeded per (step, batch-tile)
and the Bernoulli keep-mask is regenerated, bit-identically, wherever it
is needed:

- `decode_att_fwd` — one kernel per scan step: dropout(joint) -> scalar
  logits -> softmax -> pooled feature, reading `vp` and the pooling
  payload exactly once. The [B, objs, H] joint, the mask, and the random
  bits never touch HBM. The attention-linear *bias* is omitted: it adds
  the same scalar to all `objs` logits, so softmax is invariant to it
  (its gradient is handled outside, where it is exactly zero by the
  softmax-grad identity sum_n dl[b, n] = 0).
- `decode_att_bwd` — the reverse-scan body's [B, objs, *]-sized math in
  one kernel: m = g_attv . pool_n, softmax cotangent dl, and the masked
  contraction d_qp_pre = sum_n dl_n * keep_n * vp_n, regenerating keep
  from the same seed.
- `decode_att_dvp` — the deferred grad-of-vp: a (batch-tile, T) grid that
  accumulates sum_t keep_t * (dl_t (x) qp_t) in VMEM and writes the
  [B, objs, H] result once, regenerating each step's mask instead of
  reading the 1.66 GB residual stack.

Mask stream: each (seed, tile) draws `objs` blocks of [tile_b, H/4]
uint32 words in object order; byte j of each word gates the j-th
H/4-lane quarter (`keep = concat_j((word >> 8j) & 255 < thresh)`), so the
keep probability is thresh/256 — the same quantization as
`decode_scan.apply_dropout(bits8=True)` but a different (equally valid)
Bernoulli stream; see the --prng_impl caveat in config.py. All three
kernels use the same draw order, so forward, backward, and the deferred
reduction see identical masks by construction (pinned on real TPU by
scripts/validate_decode_att.py via the `emit_mask` debug output).

For CPU-interpret parity tests (tests/test_pallas.py) every kernel also
accepts an explicit uint8 mask (`explicit_mask`) in place of the PRNG —
the TPU PRNG primitives have no interpret-mode lowering — exercising all
of the non-RNG math against the pure-JAX references below.

Shapes: `vp2` [B, objs*H] and `pool2` [B, objs*D] arrive flattened to 2D
so every per-object access is an aligned lane slice (3D blocks would pad
the 36-object axis to the sublane tile and inflate DMA). Constraints:
B % tile_b == 0, H % 512 == 0 (the H/4 draw must keep 128-lane
alignment), D % 128 == 0; callers fall back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 32  # shared by all three kernels: the PRNG stream is per-tile

_VMEM_BUDGET = 10 << 20  # double-buffered input blocks must fit under this


def pick_tile(B: int, objs: int, H: int, D: int, vp_itemsize: int,
              pool_itemsize: int) -> int:
    """Batch-tile size for one decode-attention configuration.

    The mask stream is seeded per (step, tile), so forward, backward, and
    the deferred-d_vp kernels MUST use the same tile for one training
    step — decode_scan computes this once and threads it through. Sized
    so the two double-buffered row blocks (vp [t, objs*H] + pooling
    payload [t, objs*D]) fit the scoped-VMEM budget; capped at 32 so the
    d_vp kernel's f32 accumulator ([t, objs*H]) stays small.
    """
    per_row = objs * (H * vp_itemsize + D * pool_itemsize) * 2
    for t in (32, 16, 8):
        if B % t == 0 and t * per_row <= _VMEM_BUDGET:
            return t
    return 0  # caller falls back to the XLA path


def _check_tile(B: int, tile_b: int) -> None:
    """Fail loudly on tile misuse: the grid is B // tile_b, so a
    non-dividing tile would silently leave the tail rows uncomputed
    (uninitialized output memory), and tile_b == 0 (pick_tile's fallback
    value) is a caller gating bug, not a shape to lower."""
    if tile_b <= 0 or B % tile_b != 0:
        raise ValueError(
            f"tile_b={tile_b} must be positive and divide B={B}; thread "
            "pick_tile()'s result and gate on it being > 0")


def _keep_quarters(words: jax.Array, thresh: int) -> jax.Array:
    """[R, C/4] uint32 words -> [R, C] bool keep-mask (P = thresh/256).

    Byte j of each word gates the j-th C/4 quarter of the lanes. The
    quarter-block (rather than interleaved) layout keeps every op a full
    [R, C/4] vector op; any fixed bijection bytes->positions yields the
    same Bernoulli law.
    """
    t = jnp.uint32(thresh)
    return jnp.concatenate(
        [((words >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)) < t
         for j in range(4)], axis=1)


def _draw_keep(shape, thresh: int) -> jax.Array:
    r, c = shape
    words = pltpu.bitcast(pltpu.prng_random_bits((r, c // 4)), jnp.uint32)
    return _keep_quarters(words, thresh)


# ---------------------------------------------------------------- forward


def _fwd_kernel(*refs, objs, H, D, att_scale, thresh, factored,
                explicit_mask, emit_mask):
    i = 0
    seed_ref = mask_in = None
    if thresh is not None:
        if explicit_mask:
            mask_in = refs[i]
        else:
            seed_ref = refs[i]
        i += 1
    vp_ref, pool_ref = refs[i], refs[i + 1]
    i += 2
    w_ref = None
    if factored:
        w_ref = refs[i]
        i += 1
    qp_ref, k_ref = refs[i], refs[i + 1]
    att_ref, attv_ref = refs[i + 2], refs[i + 3]
    mask_out = refs[i + 4] if emit_mask else None

    tb = qp_ref.shape[0]
    qp = qp_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)            # [1, H]
    if seed_ref is not None:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    cols = []
    for n in range(objs):
        jn = vp_ref[:, n * H:(n + 1) * H].astype(jnp.float32) * qp
        if thresh is not None:
            if mask_in is not None:
                keep = mask_in[:, n * H:(n + 1) * H] != 0
            else:
                keep = _draw_keep((tb, H), thresh)
            jn = jnp.where(keep, jn * att_scale, 0.0)
            if mask_out is not None:
                mask_out[:, n * H:(n + 1) * H] = keep.astype(jnp.uint8)
        cols.append(jnp.sum(jn * k, axis=1, keepdims=True))
    lg = jnp.concatenate(cols, axis=1)          # [tb, objs]
    lg = lg - jnp.max(lg, axis=1, keepdims=True)
    e = jnp.exp(lg)
    att = e / jnp.sum(e, axis=1, keepdims=True)

    aw = att * w_ref[:].astype(jnp.float32) if factored else att
    acc = jnp.zeros((tb, D), jnp.float32)
    for n in range(objs):
        acc = acc + aw[:, n:n + 1] * pool_ref[:, n * D:(n + 1) * D].astype(
            jnp.float32)
    att_ref[:] = att.astype(att_ref.dtype)
    attv_ref[:] = acc.astype(attv_ref.dtype)


def decode_att_fwd(vp2, pool2, w, qp, k, seed, *, objs: int,
                   att_scale: float, thresh, tile_b: int = TILE_B,
                   interpret: bool = False, explicit_mask=None,
                   emit_mask: bool = False):
    """One decode step's attention tail + pooling.

    vp2 [B, objs*H]; pool2 [B, objs*D] (int8 payload when `w` is given,
    else the dense features); w [B, objs] or None; qp [B, H];
    k [1, H] weight-normed linear kernel; seed i32[1] (ignored when
    `explicit_mask` [B, objs*H] uint8 is given or thresh is None).
    Returns (att [B, objs], att_v [B, D]) in qp.dtype — plus the uint8
    keep-mask [B, objs*H] when emit_mask (TPU stream validation).
    """
    B = qp.shape[0]
    H = qp.shape[1]
    D = pool2.shape[1] // objs
    factored = w is not None
    _check_tile(B, tile_b)
    if emit_mask and thresh is None:
        raise ValueError(
            "emit_mask=True with thresh=None: the kernel's dropout branch "
            "never runs, so the mask output would be uninitialized memory")
    grid = (B // tile_b,)

    row = lambda blk: pl.BlockSpec(blk, lambda i: (i, 0))
    in_specs, args = [], []
    if thresh is not None:
        if explicit_mask is not None:
            in_specs.append(row((tile_b, objs * H)))
            args.append(explicit_mask)
        else:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            args.append(seed)
    in_specs += [row((tile_b, objs * H)), row((tile_b, objs * D))]
    args += [vp2, pool2]
    if factored:
        in_specs.append(row((tile_b, objs)))
        args.append(w)
    in_specs += [row((tile_b, H)),
                 pl.BlockSpec((1, H), lambda i: (0, 0))]
    args += [qp, k]

    out_shape = [jax.ShapeDtypeStruct((B, objs), qp.dtype),
                 jax.ShapeDtypeStruct((B, D), qp.dtype)]
    out_specs = [row((tile_b, objs)), row((tile_b, D))]
    if emit_mask:
        out_shape.append(jax.ShapeDtypeStruct((B, objs * H), jnp.uint8))
        out_specs.append(row((tile_b, objs * H)))

    kern = functools.partial(
        _fwd_kernel, objs=objs, H=H, D=D, att_scale=float(att_scale),
        thresh=thresh, factored=factored,
        explicit_mask=explicit_mask is not None, emit_mask=emit_mask)
    out = pl.pallas_call(kern, grid=grid, in_specs=in_specs,
                         out_specs=out_specs, out_shape=out_shape,
                         interpret=interpret)(*args)
    return tuple(out)


def fwd_reference(vp, pool, w, qp, k, mask, *, att_scale: float):
    """Pure-JAX mirror of decode_att_fwd (f32 math, explicit mask).

    vp [B, objs, H]; pool [B, objs, D]; w [B, objs] or None; qp [B, H];
    k [1, H]; mask [B, objs, H] (bool/uint8) or None.
    """
    joint = vp.astype(jnp.float32) * qp.astype(jnp.float32)[:, None, :]
    if mask is not None:
        joint = jnp.where(mask != 0, joint * att_scale, 0.0)
    logits = jnp.einsum("bnh,h->bn", joint, k[0].astype(jnp.float32))
    att = jax.nn.softmax(logits, axis=1)
    aw = att * w.astype(jnp.float32) if w is not None else att
    att_v = jnp.einsum("bn,bnd->bd", aw, pool.astype(jnp.float32))
    return att.astype(qp.dtype), att_v.astype(qp.dtype)


# --------------------------------------------------------------- backward


def _bwd_kernel(*refs, objs, H, D, thresh, factored, explicit_mask):
    i = 0
    seed_ref = mask_in = None
    if thresh is not None:
        if explicit_mask:
            mask_in = refs[i]
        else:
            seed_ref = refs[i]
        i += 1
    vp_ref, pool_ref = refs[i], refs[i + 1]
    i += 2
    w_ref = None
    if factored:
        w_ref = refs[i]
        i += 1
    att_ref, gav_ref = refs[i], refs[i + 1]
    dqp_ref, m_ref, dl_ref = refs[i + 2], refs[i + 3], refs[i + 4]

    tb = att_ref.shape[0]
    g = gav_ref[:].astype(jnp.float32)           # [tb, D]
    cols = []
    for n in range(objs):
        cols.append(jnp.sum(
            g * pool_ref[:, n * D:(n + 1) * D].astype(jnp.float32),
            axis=1, keepdims=True))
    m = jnp.concatenate(cols, axis=1)            # [tb, objs]
    att = att_ref[:].astype(jnp.float32)
    d_att = m * w_ref[:].astype(jnp.float32) if factored else m
    dl = att * (d_att - jnp.sum(att * d_att, axis=1, keepdims=True))

    if seed_ref is not None:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    acc = jnp.zeros((tb, H), jnp.float32)
    for n in range(objs):
        vpn = vp_ref[:, n * H:(n + 1) * H].astype(jnp.float32)
        if thresh is not None:
            if mask_in is not None:
                keep = mask_in[:, n * H:(n + 1) * H] != 0
            else:
                keep = _draw_keep((tb, H), thresh)
            vpn = jnp.where(keep, vpn, 0.0)
        acc = acc + dl[:, n:n + 1] * vpn
    dqp_ref[:] = acc.astype(dqp_ref.dtype)
    m_ref[:] = m.astype(m_ref.dtype)
    dl_ref[:] = dl.astype(dl_ref.dtype)


def decode_att_bwd(vp2, pool2, w, att, g_attv, seed, *, objs: int,
                   thresh, tile_b: int = TILE_B, interpret: bool = False,
                   explicit_mask=None):
    """Reverse-scan body: (d_qp_pre [B, H], m [B, objs], dl [B, objs]).

    d_qp_pre is PRE the (att_scale * k) elementwise factor (applied by the
    caller, as in decode_scan._bwd_common); m is the pooled-feature
    cotangent's inner product (d_att = m * w, d_w = att * m); dl is the
    softmax cotangent (feeds the deferred d_vp and d_b = sum dl ~ 0).
    """
    B, H = vp2.shape[0], vp2.shape[1] // objs
    D = pool2.shape[1] // objs
    factored = w is not None
    _check_tile(B, tile_b)
    grid = (B // tile_b,)
    row = lambda blk: pl.BlockSpec(blk, lambda i: (i, 0))

    in_specs, args = [], []
    if thresh is not None:
        if explicit_mask is not None:
            in_specs.append(row((tile_b, objs * H)))
            args.append(explicit_mask)
        else:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            args.append(seed)
    in_specs += [row((tile_b, objs * H)), row((tile_b, objs * D))]
    args += [vp2, pool2]
    if factored:
        in_specs.append(row((tile_b, objs)))
        args.append(w)
    in_specs += [row((tile_b, objs)), row((tile_b, D))]
    args += [att, g_attv]

    out_shape = [jax.ShapeDtypeStruct((B, H), att.dtype),
                 jax.ShapeDtypeStruct((B, objs), att.dtype),
                 jax.ShapeDtypeStruct((B, objs), att.dtype)]
    out_specs = [row((tile_b, H)), row((tile_b, objs)),
                 row((tile_b, objs))]
    kern = functools.partial(
        _bwd_kernel, objs=objs, H=H, D=D, thresh=thresh, factored=factored,
        explicit_mask=explicit_mask is not None)
    return tuple(pl.pallas_call(kern, grid=grid, in_specs=in_specs,
                                out_specs=out_specs, out_shape=out_shape,
                                interpret=interpret)(*args))


def bwd_reference(vp, pool, w, att, g_attv, mask):
    """Pure-JAX mirror of decode_att_bwd (f32 math, explicit mask)."""
    g = g_attv.astype(jnp.float32)
    m = jnp.einsum("bd,bnd->bn", g, pool.astype(jnp.float32))
    att = att.astype(jnp.float32)
    d_att = m * w.astype(jnp.float32) if w is not None else m
    dl = att * (d_att - jnp.sum(att * d_att, axis=1, keepdims=True))
    mvp = vp.astype(jnp.float32)
    if mask is not None:
        mvp = jnp.where(mask != 0, mvp, 0.0)
    d_qp_pre = jnp.einsum("bn,bnh->bh", dl, mvp)
    return (d_qp_pre.astype(g_attv.dtype), m.astype(g_attv.dtype),
            dl.astype(g_attv.dtype))


# ---------------------------------------------------- deferred grad-of-vp


def _dvp_kernel(*refs, T, objs, H, att_scale, thresh, explicit_mask):
    i = 0
    seeds_ref = mask_in = None
    if thresh is not None:
        if explicit_mask:
            mask_in = refs[i]
        else:
            seeds_ref = refs[i]
        i += 1
    dl_ref, qp_ref, k_ref, out_ref, acc_ref = refs[i:i + 5]

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dl = dl_ref[0].astype(jnp.float32)           # [tb, objs]
    qp = qp_ref[0].astype(jnp.float32)           # [tb, H]
    tb = qp.shape[0]
    if seeds_ref is not None:
        pltpu.prng_seed(seeds_ref[t], pl.program_id(0))
    for n in range(objs):
        contrib = dl[:, n:n + 1] * qp
        if thresh is not None:
            if mask_in is not None:
                keep = mask_in[0, :, n * H:(n + 1) * H] != 0
            else:
                keep = _draw_keep((tb, H), thresh)
            contrib = jnp.where(keep, contrib, 0.0)
        acc_ref[:, n * H:(n + 1) * H] += contrib

    @pl.when(t == T - 1)
    def _():
        # k applies per H-lane within every object block of the flat axis
        kf = jnp.tile(att_scale * k_ref[:].astype(jnp.float32), (1, objs))
        out_ref[:] = (acc_ref[:] * kf).astype(out_ref.dtype)


def decode_att_dvp(dls, qps, k, seeds, *, objs: int, att_scale: float,
                   thresh, out_dtype, tile_b: int = TILE_B,
                   interpret: bool = False, explicit_masks=None):
    """Deferred grad-of-vp: sum_t keep_t * (dl_t (x) qp_t) * (scale * k).

    dls [T, B, objs]; qps [T, B, H]; k [1, H]; seeds i32[T] (the same
    per-step seeds the forward used). Returns d_vp [B, objs*H] in
    `out_dtype`. `explicit_masks` [T, B, objs*H] uint8 replaces the PRNG
    for interpret-mode tests.
    """
    T, B, _ = dls.shape
    H = qps.shape[2]
    _check_tile(B, tile_b)
    grid = (B // tile_b, T)     # t innermost: VMEM accumulation over steps

    in_specs, args = [], []
    if thresh is not None:
        if explicit_masks is not None:
            in_specs.append(pl.BlockSpec((1, tile_b, objs * H),
                                         lambda i, t: (t, i, 0)))
            args.append(explicit_masks)
        else:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            args.append(seeds)
    in_specs += [pl.BlockSpec((1, tile_b, objs), lambda i, t: (t, i, 0)),
                 pl.BlockSpec((1, tile_b, H), lambda i, t: (t, i, 0)),
                 pl.BlockSpec((1, H), lambda i, t: (0, 0))]
    args += [dls, qps, k]

    kern = functools.partial(
        _dvp_kernel, T=T, objs=objs, H=H, att_scale=float(att_scale),
        thresh=thresh, explicit_mask=explicit_masks is not None)
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_b, objs * H), lambda i, t: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, objs * H), out_dtype),
        scratch_shapes=[pltpu.VMEM((tile_b, objs * H), jnp.float32)],
        interpret=interpret)(*args)


def dvp_reference(dls, qps, k, masks, *, att_scale: float, out_dtype):
    """Pure-JAX mirror of decode_att_dvp (explicit masks [T,B,objs,H])."""
    prod = (dls.astype(jnp.float32)[:, :, :, None]
            * qps.astype(jnp.float32)[:, :, None, :])
    if masks is not None:
        prod = jnp.where(masks != 0, prod, 0.0)
    out = prod.sum(0) * (att_scale * k[0].astype(jnp.float32))
    return out.astype(out_dtype)


def supported(B: int, objs: int, H: int, D: int) -> bool:
    """Shape eligibility shared by decode_scan's pallas_att gate."""
    return (B % 8 == 0 and H % 512 == 0 and D % 128 == 0 and objs >= 2)
