"""Custom-VJP teacher-forcing scan for the BUTD caption decoder.

The MTL training hot path (reference hot loop
`/root/reference/modules/generator.py:66-120`) is a c_len-1-step sequential
scan over the two-cell Up-Down decoder. Under plain autodiff (nn.scan +
remat), the backward pass accumulates the cotangents of the scan-invariant
visual tensors once per step: grad-of-``v`` is a [B, objs, v_dim]
read-modify-write every iteration (~56 ms of the 425 ms B=4096 step — the
single largest trace line, PERF.md "MTL train step"), and the remat body
re-reads ``v`` to rebuild the attention pooling.

This module hand-structures the backward instead (``jax.custom_vjp``):

- the forward ``lax.scan`` saves only small per-step residuals — the two
  [B, H] carries, the [B, objs] attention weights, and the [B, v_dim]
  pooled features;
- the backward runs a reverse ``lax.scan`` whose body rebuilds one step
  from those residuals (two segment VJPs via ``jax.vjp`` — exact same math,
  including dropout masks regenerated from the same fold_in keys) and
  touches ``v`` exactly once (the d_att matvec);
- the expensive grad-of-``v`` accumulation is *deferred*: the per-step
  pooled-feature cotangents ``g_attv`` are stacked as scan outputs and the
  whole contribution collapses to ONE post-scan einsum
  ``dv = einsum('tbn,tbd->bnd', att, g_attv)`` — an MXU contraction
  replacing T bandwidth-bound [B, objs, v_dim] select-adds.

The grad of the hoisted attention v-projection (``d_vp``, [B, objs, H]) is
*also* deferred (round 3, second pass): the attention-dropout mask gates its
per-step contribution elementwise, which breaks the outer-product structure
a plain einsum deferral needs — so the forward emits the boolean keep-mask
as a scan output ([T, B, objs, H] bytes, ~1.7 GB at the flagship B=4096
c=12 shape) and the whole accumulation collapses to ONE post-scan fused
reduce ``sum_t where(mask_t, d_logits_t ⊗ qp_t, 0) * (scale*k)`` — XLA
fuses the mask/broadcast producers into the t-reduction, so the [T, B,
objs, H] product never materializes. The backward scan body no longer
re-runs the attention tail through ``jax.vjp`` either: with the mask and
softmax weights saved, the only [B, objs, H]-sized backward work left
in-scan is one masked contraction ``d_qp_pre = einsum('bn,bnh->bh', dl,
where(mask, vp, 0))`` which simultaneously yields d_qp (x k), the linear
kernel grad (x qp, summed over b), and — deferred — d_vp.

Supported shape: BUTDDecoder + GRU cells + MultiplyAttention ('new') — the
flagship MTL configuration. generator.py falls back to the stock nn.scan
path otherwise. Dropout uses per-step ``fold_in`` keys (a different — but
equally valid — random stream than nn.scan's ``split_rngs``; the same
caveat as --prng_impl, see config.py).

``factored_v`` mode (int8 feed): the decoder's visual input is
``v = w[:, :, None] * q8`` with ``q8`` the int8 feature payload and
``w = v_att * img_scale`` the [B, objs] float weights (encoder attention x
dequant scale). Passing the factors instead of the product makes the scan
TPU-lean twice over:

- the per-step pooling/backward einsums read the int8 payload (half the
  HBM bytes of a bf16 ``v``) with the weights folded into the [B, objs]
  side — the dequantized [B, objs, v_dim] tensor never exists on this
  path;
- grad-of-``v`` disappears entirely: the cotangent the encoder needs is
  ``d_w[b, n] = sum_t att_t[b, n] * (g_attv_t . q8[b, n, :])`` — a [B,
  objs] accumulate whose inner product is the SAME read the sequential
  ``d_att`` already performs, so the post-scan [B, objs, v_dim] dv einsum
  (and its consumers) vanish. ``q8`` itself is data (float0 cotangent).

Parity: tests/test_models.py pins (a) fused-vjp loss == stock loss, and
(b) fused-vjp gradients == autodiff gradients of the identical pure
forward under the same dropout masks.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from vqa_tpu.ops.rnn import gru_step


def _wn_kernel(p: Dict[str, jax.Array]) -> jax.Array:
    """Scalar weight-norm kernel (ops/linear.py WNDense semantics)."""
    v = p["v"]
    return (p["g"] * jax.lax.rsqrt(jnp.sum(v * v))) * v


def quantized_keep(keep: float):
    """The 8-bit keep-probability quantization: ``(thresh, scale)``.

    keep is quantized to thresh/256 (thresh in [1, 255]) and survivors are
    scaled by 256/thresh — the SAME quantized value, so the estimator is
    exactly unbiased. This is the single source of the quantization rule:
    ``apply_dropout(bits8=True)``, the emitted ``att_mask`` stream, and the
    Pallas decode-attention kernels (ops/pallas/decode_att.py) must all
    agree on it, or the kernel path's keep law silently drifts from the
    XLA path's survivor scale."""
    thresh = min(255, max(1, round(keep * 256)))
    return thresh, 256.0 / thresh


def apply_dropout(x, key, rate, bits8=True):
    """Inverted dropout with an optional 8-bit-random-word Bernoulli.

    ``bits8``: draw the mask from uint8 random words — the [B, objs, H]
    attention mask is the dominant RNG cost of the MTL step (~20 ms of rbg
    rounds per B=4096 step, PERF.md "MTL train step") and 8-bit draws need
    1/4 the generator rounds of the f32 uniform that
    ``jax.random.bernoulli`` builds on. The keep probability is quantized
    to thresh/256 and the survivor scale uses the SAME quantized value, so
    ``E[dropout(x)] == x`` exactly (unbiased); keep_q is within 1/512 of
    keep. A different — but equally valid — Bernoulli stream (see the
    module docstring's --prng_impl caveat)."""
    if rate == 0.0:
        return x
    keep = 1.0 - rate
    if bits8:
        thresh, scale = quantized_keep(keep)
        bits = jax.random.bits(key, x.shape, dtype=jnp.uint8)
        return jax.lax.select(bits < jnp.uint8(thresh),
                              x * jnp.asarray(scale, x.dtype),
                              jnp.zeros_like(x))
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jax.lax.select(mask, x / keep, jnp.zeros_like(x))


def _step_seeds(key, T: int) -> jax.Array:
    """Per-step int32 PRNG seeds for the decode-attention kernels.

    Derived from the dropout key (so resume/replay semantics match the
    rest of the step) at a fold_in index far outside the [0, T) range the
    per-step dropout keys use. Recomputed identically in forward and
    backward — never a residual."""
    bits = jax.random.bits(jax.random.fold_in(key, 0x5EED0A77), (T,),
                           jnp.uint32)
    return jax.lax.bitcast_convert_type(bits, jnp.int32)


def make_butd_caption_scan(*, hidden_dim: int, v_dim: int, dropout: float,
                           att_dropout: float, deterministic: bool,
                           bits8_dropout: bool = True,
                           factored_v: bool = False,
                           pallas_att: bool = False):
    """Build ``(scan_fn, reference_fn)`` for one decoder configuration.

    Both share the signature
    ``(P, v, vp, v_gates, prev_seq, h1_0, h2_0, key) -> feats [T, B, H]``:

    - ``P``: param dict with ``word_rnn``/``language_rnn`` ({wi, bi, wh,
      bh}), ``h1_fcnet`` ({w, b}), ``attention`` ({W_q: {fc0: {v, g, b}},
      linear: {v, g, b}});
    - ``v`` [B, objs, v_dim] attended visual features; ``vp`` the hoisted
      attention v-projection (``project_v``); ``v_gates`` the hoisted
      word-RNN v_mean input-gate rows (``hoisted_gates``);
    - ``prev_seq`` [B, T, embed] embedded previous tokens; ``key`` a
      dropout PRNG key (ignored when ``deterministic``).

    ``scan_fn`` carries the custom VJP; ``reference_fn`` is the identical
    pure forward under plain autodiff (same masks — used by parity tests).

    ``factored_v=True`` replaces the single ``v`` argument with ``(q8, w)``
    — int8 payload [B, objs, v_dim] + float weights [B, objs], with
    ``v == w[:, :, None] * q8`` (see module docstring): signature
    ``(P, q8, w, vp, v_gates, prev_seq, h1_0, h2_0, key)``.

    ``pallas_att=True`` routes each step's attention tail + pooling (and
    the backward's masked contraction + the deferred grad-of-vp) through
    the fused TPU kernels in ``ops/pallas/decode_att.py``: the attention
    dropout mask is regenerated from the hardware PRNG wherever needed
    and never touches HBM (no rng-op write, no scan residual, no 1.66 GB
    post-scan read). TPU-only (the kernel PRNG has no interpret lowering);
    callers gate on ``decode_att.supported``. The mask stream differs
    from the bits8 jax stream (same quantized keep probability thresh/256;
    the usual --prng_impl caveat).
    """
    H, VD = hidden_dim, v_dim
    p_drop = 0.0 if deterministic else dropout
    p_att = 0.0 if deterministic else att_dropout

    def _dropout(x, key, rate):
        return apply_dropout(x, key, rate, bits8=bits8_dropout)

    def keys_for(key, t):
        return jax.random.split(jax.random.fold_in(key, t), 3)

    def _mm(x, w):
        return jnp.matmul(x, w.astype(x.dtype),
                          preferred_element_type=x.dtype)

    def _precision(dtype):
        # DEFAULT demotes f32 contractions to bf16 passes (MXU semantics —
        # measured 1e-2-scale error vs the stock path's elementwise
        # pooling); f32 inputs ask for HIGHEST to stay full-precision.
        # bf16 inputs keep DEFAULT: one bf16 x bf16 -> f32 MXU pass.
        return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)

    # attention-dropout survivor scale, matching apply_dropout's quantized
    # bits8 semantics (thresh/256 keep probability)
    if p_att == 0.0:
        att_scale = 1.0
    elif bits8_dropout:
        _att_thresh, att_scale = quantized_keep(1.0 - p_att)
    else:
        att_scale = 1.0 / (1.0 - p_att)

    def att_mask(key, shape):
        """Boolean keep-mask for the [B, objs, H] attention joint — drawn
        explicitly (not via apply_dropout) so the forward can EMIT it as a
        scan output: the backward then neither regenerates the bits nor
        re-runs the tail, and grad-of-vp defers to one post-scan reduce."""
        if bits8_dropout:
            return (jax.random.bits(key, shape, dtype=jnp.uint8)
                    < jnp.uint8(_att_thresh))
        return jax.random.bernoulli(key, 1.0 - p_att, shape)

    # fused-kernel path constants: the kernels quantize the keep
    # probability to thresh/256 regardless of bits8_dropout
    if pallas_att:
        from vqa_tpu.ops.pallas import decode_att as _da
        if p_att > 0.0:
            pa_thresh, pa_scale = quantized_keep(1.0 - p_att)
        else:
            pa_thresh, pa_scale = None, 1.0

        def _pa_inputs(v, vp):
            """(vp2 [B, objs*H], pool2 [B, objs*D], w-or-None, tile_b).

            tile_b MUST be identical for the fwd / bwd / d_vp kernels of
            one step (the PRNG mask stream is per-tile): computed once
            here from the shared shapes/dtypes."""
            B, objs = vp.shape[0], vp.shape[1]
            vp2 = vp.reshape(B, objs * vp.shape[2])
            if factored_v:
                q8, w = v
                pool2 = q8.reshape(B, objs * q8.shape[2])
            else:
                pool2, w = v.reshape(B, objs * v.shape[2]), None
            tile = _da.pick_tile(B, objs, vp.shape[2], pool2.shape[1] // objs,
                                 vp.dtype.itemsize, pool2.dtype.itemsize)
            if tile <= 0:
                raise ValueError(
                    "pallas_att=True but decode_att.pick_tile found no "
                    f"batch tile for B={B}, objs={objs}, H={vp.shape[2]}, "
                    f"D={pool2.shape[1] // objs} — gate callers on "
                    "decode_att.supported() AND pick_tile() > 0 (as "
                    "models/generator.py caption_features does)")
            return vp2, pool2, w, tile

    def seg_a1(P, h1_in, h2_in, prev_t, v_gates, k_d1):
        """word RNN -> h1 FC -> projected+ReLU query: the [B, H]-sized
        chain of generator.py decode, up to (excluding) the attention
        joint. Returns (h1', hq, qp)."""
        wr = P["word_rnn"]
        # wi rows: [0:H) h2, [H:H+VD) v_mean (hoisted: v_gates), rest prev
        xi = (_mm(h2_in, wr["wi"][:H]) + _mm(prev_t, wr["wi"][H + VD:])
              + v_gates + wr["bi"].astype(h2_in.dtype))
        hi = _mm(h1_in, wr["wh"]) + wr["bh"].astype(h1_in.dtype)
        h1 = gru_step(h1_in, xi, hi)
        hd = _dropout(h1, k_d1, p_drop)
        fc = P["h1_fcnet"]
        hq = _mm(hd, fc["w"]) + fc["b"].astype(hd.dtype)
        wq = P["attention"]["W_q"]["fc0"]
        qp = jax.nn.relu(_mm(hq, _wn_kernel(wq)) + wq["b"].astype(hq.dtype))
        return h1, hq, qp

    def att_tail(P, qp, vp, mask):
        """attention joint -> dropout (precomputed mask) -> scalar logit
        -> softmax: the [B, objs, H]-sized tail. Returns att [B, objs]."""
        joint = vp * qp[:, None, :]
        if mask is not None:
            joint = jax.lax.select(
                mask, joint * jnp.asarray(att_scale, joint.dtype),
                jnp.zeros_like(joint))
        lin = P["attention"]["linear"]
        logits = (_mm(joint, _wn_kernel(lin))
                  + lin["b"].astype(joint.dtype))[..., 0]
        return jax.nn.softmax(logits, axis=1)

    def seg_b(P, h2_in, hq, att_v, k_d2):
        """language RNN -> dropped pre-logit features."""
        lr = P["language_rnn"]
        x = jnp.concatenate([att_v, hq], axis=1)
        xi = _mm(x, lr["wi"]) + lr["bi"].astype(x.dtype)
        hi = _mm(h2_in, lr["wh"]) + lr["bh"].astype(h2_in.dtype)
        h2 = gru_step(h2_in, xi, hi)
        return h2, _dropout(h2, k_d2, p_drop)

    def _pool(att, v):
        """att_v = einsum(att, v) — factored mode folds the [B, objs]
        weights into the attention side and contracts over the int8
        payload (cast in-register; half the HBM read of a bf16 v)."""
        if factored_v:
            q8, w = v
            aw = att * w
            return jnp.einsum("bn,bnd->bd", aw, q8.astype(aw.dtype),
                              precision=_precision(aw.dtype),
                              preferred_element_type=aw.dtype)
        return jnp.einsum("bn,bnd->bd", att, v,
                          precision=_precision(v.dtype),
                          preferred_element_type=att.dtype)

    def _fwd(P, v, vp, v_gates, prev_seq, h1_0, h2_0, key):
        T = prev_seq.shape[1]

        if pallas_att:
            vp2, pool2, w, pa_tile = _pa_inputs(v, vp)
            k_arr = _wn_kernel(P["attention"]["linear"])[:, 0][None, :]
            seeds = _step_seeds(key, T)

            def body(carry, xs):
                h1, h2 = carry
                prev_t, t, seed_t = xs
                k1, _, k3 = keys_for(key, t)
                h1n, hq, qp = seg_a1(P, h1, h2, prev_t, v_gates, k1)
                att, att_v = _da.decode_att_fwd(
                    vp2, pool2, w, qp, k_arr, seed_t[None],
                    objs=vp.shape[1], att_scale=pa_scale, thresh=pa_thresh,
                    tile_b=pa_tile)
                h2n, feat = seg_b(P, h2, hq, att_v, k3)
                return (h1n, h2n), (h1, h2, att, att_v, feat)

            xs = (jnp.swapaxes(prev_seq, 0, 1), jnp.arange(T), seeds)
            _, ys = jax.lax.scan(body, (h1_0, h2_0), xs)
            return ys + (None,)   # no mask residual: the kernels regenerate

        def body(carry, xs):
            h1, h2 = carry
            prev_t, t = xs
            k1, k2, k3 = keys_for(key, t)
            h1n, hq, qp = seg_a1(P, h1, h2, prev_t, v_gates, k1)
            mask = att_mask(k2, vp.shape) if p_att > 0.0 else None
            att = att_tail(P, qp, vp, mask)
            att_v = _pool(att, v)
            h2n, feat = seg_b(P, h2, hq, att_v, k3)
            ys = (h1, h2, att, att_v, feat)
            if mask is not None:
                ys = ys + (mask,)
            return (h1n, h2n), ys

        xs = (jnp.swapaxes(prev_seq, 0, 1), jnp.arange(T))
        _, ys = jax.lax.scan(body, (h1_0, h2_0), xs)
        if p_att == 0.0:
            ys = ys + (None,)
        # (h1s, h2s, atts, att_vs, feats, masks-or-None), time-major
        return ys

    def _bwd_common(P, v, vp, v_gates, prev_seq, key,
                    h1s, h2s, atts, att_vs, masks, d_feats):
        """Reverse scan shared by both modes. Returns
        ((dP, d_vp, d_vg, d_prevs, d_h1_0, d_h2_0), v-grads) where v-grads
        is ``dv`` (plain) or ``d_w`` (factored)."""
        prev_tm = jnp.swapaxes(prev_seq, 0, 1)
        T = prev_tm.shape[0]
        if factored_v:
            q8, w = v
        lin = P["attention"]["linear"]
        k_lin = _wn_kernel(lin)[:, 0]  # [H], step-invariant
        if pallas_att:
            vp2, pool2, w_pa, pa_tile = _pa_inputs(v, vp)
            seeds = _step_seeds(key, T)   # identical recompute, no residual
            eff_scale = pa_scale
        else:
            eff_scale = att_scale

        def body(carry, xs):
            d_h1, d_h2, dP, d_vg, d_w, d_k, d_b = carry
            if pallas_att:
                h1_in, h2_in, att, att_v, seed_t, prev_t, d_feat, t = xs
                mask = None
            elif masks is not None:
                h1_in, h2_in, att, att_v, mask, prev_t, d_feat, t = xs
            else:
                h1_in, h2_in, att, att_v, prev_t, d_feat, t = xs
                mask = None
            k1, k2, k3 = keys_for(key, t)
            # rebuild the [B, H]-sized chain of step t from the saved
            # carries (same dropout mask: same fold_in key)
            (h1n, hq, qp), pb_a = jax.vjp(
                lambda P_, h1_, h2_, pv_, vg_: seg_a1(
                    P_, h1_, h2_, pv_, vg_, k1),
                P, h1_in, h2_in, prev_t, v_gates)
            _, pb_b = jax.vjp(
                lambda P_, h2_, hq_, av_: seg_b(P_, h2_, hq_, av_, k3),
                P, h2_in, hq, att_v)
            dP_b, d_h2_b, d_hq, g_attv = pb_b((d_h2, d_feat))
            if pallas_att:
                # fused kernel: m = g_attv . pool_n, softmax cotangent dl,
                # masked contraction d_qp_pre — mask regenerated in-kernel
                d_qp_pre, m, dl = _da.decode_att_bwd(
                    vp2, pool2, w_pa, att, g_attv, seed_t[None],
                    objs=vp.shape[1], thresh=pa_thresh, tile_b=pa_tile)
                if factored_v:
                    d_w = d_w + att * m
            # the only in-scan read of v/q8: d_att for THIS step feeds the
            # sequential d_h chain and cannot be deferred
            elif factored_v:
                m = jnp.einsum("bd,bnd->bn", g_attv, q8.astype(g_attv.dtype),
                               precision=_precision(g_attv.dtype),
                               preferred_element_type=g_attv.dtype)
                d_att = m * w
                # d_w rides on the same inner product m — a [B, objs]
                # accumulate in place of the [B, objs, v_dim] dv einsum
                d_w = d_w + att * m
            else:
                d_att = jnp.einsum("bd,bnd->bn", g_attv, v,
                                   precision=_precision(v.dtype),
                                   preferred_element_type=g_attv.dtype)
            if not pallas_att:
                # hand-written attention-tail backward (joint -> dropout ->
                # weight-normed linear -> softmax), from the SAVED att +
                # mask: no [B, objs, H] joint rebuilt, no bits regenerated.
                dl = att * (d_att
                            - jnp.sum(att * d_att, axis=1, keepdims=True))
                mvp = vp if mask is None else jnp.where(
                    mask, vp, jnp.zeros((), vp.dtype))
                # the single [B, objs, H]-sized op left in-scan;
                # simultaneously the source of d_qp (x scale*k), d_k (x qp)
                # and — post-scan, via the stacked (dl, qp) outputs — the
                # deferred d_vp
                d_qp_pre = jnp.einsum("bn,bnh->bh", dl, mvp,
                                      precision=_precision(vp.dtype),
                                      preferred_element_type=dl.dtype)
            d_qp = d_qp_pre * (jnp.asarray(eff_scale, dl.dtype)
                               * k_lin.astype(dl.dtype))
            d_k = d_k + jnp.einsum("bh,bh->h", qp, d_qp_pre,
                                   precision=_precision(vp.dtype),
                                   preferred_element_type=jnp.float32)
            d_b = d_b + jnp.sum(dl, dtype=jnp.float32)
            dP_a, d_h1_in, d_h2_a, d_prev, d_vg_t = pb_a(
                (d_h1, d_hq, d_qp))
            dP = jax.tree_util.tree_map(
                lambda a, b, c: a + b + c, dP, dP_a, dP_b)
            carry = (d_h1_in, d_h2_a + d_h2_b, dP,
                     d_vg + d_vg_t, d_w, d_k, d_b)
            return carry, (g_attv, d_prev, dl, qp)

        zP = jax.tree_util.tree_map(jnp.zeros_like, P)
        z_w = jnp.zeros_like(v[1]) if factored_v else jnp.zeros(())
        init = (jnp.zeros_like(h1s[0]), jnp.zeros_like(h2s[0]), zP,
                jnp.zeros_like(v_gates), z_w,
                jnp.zeros(k_lin.shape, jnp.float32),
                jnp.zeros((), jnp.float32))
        if pallas_att:
            extra = (seeds,)
        elif masks is not None:
            extra = (masks,)
        else:
            extra = ()
        xs = (h1s, h2s, atts, att_vs) + extra + (
            prev_tm, d_feats, jnp.arange(T))
        carry_out, (g_attvs, d_prevs, dls, qps) = jax.lax.scan(
            body, init, xs, reverse=True)
        d_h1_0, d_h2_0, dP, d_vg, d_w, d_k_acc, d_b_acc = carry_out

        # attention-linear param grads, accumulated by hand above (the
        # reverse body never touches them), chained through the weight norm
        d_k_full = (jnp.asarray(eff_scale, jnp.float32)
                    * d_k_acc)[:, None].astype(lin["v"].dtype)
        _, pb_wn = jax.vjp(_wn_kernel, lin)
        (d_lin,) = pb_wn(d_k_full)
        lg = dP["attention"]["linear"]
        dP = {**dP, "attention": {**dP["attention"], "linear": {
            "v": lg["v"] + d_lin["v"], "g": lg["g"] + d_lin["g"],
            "b": lg["b"] + jnp.reshape(d_b_acc, lin["b"].shape
                                       ).astype(lin["b"].dtype)}}}

        # deferred grad-of-vp: T [B, objs, H] select-accumulates -> ONE
        # fused masked t-reduction (mask path) or MXU contraction (no-mask
        # path); the [T, B, objs, H] product never materializes
        if pallas_att:
            # kernel regenerates each step's mask and applies scale*k:
            # nothing mask-sized is ever read from HBM
            d_vp = _da.decode_att_dvp(
                dls, qps, k_lin[None, :], seeds, objs=vp.shape[1],
                att_scale=pa_scale, thresh=pa_thresh, out_dtype=vp.dtype,
                tile_b=pa_tile).reshape(vp.shape)
        else:
            scale_k = (jnp.asarray(att_scale, dls.dtype)
                       * k_lin.astype(dls.dtype))
            if masks is not None:
                prod = dls[:, :, :, None] * qps[:, :, None, :]
                d_vp = jnp.sum(jnp.where(masks, prod,
                                         jnp.zeros((), prod.dtype)), axis=0)
            else:
                d_vp = jnp.einsum("tbn,tbh->bnh", dls, qps,
                                  precision=_precision(vp.dtype),
                                  preferred_element_type=dls.dtype)
            d_vp = (d_vp * scale_k).astype(vp.dtype)

        grads = (dP, d_vp, d_vg, jnp.swapaxes(d_prevs, 0, 1),
                 d_h1_0, d_h2_0)
        if factored_v:
            return grads, d_w
        # deferred grad-of-v: T select-adds -> one MXU contraction
        dv = jnp.einsum("tbn,tbd->bnd", atts, g_attvs,
                        precision=_precision(v.dtype),
                        preferred_element_type=v.dtype)
        return grads, dv

    if factored_v:
        def reference_fn(P, q8, w, vp, v_gates, prev_seq, h1_0, h2_0, key):
            return _fwd(P, (q8, w), vp, v_gates, prev_seq, h1_0, h2_0,
                        key)[4]

        @jax.custom_vjp
        def scan_fn(P, q8, w, vp, v_gates, prev_seq, h1_0, h2_0, key):
            return reference_fn(P, q8, w, vp, v_gates, prev_seq, h1_0, h2_0,
                                key)

        def scan_fn_fwd(P, q8, w, vp, v_gates, prev_seq, h1_0, h2_0, key):
            h1s, h2s, atts, att_vs, feats, masks = _fwd(
                P, (q8, w), vp, v_gates, prev_seq, h1_0, h2_0, key)
            return feats, (P, q8, w, vp, v_gates, prev_seq, key,
                           h1s, h2s, atts, att_vs, masks)

        def scan_fn_bwd(res, d_feats):
            (P, q8, w, vp, v_gates, prev_seq, key,
             h1s, h2s, atts, att_vs, masks) = res
            grads, d_w = _bwd_common(P, (q8, w), vp, v_gates, prev_seq, key,
                                     h1s, h2s, atts, att_vs, masks, d_feats)
            dP, d_vp, d_vg, d_prevs, d_h1_0, d_h2_0 = grads
            d_q8 = np.zeros(q8.shape, dtype=jax.dtypes.float0)  # int data
            return (dP, d_q8, d_w, d_vp, d_vg, d_prevs,
                    d_h1_0, d_h2_0, None)
    else:
        def reference_fn(P, v, vp, v_gates, prev_seq, h1_0, h2_0, key):
            return _fwd(P, v, vp, v_gates, prev_seq, h1_0, h2_0, key)[4]

        @jax.custom_vjp
        def scan_fn(P, v, vp, v_gates, prev_seq, h1_0, h2_0, key):
            return reference_fn(P, v, vp, v_gates, prev_seq, h1_0, h2_0, key)

        def scan_fn_fwd(P, v, vp, v_gates, prev_seq, h1_0, h2_0, key):
            h1s, h2s, atts, att_vs, feats, masks = _fwd(
                P, v, vp, v_gates, prev_seq, h1_0, h2_0, key)
            return feats, (P, v, vp, v_gates, prev_seq, key,
                           h1s, h2s, atts, att_vs, masks)

        def scan_fn_bwd(res, d_feats):
            (P, v, vp, v_gates, prev_seq, key,
             h1s, h2s, atts, att_vs, masks) = res
            grads, dv = _bwd_common(P, v, vp, v_gates, prev_seq, key,
                                    h1s, h2s, atts, att_vs, masks, d_feats)
            dP, d_vp, d_vg, d_prevs, d_h1_0, d_h2_0 = grads
            return (dP, dv, d_vp, d_vg, d_prevs, d_h1_0, d_h2_0, None)

    scan_fn.defvjp(scan_fn_fwd, scan_fn_bwd)
    return scan_fn, reference_fn
