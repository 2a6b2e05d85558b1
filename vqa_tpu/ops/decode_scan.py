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

The grad of the hoisted attention v-projection (``d_vp``, [B, objs, H])
still accumulates in-scan: its per-step contribution is gated elementwise
by the attention-dropout mask, which breaks the outer-product structure the
einsum deferral needs.

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
        thresh = min(255, max(1, round(keep * 256)))
        keep_q = thresh / 256.0
        bits = jax.random.bits(key, x.shape, dtype=jnp.uint8)
        return jax.lax.select(bits < jnp.uint8(thresh),
                              x * jnp.asarray(1.0 / keep_q, x.dtype),
                              jnp.zeros_like(x))
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jax.lax.select(mask, x / keep, jnp.zeros_like(x))


def make_butd_caption_scan(*, hidden_dim: int, v_dim: int, dropout: float,
                           att_dropout: float, deterministic: bool,
                           bits8_dropout: bool = True,
                           factored_v: bool = False):
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

    def seg_a(P, h1_in, h2_in, prev_t, v_gates, vp, k_d1, k_att):
        """word RNN -> h1 FC -> attention weights (generator.py decode
        up to the pooling): returns (h1', hq, att [B, objs])."""
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
        joint = _dropout(vp * qp[:, None, :], k_att, p_att)
        lin = P["attention"]["linear"]
        logits = (_mm(joint, _wn_kernel(lin))
                  + lin["b"].astype(joint.dtype))[..., 0]
        return h1, hq, jax.nn.softmax(logits, axis=1)

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
        def body(carry, xs):
            h1, h2 = carry
            prev_t, t = xs
            k1, k2, k3 = keys_for(key, t)
            h1n, hq, att = seg_a(P, h1, h2, prev_t, v_gates, vp, k1, k2)
            att_v = _pool(att, v)
            h2n, feat = seg_b(P, h2, hq, att_v, k3)
            return (h1n, h2n), (h1, h2, att, att_v, feat)

        T = prev_seq.shape[1]
        xs = (jnp.swapaxes(prev_seq, 0, 1), jnp.arange(T))
        _, ys = jax.lax.scan(body, (h1_0, h2_0), xs)
        return ys  # (h1s, h2s, atts, att_vs, feats), all time-major

    def _bwd_common(P, v, vp, v_gates, prev_seq, key,
                    h1s, h2s, atts, att_vs, d_feats):
        """Reverse scan shared by both modes. Returns
        ((dP, d_vp, d_vg, d_prevs, d_h1_0, d_h2_0), v-grads) where v-grads
        is ``dv`` (plain) or ``d_w`` (factored)."""
        prev_tm = jnp.swapaxes(prev_seq, 0, 1)
        T = prev_tm.shape[0]
        if factored_v:
            q8, w = v

        def body(carry, xs):
            d_h1, d_h2, dP, d_vp, d_vg, d_w = carry
            h1_in, h2_in, att_v, prev_t, d_feat, t = xs
            k1, k2, k3 = keys_for(key, t)
            # rebuild step t from the saved carries (same masks: same keys)
            (h1n, hq, att), pb_a = jax.vjp(
                lambda P_, h1_, h2_, pv_, vg_, vp_: seg_a(
                    P_, h1_, h2_, pv_, vg_, vp_, k1, k2),
                P, h1_in, h2_in, prev_t, v_gates, vp)
            _, pb_b = jax.vjp(
                lambda P_, h2_, hq_, av_: seg_b(P_, h2_, hq_, av_, k3),
                P, h2_in, hq, att_v)
            dP_b, d_h2_b, d_hq, g_attv = pb_b((d_h2, d_feat))
            # the only in-scan read of v/q8: d_att for THIS step feeds the
            # sequential d_h chain and cannot be deferred
            if factored_v:
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
            dP_a, d_h1_in, d_h2_a, d_prev, d_vg_t, d_vp_t = pb_a(
                (d_h1, d_hq, d_att))
            dP = jax.tree_util.tree_map(
                lambda a, b, c: a + b + c, dP, dP_a, dP_b)
            carry = (d_h1_in, d_h2_a + d_h2_b, dP,
                     d_vp + d_vp_t, d_vg + d_vg_t, d_w)
            return carry, (g_attv, d_prev)

        zP = jax.tree_util.tree_map(jnp.zeros_like, P)
        z_w = jnp.zeros_like(v[1]) if factored_v else jnp.zeros(())
        init = (jnp.zeros_like(h1s[0]), jnp.zeros_like(h2s[0]), zP,
                jnp.zeros_like(vp), jnp.zeros_like(v_gates), z_w)
        xs = (h1s, h2s, att_vs, prev_tm, d_feats, jnp.arange(T))
        carry_out, (g_attvs, d_prevs) = jax.lax.scan(
            body, init, xs, reverse=True)
        d_h1_0, d_h2_0, dP, d_vp, d_vg, d_w = carry_out
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
            h1s, h2s, atts, att_vs, feats = _fwd(
                P, (q8, w), vp, v_gates, prev_seq, h1_0, h2_0, key)
            return feats, (P, q8, w, vp, v_gates, prev_seq, key,
                           h1s, h2s, atts, att_vs)

        def scan_fn_bwd(res, d_feats):
            (P, q8, w, vp, v_gates, prev_seq, key,
             h1s, h2s, atts, att_vs) = res
            grads, d_w = _bwd_common(P, (q8, w), vp, v_gates, prev_seq, key,
                                     h1s, h2s, atts, att_vs, d_feats)
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
            h1s, h2s, atts, att_vs, feats = _fwd(
                P, v, vp, v_gates, prev_seq, h1_0, h2_0, key)
            return feats, (P, v, vp, v_gates, prev_seq, key,
                           h1s, h2s, atts, att_vs)

        def scan_fn_bwd(res, d_feats):
            P, v, vp, v_gates, prev_seq, key, h1s, h2s, atts, att_vs = res
            grads, dv = _bwd_common(P, v, vp, v_gates, prev_seq, key,
                                    h1s, h2s, atts, att_vs, d_feats)
            dP, d_vp, d_vg, d_prevs, d_h1_0, d_h2_0 = grads
            return (dP, dv, d_vp, d_vg, d_prevs, d_h1_0, d_h2_0, None)

    scan_fn.defvjp(scan_fn_fwd, scan_fn_bwd)
    return scan_fn, reference_fn
