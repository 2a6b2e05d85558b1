"""Pallas kernel parity vs XLA reference implementations (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqa_tpu.ops.pallas.fused_attention import (
    fused_multiply_attention_pool, multiply_attention_pool_reference,
)
from vqa_tpu.ops.pallas.gru import gru_last_state, gru_last_state_reference


def test_fused_attention_matches_reference(rng):
    B, N, Dv, H, Hq = 32, 12, 64, 48, 40
    v = rng.standard_normal((B, N, Dv)).astype(np.float32)
    q = rng.standard_normal((B, Hq)).astype(np.float32)
    wv = (rng.standard_normal((Dv, H)) * 0.05).astype(np.float32)
    bv = rng.standard_normal(H).astype(np.float32) * 0.1
    wq = (rng.standard_normal((Hq, H)) * 0.05).astype(np.float32)
    bq = rng.standard_normal(H).astype(np.float32) * 0.1
    wl = (rng.standard_normal((H, 1)) * 0.1).astype(np.float32)
    bl = rng.standard_normal(1).astype(np.float32) * 0.1

    want_pool, want_att = multiply_attention_pool_reference(
        *map(jnp.asarray, (v, q, wv, bv, wq, bq, wl, bl)))
    got_pool, got_att = fused_multiply_attention_pool(
        *map(jnp.asarray, (v, q, wv, bv, wq, bq, wl, bl)),
        tile_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got_att), np.asarray(want_att),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_pool), np.asarray(want_pool),
                               rtol=1e-4, atol=1e-5)


def test_fused_attention_matches_flax_module(rng):
    """Kernel == the actual MultiplyAttention module + weighted pooling."""
    from vqa_tpu.ops.attention import MultiplyAttention
    B, N, Dv, H = 16, 9, 32, 24
    v = jnp.asarray(rng.standard_normal((B, N, Dv)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    module = MultiplyAttention(hidden_dim=H)
    params = module.init(jax.random.key(0), v, q)["params"]

    def fold_wn(sub):
        vmat = params[sub]["fc0"]["v"]
        g = params[sub]["fc0"]["g"]
        scale = g / np.linalg.norm(np.asarray(vmat))
        return np.asarray(vmat) * scale, np.asarray(params[sub]["fc0"]["b"])

    wv, bv = fold_wn("W_v")
    wq, bq = fold_wn("W_q")
    lv = params["linear"]["v"]
    lg = params["linear"]["g"]
    wl = np.asarray(lv) * (np.asarray(lg) / np.linalg.norm(np.asarray(lv)))
    bl = np.asarray(params["linear"]["b"])

    att_module = module.apply({"params": params}, v, q)      # [B, N, 1]
    want_pool = jnp.sum(att_module * v, axis=1)
    got_pool, got_att = fused_multiply_attention_pool(
        v, q, *map(jnp.asarray, (wv, bv, wq, bq, wl, bl)),
        tile_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got_att),
                               np.asarray(att_module)[:, :, 0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_pool), np.asarray(want_pool),
                               rtol=1e-4, atol=1e-5)


def test_gru_kernel_matches_reference(rng):
    B, T, H = 16, 10, 32
    xi = rng.standard_normal((B, T, 3 * H)).astype(np.float32)
    wh = (rng.standard_normal((H, 3 * H)) * 0.1).astype(np.float32)
    bh = rng.standard_normal(3 * H).astype(np.float32) * 0.1
    want = gru_last_state_reference(jnp.asarray(xi), jnp.asarray(wh),
                                    jnp.asarray(bh))
    got = gru_last_state(jnp.asarray(xi), jnp.asarray(wh), jnp.asarray(bh),
                         tile_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_gru_kernel_matches_torch(rng):
    """End-to-end: xi from torch weights -> kernel == torch GRU last step."""
    import torch
    import torch.nn as tnn
    B, T, in_dim, H = 8, 6, 12, 16
    torch.manual_seed(0)
    ref = tnn.GRU(input_size=in_dim, hidden_size=H, batch_first=True)
    x = rng.standard_normal((B, T, in_dim)).astype(np.float32)
    with torch.no_grad():
        out, _ = ref(torch.from_numpy(x))
    want = out[:, -1].numpy()

    wi = ref.weight_ih_l0.detach().numpy().T
    bi = ref.bias_ih_l0.detach().numpy()
    wh = ref.weight_hh_l0.detach().numpy().T
    bh = ref.bias_hh_l0.detach().numpy()
    xi = x.reshape(-1, in_dim) @ wi + bi
    got = gru_last_state(jnp.asarray(xi.reshape(B, T, 3 * H)),
                         jnp.asarray(wh), jnp.asarray(bh),
                         tile_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_model_with_pallas_gru_matches_default(rng):
    """use_pallas=True (interpret on CPU) == default XLA scan path."""
    from vqa_tpu.models.wrapper import set_model
    kw = dict(encoder_type="base", predictor_type="base", decoder_type="none",
              ntoken=50, v_dim=32, embed_dim=16, hidden_dim=24,
              decoder_hidden_dim=20, ans_dim=13, c_len=8, dropout=0.0,
              att_type="new")
    m_ref = set_model(**kw)
    m_pallas = set_model(**kw, use_pallas=True)
    # the kernel path activates for bf16 activations (inference fast path)
    batch = {
        "img": jnp.asarray(rng.standard_normal((32, 9, 32)).astype(jnp.bfloat16)),
        "q": jnp.asarray(rng.integers(0, 50, (32, 5))),
    }
    params = m_ref.init(jax.random.key(0), batch)["params"]
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    p1, _ = m_ref.apply({"params": params}, batch)
    p2, _ = m_pallas.apply({"params": params}, batch)
    np.testing.assert_allclose(np.asarray(p1, np.float32),
                               np.asarray(p2, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_pallas_gru_fallback_on_odd_batch(rng):
    """Batch not divisible by the tile -> silent fallback to the XLA scan."""
    from vqa_tpu.models.wrapper import set_model
    m = set_model(encoder_type="base", predictor_type="base",
                  decoder_type="none", ntoken=50, v_dim=32, embed_dim=16,
                  hidden_dim=24, decoder_hidden_dim=20, ans_dim=13, c_len=8,
                  dropout=0.0, att_type="new", use_pallas=True)
    batch = {
        "img": jnp.asarray(rng.standard_normal((7, 9, 32)).astype(np.float32)),
        "q": jnp.asarray(rng.integers(0, 50, (7, 5))),
    }
    params = m.init(jax.random.key(0), batch)["params"]
    p, _ = m.apply({"params": params}, batch)
    assert p.shape == (7, 13)


def test_gru_v2_matches_reference(rng):
    from vqa_tpu.ops.pallas.gru_v2 import gru_last_state_v2
    B, T, H = 16, 7, 32
    xi = rng.standard_normal((B, T, 3 * H)).astype(np.float32)
    wh = (rng.standard_normal((H, 3 * H)) * 0.1).astype(np.float32)
    bh = rng.standard_normal(3 * H).astype(np.float32) * 0.1
    want = gru_last_state_reference(jnp.asarray(xi), jnp.asarray(wh),
                                    jnp.asarray(bh))
    got = gru_last_state_v2(jnp.asarray(xi), jnp.asarray(wh),
                            jnp.asarray(bh), tile_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_gru_v3_matches_scan(rng):
    """v3 (input GEMM folded into the kernel) == rnn_scan end to end."""
    from vqa_tpu.ops.pallas.gru_v3 import gru_last_state_v3
    from vqa_tpu.ops.rnn import rnn_scan
    B, T, E, H = 16, 6, 12, 32
    emb = rng.standard_normal((B, T, E)).astype(np.float32)
    wi = (rng.standard_normal((E, 3 * H)) * 0.1).astype(np.float32)
    bi = rng.standard_normal(3 * H).astype(np.float32) * 0.1
    wh = (rng.standard_normal((H, 3 * H)) * 0.1).astype(np.float32)
    bh = rng.standard_normal(3 * H).astype(np.float32) * 0.1
    got = gru_last_state_v3(*map(jnp.asarray, (emb, wi, bi, wh, bh)),
                            tile_b=8, interpret=True)
    params = {"wi": jnp.asarray(wi), "bi": jnp.asarray(bi),
              "wh": jnp.asarray(wh), "bh": jnp.asarray(bh)}
    want = rnn_scan(params, jnp.asarray(emb))[:, -1]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_gcn_chain_fused_matches_xla(rng):
    """Fused graph-local chain == the XLA chain in ops/gcn.py, f32 exact-ish.
    alpha_raw is built the way the module does it (similarity_parts form:
    relu(fc f^T + u_i + w_j))."""
    from vqa_tpu.ops.pallas.gcn_chain import gcn_chain_fused
    from vqa_tpu.ops.gcn import label_bias_sum
    B, N, D, L = 8, 36, 64, 12
    out_self = rng.standard_normal((B, N, D)).astype(np.float32)
    proj = rng.standard_normal((B, N, D)).astype(np.float32)
    graph = rng.integers(0, L, size=(B, N, N)).astype(np.int32)
    fc = rng.standard_normal((B, N, D)).astype(np.float32)
    f = rng.standard_normal((B, N, D)).astype(np.float32)
    u = rng.standard_normal((B, N)).astype(np.float32)
    w = rng.standard_normal((B, N)).astype(np.float32)
    bias = (rng.standard_normal((L, D)) * 0.1).astype(np.float32)

    alpha_raw = np.maximum(
        np.einsum("bid,bjd->bij", fc, f)
        + u[:, :, None] + w[:, None, :], 0.0).astype(np.float32)
    adj = (graph != 0).astype(np.float32)
    out = out_self + jnp.matmul(adj, proj)
    out = out + label_bias_sum(jnp.asarray(graph), jnp.asarray(bias), L)
    a = jnp.matmul(adj, alpha_raw)
    a = jax.nn.softmax(a, axis=1)
    want = jnp.matmul(a, out)

    got = gcn_chain_fused(*map(jnp.asarray, (out_self, proj, alpha_raw,
                                             graph, bias)),
                          num_labels=L, block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_gcn_module_pallas_path_matches_xla(rng):
    """GCN(use_pallas=True) inference == GCN() with identical params; the
    training path (deterministic=False) stays on the differentiable XLA
    chain regardless of the flag."""
    from vqa_tpu.ops.gcn import GCN
    B, N, D = 4, 36, 32
    f = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32) * 0.3)
    g = jnp.asarray(rng.integers(0, 12, size=(B, N, N)).astype(np.int32))
    ref = GCN(out_dim=D, conv_layer=2, conv_type="corr", dropout=0.0)
    fused = GCN(out_dim=D, conv_layer=2, conv_type="corr", dropout=0.0,
                use_pallas=True)
    params = ref.init(jax.random.PRNGKey(0), f, g)
    want = ref.apply(params, f, g, deterministic=True)
    got = fused.apply(params, f, g, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    # gradient path must not touch the kernel (it has no VJP): this
    # differentiates the use_pallas=True module in training mode
    def loss(p):
        rngs = {"dropout": jax.random.PRNGKey(1)}
        return jnp.sum(fused.apply(p, f, g, deterministic=False, rngs=rngs))
    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(grads))


# ---------------------------------------------------------------------------
# Fused decode-attention kernels (ops/pallas/decode_att.py): the explicit-
# mask variants exercise all non-RNG math in interpret mode; the hardware-
# PRNG stream contract is pinned on real TPU by
# scripts/validate_decode_att.py (no interpret lowering for pltpu.prng_*).


def _decode_att_inputs(rng, B=8, objs=5, H=16, D=12, dtype=np.float32,
                       int8_pool=False):
    vp = rng.standard_normal((B, objs, H)).astype(dtype) * 0.3
    if int8_pool:
        pool = rng.integers(-127, 128, (B, objs, D)).astype(np.int8)
    else:
        pool = rng.standard_normal((B, objs, D)).astype(dtype)
    w = rng.standard_normal((B, objs)).astype(dtype) * 0.3
    qp = rng.standard_normal((B, H)).astype(dtype) * 0.3
    k = rng.standard_normal((1, H)).astype(dtype) * 0.3
    mask = (rng.random((B, objs, H)) < 0.8).astype(np.uint8)
    return tuple(map(jnp.asarray, (vp, pool, w, qp, k, mask)))


# the three input regimes the shipping paths feed the kernels: f32
# (parity tests), bf16 dense (the unquantized feed), bf16 activations
# over an int8 pooling payload (the int8 factored feed — always
# factored, the weights carry the dequant scale)
@pytest.mark.parametrize("factored,dtype,int8_pool", [
    (True, np.float32, False), (False, np.float32, False),
    (False, "bfloat16", False), (True, "bfloat16", True),
])
def test_decode_att_fwd_bwd_match_reference(rng, factored, dtype, int8_pool):
    from vqa_tpu.ops.pallas import decode_att as da
    dt = jnp.bfloat16 if dtype == "bfloat16" else np.float32
    vp, pool, w, qp, k, mask = _decode_att_inputs(
        rng, dtype=np.float32, int8_pool=int8_pool)
    if dtype == "bfloat16":
        vp, w, qp, k = (x.astype(dt) for x in (vp, w, qp, k))
        if not int8_pool:
            pool = pool.astype(dt)
    B, objs, H = vp.shape
    D = pool.shape[-1]
    wx = w if factored else None
    scale = 256.0 / 205
    vp2, pool2 = vp.reshape(B, -1), pool.reshape(B, -1)
    m2 = mask.reshape(B, -1)
    # both kernel and reference compute in f32 and cast outputs to
    # qp.dtype, so they agree to the bf16 output rounding
    tol = dict(rtol=1e-2, atol=1e-2) if dtype == "bfloat16" else {}

    att_r, av_r = da.fwd_reference(vp, pool, wx, qp, k, mask,
                                   att_scale=scale)
    att_k, av_k = da.decode_att_fwd(
        vp2, pool2, wx, qp, k, None, objs=objs, att_scale=scale,
        thresh=205, tile_b=4, interpret=True, explicit_mask=m2)
    assert att_k.dtype == qp.dtype and av_k.dtype == qp.dtype
    np.testing.assert_allclose(np.asarray(att_k, np.float32),
                               np.asarray(att_r, np.float32),
                               **(tol or dict(rtol=1e-5, atol=1e-6)))
    np.testing.assert_allclose(np.asarray(av_k, np.float32),
                               np.asarray(av_r, np.float32),
                               **(tol or dict(rtol=1e-4, atol=1e-5)))

    gav = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32)).astype(
        qp.dtype)
    got = da.decode_att_bwd(vp2, pool2, wx, att_r, gav, None, objs=objs,
                            thresh=205, tile_b=4, interpret=True,
                            explicit_mask=m2)
    want = da.bwd_reference(vp, pool, wx, att_r, gav, mask)
    for g, r in zip(got, want):
        assert g.dtype == r.dtype
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r, np.float32),
                                   **(tol or dict(rtol=1e-4, atol=1e-5)))


def test_decode_att_dvp_matches_reference(rng):
    from vqa_tpu.ops.pallas import decode_att as da
    T, B, objs, H = 3, 8, 5, 16
    dls = jnp.asarray(rng.standard_normal((T, B, objs)).astype(np.float32))
    qps = jnp.asarray(rng.standard_normal((T, B, H)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32))
    masks = jnp.asarray(
        (rng.random((T, B, objs, H)) < 0.8).astype(np.uint8))
    scale = 256.0 / 205
    want = da.dvp_reference(dls, qps, k, masks, att_scale=scale,
                            out_dtype=jnp.float32)
    got = da.decode_att_dvp(dls, qps, k, None, objs=objs, att_scale=scale,
                            thresh=205, out_dtype=jnp.float32, tile_b=4,
                            interpret=True,
                            explicit_masks=masks.reshape(T, B, -1))
    np.testing.assert_allclose(np.asarray(got).reshape(B, objs, H),
                               np.asarray(want), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("factored", [True, False])
def test_decode_att_backward_formulas_match_autodiff(rng, factored):
    """The hand-written backward (bwd_reference + single-step
    dvp_reference, the exact math the kernels implement) == jax.vjp of
    fwd_reference with the mask held fixed — proving the decode_scan
    pallas path computes the same cotangents autodiff would."""
    from vqa_tpu.ops.pallas import decode_att as da
    vp, pool, w, qp, k, mask = _decode_att_inputs(rng)
    wx = w if factored else None
    scale = 256.0 / 205
    gav = jnp.asarray(
        rng.standard_normal(pool.shape[::2]).astype(np.float32))

    def f(vp_, qp_, w_):
        att, av = da.fwd_reference(vp_, pool, w_ if factored else None,
                                   qp_, k, mask, att_scale=scale)
        return av, att

    (_, att), pb = jax.vjp(f, vp, qp, w, has_aux=False)
    d_vp_auto, d_qp_auto, d_w_auto = pb((gav, jnp.zeros_like(att)))

    d_qp_pre, m, dl = da.bwd_reference(vp, pool, wx, att, gav, mask)
    d_qp = d_qp_pre * (scale * k[0])
    np.testing.assert_allclose(np.asarray(d_qp), np.asarray(d_qp_auto),
                               rtol=1e-4, atol=1e-5)
    d_vp = da.dvp_reference(dl[None], qp[None], k,
                            mask[None], att_scale=scale,
                            out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(d_vp), np.asarray(d_vp_auto),
                               rtol=1e-4, atol=1e-5)
    if factored:
        np.testing.assert_allclose(np.asarray(att * m),
                                   np.asarray(d_w_auto),
                                   rtol=1e-4, atol=1e-5)


def test_int8_matmul_dequant_matches_xla(rng):
    """Fused int8 GEMM+dequant kernel == the XLA int8_dot path bit-for-bit
    (same int32-exact dot, same f32 scale product, same single cast)."""
    from vqa_tpu.ops.pallas.int8_matmul import int8_matmul_dequant
    from vqa_tpu.ops.quant import int8_dot, quantize_weight_per_col

    M, K, N = 700, 256, 128   # M not a tile multiple: exercises row padding
    x_q = rng.integers(-127, 128, (M, K)).astype(np.int8)
    x_scale = (rng.random(M).astype(np.float32) * 0.1 + 1e-3)
    kernel = (rng.standard_normal((K, N)) * 0.05).astype(np.float32)
    w_q, w_scale = quantize_weight_per_col(jnp.asarray(kernel))

    for out_dtype in (jnp.float32, jnp.bfloat16):
        want = int8_dot(jnp.asarray(x_q), jnp.asarray(x_scale),
                        jnp.asarray(kernel), out_dtype=out_dtype)
        got = int8_matmul_dequant(
            jnp.asarray(x_q), jnp.asarray(x_scale), w_q, w_scale,
            out_dtype=out_dtype, tile_m=256, interpret=True)
        assert got.dtype == out_dtype
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_dot_pallas_route_matches_xla(rng):
    """int8_dot(use_pallas=True) routes qualifying shapes through the fused
    kernel (interpret mode off-TPU) and stays bit-identical; non-qualifying
    shapes fall back to the XLA path."""
    from vqa_tpu.ops.quant import int8_dot

    x_q = rng.integers(-127, 128, (4, 260, 256)).astype(np.int8)  # 1040 rows
    x_scale = (rng.random((4, 260)).astype(np.float32) * 0.1 + 1e-3)
    kernel = (rng.standard_normal((256, 128)) * 0.05).astype(np.float32)
    want = int8_dot(jnp.asarray(x_q), jnp.asarray(x_scale),
                    jnp.asarray(kernel), out_dtype=jnp.bfloat16)
    got = int8_dot(jnp.asarray(x_q), jnp.asarray(x_scale),
                   jnp.asarray(kernel), out_dtype=jnp.bfloat16,
                   use_pallas=True)
    assert got.shape == (4, 260, 128)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # small batch: supports() rejects, falls back to XLA (no error)
    small = int8_dot(jnp.asarray(x_q[0, :8]), jnp.asarray(x_scale[0, :8]),
                     jnp.asarray(kernel), use_pallas=True)
    assert small.shape == (8, 128)


def test_feed_gemm_dequant_matmul_matches_xla(rng):
    """Fused dequant->bf16-GEMM kernel == the XLA dequant-then-matmul path
    (same op order: cast to w.dtype, scale, one MXU dot)."""
    from vqa_tpu.ops.pallas.feed_gemm import dequant_matmul, supports

    M, K, N = 300, 256, 128   # M off the tile grid: exercises row padding
    x_q = rng.integers(-127, 128, (M, K)).astype(np.int8)
    x_scale = (rng.random(M).astype(np.float32) * 0.05 + 1e-3)
    for w_dtype in (jnp.float32, jnp.bfloat16):
        w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, dtype=w_dtype)
        xs = jnp.asarray(x_scale, dtype=w_dtype)
        want = jnp.matmul(jnp.asarray(x_q).astype(w_dtype) * xs[:, None], w,
                          preferred_element_type=w_dtype)
        got = dequant_matmul(jnp.asarray(x_q), xs, w, tile_m=128,
                             interpret=True)
        assert got.dtype == w_dtype
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2 if w_dtype == jnp.bfloat16 else 1e-6, atol=1e-5)
    assert supports(16384 * 36, 2048, 1024, tile_m=256)


def test_lazyv_pool_matches_xla_einsum(rng):
    """Fused lazy-v pooling kernel == the XLA einsum('bn,bnd->bd') on the
    int8 payload (same op order: cast to the weight dtype, multiply, sum)."""
    from vqa_tpu.ops.pallas.lazyv_pool import pool_int8, supports

    B, NOBJ, D = 70, 36, 256   # B off the tile grid: exercises padding
    x_q = rng.integers(-127, 128, (B, NOBJ, D)).astype(np.int8)
    for w_dtype in (jnp.float32, jnp.bfloat16):
        w = jnp.asarray(rng.random((B, NOBJ)) * 0.05, dtype=w_dtype)
        want = jnp.einsum("bn,bnd->bd", w, jnp.asarray(x_q).astype(w_dtype),
                          preferred_element_type=w_dtype)
        got = pool_int8(w, jnp.asarray(x_q), tile_b=32, interpret=True)
        assert got.dtype == w_dtype
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2 if w_dtype == jnp.bfloat16 else 1e-6, atol=1e-5)
    assert supports(16384, 36, 2048)


@pytest.mark.parametrize("flatten", [True, False])
def test_int8_matmul_3d_matches_xla(rng, flatten):
    """3-D-native fused int8 GEMM+dequant == the XLA int8_dot path
    bit-for-bit, both in-kernel contraction variants."""
    from vqa_tpu.ops.pallas.int8_matmul import (
        int8_matmul_dequant_3d, supports_3d)
    from vqa_tpu.ops.quant import int8_dot, quantize_weight_per_col

    B, G, K, N = 37, 12, 256, 128   # B off the tile grid: exercises padding
    x_q = rng.integers(-127, 128, (B, G, K)).astype(np.int8)
    x_scale = (rng.random((B, G)).astype(np.float32) * 0.1 + 1e-3)
    kernel = (rng.standard_normal((K, N)) * 0.05).astype(np.float32)
    w_q, w_scale = quantize_weight_per_col(jnp.asarray(kernel))

    want = int8_dot(jnp.asarray(x_q), jnp.asarray(x_scale),
                    jnp.asarray(kernel), out_dtype=jnp.bfloat16)
    got = int8_matmul_dequant_3d(
        jnp.asarray(x_q), jnp.asarray(x_scale), w_q, w_scale,
        out_dtype=jnp.bfloat16, tile_b=8, flatten=flatten, interpret=True)
    assert got.shape == (B, G, N)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert supports_3d(16384, 36, 2048, 1024, tile_b=8)


def test_int8_dot_bias_relu_epilogue_routes_agree(rng):
    """bias+ReLU epilogue: Pallas 3-D route == XLA route bit-for-bit, and
    WNDense/FCNet fused forms == the reference-shaped unfused ops."""
    from vqa_tpu.ops.quant import int8_dot

    B, G, K, N = 40, 12, 256, 128
    x_q = jnp.asarray(rng.integers(-127, 128, (B, G, K)).astype(np.int8))
    x_scale = jnp.asarray(
        (rng.random((B, G)).astype(np.float32) * 0.1 + 1e-3))
    kernel = jnp.asarray((rng.standard_normal((K, N)) * 0.05)
                         .astype(np.float32))
    bias = jnp.asarray((rng.standard_normal(N) * 0.1).astype(np.float32))

    plain = int8_dot(x_q, x_scale, kernel, out_dtype=jnp.bfloat16)
    want = jnp.maximum(plain + bias.astype(plain.dtype), 0.0)
    got_xla = int8_dot(x_q, x_scale, kernel, out_dtype=jnp.bfloat16,
                       bias=bias, relu=True)
    got_pl = int8_dot(x_q, x_scale, kernel, out_dtype=jnp.bfloat16,
                      bias=bias, relu=True, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(got_xla), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(got_pl), np.asarray(want))


def test_fcnet_int8_pallas_matches_xla_route(rng):
    """FCNet on an int8 activation: the fused Pallas route (GEMM + dequant
    + bias + ReLU in one kernel) == the XLA int8 route to 1 ulp (the two
    compilations may associate the acc*(x_scale*w_scale) multiply chain
    differently in f32; bf16 outputs compare exact — previous test)."""
    from vqa_tpu.ops.linear import FCNet

    B, G, K, H = 48, 12, 256, 128
    x_q = jnp.asarray(rng.integers(-127, 128, (B, G, K)).astype(np.int8))
    x_scale = jnp.asarray(
        (rng.random((B, G)).astype(np.float32) * 0.1 + 1e-3))
    net = FCNet(H)
    params = net.init(jax.random.PRNGKey(3),
                      jnp.zeros((2, 2, K), jnp.float32))
    a = net.apply(params, x_q, x_scale=x_scale)
    b = net.apply(params, x_q, x_scale=x_scale, int8_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)
