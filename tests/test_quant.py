"""int8 MXU inference path (ops/quant.py + the --use_int8 wiring).

The quantized feature feed (data/shards.py) already ships img_q/img_scale;
these tests pin that the int8 GEMM path is numerically faithful to the f32
dequant-then-matmul it replaces (only *weight* quantization differs — the
activation quantization error is shared by both paths) and that training
gradients never route through the non-differentiable rounding.
"""

import numpy as np

import jax
import jax.numpy as jnp

from vqa_tpu.data.shards import quantize_features
from vqa_tpu.ops.quant import int8_dot, quantize_weight_per_col

# the shared `rng` fixture comes from tests/conftest.py


def test_quantize_weight_roundtrip(rng):
    k = rng.standard_normal((64, 32)).astype(np.float32)
    wq, ws = quantize_weight_per_col(jnp.asarray(k))
    assert wq.dtype == jnp.int8 and ws.shape == (32,)
    recon = np.asarray(wq, np.float32) * np.asarray(ws)[None, :]
    # symmetric int8: worst-case error is half a quantization step per entry
    step = np.asarray(ws)[None, :]
    assert np.all(np.abs(recon - k) <= 0.5 * step + 1e-7)


def test_int8_dot_matches_dequant_matmul(rng):
    """int8_dot(x_q, s, K) == dequant(x_q) @ K up to weight-quant error."""
    x = rng.standard_normal((4, 36, 256)).astype(np.float32)
    k = (rng.standard_normal((256, 64)) * 0.05).astype(np.float32)
    x_q, s = map(np.asarray, quantize_features(x))
    x_deq = x_q.astype(np.float32) * s[..., None]

    got = np.asarray(int8_dot(jnp.asarray(x_q), jnp.asarray(s),
                              jnp.asarray(k)))
    want = x_deq @ k
    # per-col weight quant error ~ ||x_row||_1 * step/2; bound empirically
    scale = np.abs(want).max()
    assert np.max(np.abs(got - want)) / scale < 0.02
    assert got.shape == (4, 36, 64)


def test_wndense_int8_branch_matches_f32(rng):
    from vqa_tpu.ops.linear import WNDense
    x = rng.standard_normal((8, 12, 128)).astype(np.float32)
    x_q, s = map(np.asarray, quantize_features(x))
    x_deq = x_q.astype(np.float32) * s[..., None]

    layer = WNDense(32)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x_deq))
    want = np.asarray(layer.apply(params, jnp.asarray(x_deq)))
    got = np.asarray(layer.apply(params, jnp.asarray(x_q),
                                 x_scale=jnp.asarray(s)))
    scale = np.abs(want).max()
    assert np.max(np.abs(got - want)) / scale < 0.02


def test_encoder_int8_path_close_and_guarded(rng):
    """BaseEncoder(use_int8=True) on an img_q batch ~= the f32 path; the
    flag is a no-op when the batch ships dense features."""
    from vqa_tpu.models.encoder import BaseEncoder
    B, N, D, H = 4, 36, 128, 64
    img = (rng.standard_normal((B, N, D)) * 0.5).astype(np.float32)
    img_q, s = map(np.asarray, quantize_features(img))
    q_tok = rng.integers(0, 50, (B, 10)).astype(np.int32)

    enc = BaseEncoder(ntoken=50, embed_dim=16, hidden_dim=H, dropout=0.0,
                      att_type="new", att_dropout=0.0)
    enc8 = BaseEncoder(ntoken=50, embed_dim=16, hidden_dim=H, dropout=0.0,
                       att_type="new", att_dropout=0.0, use_int8=True)
    batch_q = {"img_q": jnp.asarray(img_q), "img_scale": jnp.asarray(s),
               "q": jnp.asarray(q_tok)}
    params = enc.init(jax.random.PRNGKey(1), batch_q)

    want = enc.apply(params, batch_q)
    got = enc8.apply(params, batch_q)
    np.testing.assert_allclose(np.asarray(got["v_att"]),
                               np.asarray(want["v_att"]),
                               rtol=0, atol=5e-3)
    scale = float(np.abs(np.asarray(want["v"])).max())
    assert float(np.max(np.abs(np.asarray(got["v"])
                               - np.asarray(want["v"])))) / scale < 0.02

    # dense batch: identical (flag gated on img_q presence)
    batch_f = {"img": jnp.asarray(img), "q": jnp.asarray(q_tok)}
    np.testing.assert_array_equal(
        np.asarray(enc8.apply(params, batch_f)["v"]),
        np.asarray(enc.apply(params, batch_f)["v"]))


def test_encoder_int8_concat_attention(rng):
    """The int8 v-projection also serves ConcatAttention (att_type=base):
    the v-side rows of the concat kernel run as one int8 GEMM."""
    from vqa_tpu.models.encoder import BaseEncoder
    B, N, D, H = 4, 36, 128, 64
    img = (rng.standard_normal((B, N, D)) * 0.5).astype(np.float32)
    img_q, s = map(np.asarray, quantize_features(img))
    batch = {"img_q": jnp.asarray(img_q), "img_scale": jnp.asarray(s),
             "q": jnp.asarray(rng.integers(0, 50, (B, 10)), jnp.int32)}
    enc = BaseEncoder(ntoken=50, embed_dim=16, hidden_dim=H, dropout=0.0,
                      att_type="base")
    enc8 = BaseEncoder(ntoken=50, embed_dim=16, hidden_dim=H, dropout=0.0,
                       att_type="base", use_int8=True)
    params = enc.init(jax.random.PRNGKey(7), batch)
    want = np.asarray(enc.apply(params, batch)["v_att"])
    got = np.asarray(enc8.apply(params, batch)["v_att"])
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-3)


def test_model_int8_answer_agreement(rng):
    """set_model(use_int8=True): answer argmax agrees with the f32 path on
    nearly every question (int8 weight quant moves logits < tie margin)."""
    from vqa_tpu.models.wrapper import set_model
    B, N, D = 64, 36, 256
    img = (rng.standard_normal((B, N, D)) * 0.5).astype(np.float32)
    img_q, s = map(np.asarray, quantize_features(img))
    batch = {"img_q": jnp.asarray(img_q), "img_scale": jnp.asarray(s),
             "q": jnp.asarray(rng.integers(0, 100, (B, 10)), jnp.int32)}

    kw = dict(encoder_type="base", predictor_type="base", decoder_type="none",
              ntoken=100, v_dim=D, embed_dim=16, hidden_dim=64, ans_dim=50,
              dropout=0.0, att_type="new", att_dropout=0.0)
    m = set_model(**kw)
    m8 = set_model(use_int8=True, **kw)
    params = m.init(jax.random.PRNGKey(2), batch)
    p, _ = m.apply(params, batch)
    p8, _ = m8.apply(params, batch)
    agree = float(np.mean(np.asarray(jnp.argmax(p, -1))
                          == np.asarray(jnp.argmax(p8, -1))))
    assert agree >= 0.95, f"answer agreement {agree}"


def test_lazy_v_sum_matches_materialized_pooling(rng):
    """The int8-feed lazy pooling (encoder 'v_sum': att*scale weights
    applied directly to the int8 payload, VERDICT r2 item 5) equals
    sum(v_att * dequant(v), axis=1) up to fp reorder, and the predictor
    consumes it — logits match a predictor fed the materialized v."""
    from vqa_tpu.models.encoder import BaseEncoder
    from vqa_tpu.models.predictor import BasePredictor
    from vqa_tpu.models.wrapper import set_model
    B, N, D, H = 8, 36, 128, 64
    img = (rng.standard_normal((B, N, D)) * 0.5).astype(np.float32)
    img_q, s = map(np.asarray, quantize_features(img))
    batch = {"img_q": jnp.asarray(img_q), "img_scale": jnp.asarray(s),
             "q": jnp.asarray(rng.integers(0, 50, (B, 10)), jnp.int32)}
    enc8 = BaseEncoder(ntoken=50, embed_dim=16, hidden_dim=H, dropout=0.0,
                       att_type="new", att_dropout=0.0, use_int8=True)
    params = enc8.init(jax.random.PRNGKey(1), batch)
    out = enc8.apply(params, batch)
    assert "v_sum" in out
    want = np.asarray(jnp.sum(out["v"], axis=1))
    np.testing.assert_allclose(np.asarray(out["v_sum"]), want,
                               rtol=1e-5, atol=1e-5)
    # end-to-end: the int8 model's logits with v_sum == logits computed by
    # a predictor forced onto the materialized-v path
    kw = dict(encoder_type="base", predictor_type="base", decoder_type="none",
              ntoken=50, v_dim=D, embed_dim=16, hidden_dim=H, ans_dim=20,
              dropout=0.0, att_type="new", att_dropout=0.0)
    m8 = set_model(use_int8=True, **kw)
    mparams = m8.init(jax.random.PRNGKey(3), batch)
    p_lazy, _ = m8.apply(mparams, batch)
    embed = m8.encoder.apply({"params": mparams["params"]["encoder"]}, batch)
    embed.pop("v_sum")
    p_mat = BasePredictor(hidden_dim=H, ans_dim=20, dropout=0.0).apply(
        {"params": mparams["params"]["predictor"]}, embed)
    np.testing.assert_allclose(np.asarray(p_lazy), np.asarray(p_mat),
                               rtol=1e-4, atol=1e-5)
    # round 3: lazy v is active during TRAINING too (PARITY.md "int8-feed
    # training numerics") — v_sum is emitted, and its gradient equals the
    # gradient of the materialized pooling (exact algebra, fp reorder)
    out_tr = enc8.apply(params, batch, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(0)})
    assert "v_sum" in out_tr and "v_q8" in out_tr and "v_w" in out_tr

    def loss_lazy(p):
        o = enc8.apply(p, batch, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(0)})
        return jnp.sum(jnp.sin(o["v_sum"]))

    def loss_mat(p):
        o = enc8.apply(p, batch, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(0)})
        return jnp.sum(jnp.sin(jnp.sum(o["v"], axis=1)))

    g_lazy = jax.grad(loss_lazy)(params)
    g_mat = jax.grad(loss_mat)(params)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_lazy),
            jax.tree_util.tree_leaves_with_path(g_mat)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))


def test_grouped_self_similarity_exact(rng):
    """Block-diagonal image-grouped contraction == the direct batched
    einsum, for group-divisible, partially divisible and prime batches."""
    from vqa_tpu.ops.gcn import grouped_self_similarity
    for B in (8, 6, 5):
        a = jnp.asarray(rng.standard_normal((B, 36, 64)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((B, 36, 64)).astype(np.float32))
        want = np.einsum("bik,bjk->bij", np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(
            np.asarray(grouped_self_similarity(a, b)), want,
            rtol=1e-5, atol=1e-5)


def test_gcn_int8_close_to_f32(rng):
    """GCN(use_int8=True) inference stays close to the f32 conv (shared
    dynamic row quant + per-col weight quant across the 3 big GEMMs)."""
    from vqa_tpu.ops.gcn import GCN
    B, N, D = 4, 36, 128
    f = jnp.asarray((rng.standard_normal((B, N, D)) * 0.3).astype(np.float32))
    g = jnp.asarray(rng.integers(0, 12, size=(B, N, N)).astype(np.int32))
    ref = GCN(out_dim=D, conv_layer=2, conv_type="corr", dropout=0.0)
    q8 = GCN(out_dim=D, conv_layer=2, conv_type="corr", dropout=0.0,
             use_int8=True)
    params = ref.init(jax.random.PRNGKey(5), f, g)
    want = np.asarray(ref.apply(params, f, g, deterministic=True))
    got = np.asarray(q8.apply(params, f, g, deterministic=True))
    scale = np.abs(want).max()
    assert np.max(np.abs(got - want)) / scale < 0.05
    # training mode must stay on the differentiable f32 path
    def loss(p):
        rngs = {"dropout": jax.random.PRNGKey(6)}
        return jnp.sum(q8.apply(p, f, g, deterministic=False, rngs=rngs))
    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(grads))


def test_int8_model_trains_on_f32_path(rng):
    """Training (deterministic=False) never routes through the int8 rounding:
    gradients through a use_int8 model on an img_q batch are finite and
    identical to the use_int8=False model's."""
    from vqa_tpu.models.wrapper import set_model
    B, N, D = 8, 36, 64
    img = (rng.standard_normal((B, N, D)) * 0.5).astype(np.float32)
    img_q, s = map(np.asarray, quantize_features(img))
    batch = {"img_q": jnp.asarray(img_q), "img_scale": jnp.asarray(s),
             "q": jnp.asarray(rng.integers(0, 50, (B, 10)), jnp.int32),
             "a": jnp.asarray((rng.random((B, 20)) < 0.1).astype(np.float32))}

    kw = dict(encoder_type="base", predictor_type="base", decoder_type="none",
              ntoken=50, v_dim=D, embed_dim=16, hidden_dim=32, ans_dim=20,
              dropout=0.0, att_type="new", att_dropout=0.0)
    m = set_model(**kw)
    m8 = set_model(use_int8=True, **kw)
    params = m.init(jax.random.PRNGKey(3), batch)

    def loss(model, p):
        out, _ = model.apply(p, batch, deterministic=False,
                             method=model.get_loss,
                             rngs={"dropout": jax.random.PRNGKey(4)})
        return out

    g = jax.grad(lambda p: loss(m, p))(params)
    g8 = jax.grad(lambda p: loss(m8, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g8)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        np.testing.assert_array_equal(a, b)


def test_lazy_v_independent_of_use_int8(rng):
    """lazy_v rides the int8 *feed*, not the int8 GEMM path: a use_int8=False
    encoder fed img_q/img_scale still emits 'v_sum' (the bench fast config —
    bf16 GEMMs + fused dequant + lazy pooling), and lazy_v=False disables it."""
    from vqa_tpu.models.encoder import BaseEncoder
    B, N, D, H = 8, 36, 128, 64
    img = (rng.standard_normal((B, N, D)) * 0.5).astype(np.float32)
    img_q, s = map(np.asarray, quantize_features(img))
    batch = {"img_q": jnp.asarray(img_q), "img_scale": jnp.asarray(s),
             "q": jnp.asarray(rng.integers(0, 50, (B, 10)), jnp.int32)}
    enc = BaseEncoder(ntoken=50, embed_dim=16, hidden_dim=H, dropout=0.0,
                      att_type="new", att_dropout=0.0)
    params = enc.init(jax.random.PRNGKey(1), batch)
    out = enc.apply(params, batch)
    assert "v_sum" in out
    np.testing.assert_allclose(np.asarray(out["v_sum"]),
                               np.asarray(jnp.sum(out["v"], axis=1)),
                               rtol=1e-5, atol=1e-5)
    off = enc.clone(lazy_v=False)
    assert "v_sum" not in off.apply(params, batch)
    # dense feed: no img_q, no lazy path
    dense = {"img": jnp.asarray(img), "q": batch["q"]}
    assert "v_sum" not in enc.apply(params, dense)


def test_encoder_int8_pallas_route_matches_xla_route(rng):
    """BaseEncoder(use_int8=True, use_pallas=True) — the 3-D fused kernel
    + pool_int8 route (interpret mode off-TPU) == the XLA int8 route: the
    fused epilogue and the pooling kernel are pure layout optimizations.
    Shapes chosen so int8_matmul.supports_3d and lazyv_pool.supports both
    accept (the route must actually exercise the kernels)."""
    from vqa_tpu.models.encoder import BaseEncoder
    from vqa_tpu.ops.pallas import int8_matmul, lazyv_pool
    B, N, D, H = 32, 36, 256, 128
    assert int8_matmul.supports_3d(B, N, D, H, tile_b=8)
    assert lazyv_pool.supports(B, N, D)
    img = (rng.standard_normal((B, N, D)) * 0.5).astype(np.float32)
    img_q, s = map(np.asarray, quantize_features(img))
    batch = {"img_q": jnp.asarray(img_q), "img_scale": jnp.asarray(s),
             "q": jnp.asarray(rng.integers(0, 50, (B, 10)), jnp.int32)}
    kw = dict(ntoken=50, embed_dim=16, hidden_dim=H, dropout=0.0,
              att_type="new", att_dropout=0.0, use_int8=True)
    enc = BaseEncoder(**kw)
    encp = BaseEncoder(**{**kw, "use_pallas": True})
    # use_pallas also swaps the GRU; share params (same structure) and
    # compare the attention/pooling outputs, which the int8 route feeds
    params = enc.init(jax.random.PRNGKey(5), batch)
    want = enc.apply(params, batch)
    got = encp.apply(params, batch)
    np.testing.assert_allclose(np.asarray(got["v_att"], np.float32),
                               np.asarray(want["v_att"], np.float32),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["v_sum"], np.float32),
                               np.asarray(want["v_sum"], np.float32),
                               rtol=1e-5, atol=1e-5)
