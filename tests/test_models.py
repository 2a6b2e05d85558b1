"""Composition smoke + semantics tests for the model zoo.

Covers every encoder x predictor x decoder configuration from the reference
model matrix (README.md:20-26): Up-Down VQA, Up-Down captioning, VQA-E
multi-task, Q-Relevant q-cap, ReGAT relation encoder.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqa_tpu.models.wrapper import (
    VQAModel, set_model, compute_score, instance_bce_with_logits,
    ce_for_language_model,
)

NTOKEN = 50
V_DIM = 32
EMBED = 16
HIDDEN = 24
DEC_HIDDEN = 20
ANS = 13
C_LEN = 8
Q_LEN = 5
OBJS = 9
B = 4


def make_batch(rng, graph=False, caption=True):
    batch = {
        "img": jnp.asarray(rng.standard_normal((B, OBJS, V_DIM)).astype(np.float32)),
        "q": jnp.asarray(rng.integers(0, NTOKEN, (B, Q_LEN))),
        "a": jnp.asarray((rng.random((B, ANS)) < 0.1).astype(np.float32)),
    }
    if caption:
        batch["c"] = jnp.asarray(rng.integers(0, NTOKEN, (B, C_LEN)))
        batch["cap_len"] = jnp.asarray(rng.integers(2, C_LEN + 1, (B,)))
    if graph:
        batch["graph"] = jnp.asarray(rng.integers(0, 12, (B, OBJS, OBJS)))
    return batch


def build(rng, **kw):
    defaults = dict(
        encoder_type="base", predictor_type="base", decoder_type="none",
        ntoken=NTOKEN, v_dim=V_DIM, embed_dim=EMBED, hidden_dim=HIDDEN,
        decoder_hidden_dim=DEC_HIDDEN, ans_dim=ANS, c_len=C_LEN,
        dropout=0.1, conv_layer=1,
    )
    defaults.update(kw)
    model = set_model(**defaults)
    batch = make_batch(rng, graph=defaults["encoder_type"] == "relation",
                       caption=True)
    params = model.init(jax.random.key(0), batch)
    return model, params, batch


@pytest.mark.parametrize("att_type", ["base", "new"])
def test_updown_vqa_forward(rng, att_type):
    model, params, batch = build(rng, att_type=att_type)
    predict, caption = model.apply(params, batch)
    assert caption is None
    assert predict.shape == (B, ANS)
    # FCNet classifier ends in ReLU (reference modules.py:55) => non-negative.
    assert np.all(np.asarray(predict) >= 0)


def test_updown_vqa_without_captions(rng):
    """Plain VQA batches (no captions) must work — reference defect 2.1(3) fixed."""
    model, params, _ = build(rng)
    batch = make_batch(rng, caption=False)
    predict, _ = model.apply(params, batch)
    assert predict.shape == (B, ANS)


@pytest.mark.parametrize("decoder_type", ["base", "butd"])
def test_caption_decoder_forward(rng, decoder_type):
    model, params, batch = build(rng, decoder_type=decoder_type,
                                 predictor_type="none")
    predict, caption = model.apply(params, batch)
    assert predict is None
    assert caption["predict"].shape == (B, C_LEN - 1, NTOKEN)
    assert caption["target"].shape == (B, C_LEN - 1)
    # mask rows match cap_len - 1
    np.testing.assert_array_equal(
        np.asarray(caption["mask"]).sum(1),
        np.asarray(batch["cap_len"]) - 1)


def test_multitask_loss_and_mtl_logvars(rng):
    model, params, batch = build(rng, decoder_type="base",
                                 predictor_type="base-cap", use_mtl=True)
    assert "log_vars" in params["params"]
    loss, writes = model.apply(params, batch, method="get_loss",
                               deterministic=True)
    assert np.isfinite(float(loss))
    assert set(writes) == {"train/loss", "train/score", "train/cap/loss"}
    # with log_vars = 0: loss == loss_vqa + loss_cap
    np.testing.assert_allclose(
        float(loss), float(writes["train/loss"] + writes["train/cap/loss"]),
        rtol=1e-5)


@pytest.mark.parametrize("decoder_type", ["base", "butd"])
def test_fused_caption_loss_matches_unfused(rng, decoder_type):
    """generator.caption_loss (CE inside the remat'd scan, logits never
    stacked) == stacked logits + ce_for_language_model, and its gradients
    match too — the MTL training hot path is exact, not approximate."""
    model, params, batch = build(rng, decoder_type=decoder_type,
                                 predictor_type="base-cap", use_mtl=True)
    fused_loss, fused_writes = model.apply(params, batch, method="get_loss",
                                           deterministic=True)
    unfused = VQAModel(encoder=model.encoder, predictor=model.predictor,
                       generator=model.generator, use_mtl=True,
                       fused_cap_loss=False)
    ref_loss, ref_writes = unfused.apply(params, batch, method="get_loss",
                                         deterministic=True)
    np.testing.assert_allclose(float(fused_loss), float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(float(fused_writes["train/cap/loss"]),
                               float(ref_writes["train/cap/loss"]), rtol=1e-6)

    def loss_of(mdl):
        def f(p):
            loss, _ = mdl.apply({"params": p}, batch, method="get_loss",
                                deterministic=True)
            return loss
        return f
    g_fused = jax.grad(loss_of(model))(params["params"])
    g_ref = jax.grad(loss_of(unfused))(params["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=1e-6),
        g_fused, g_ref)


def test_qcap_predictor(rng):
    model, params, batch = build(rng, predictor_type="q-cap")
    predict, _ = model.apply(params, batch)
    assert predict.shape == (B, ANS)
    # Sigmoid classifier (reference predictor.py:181-184): output in (0,1).
    p = np.asarray(predict)
    assert np.all(p > 0) and np.all(p < 1)


@pytest.mark.parametrize("conv_type", ["base", "direct", "corr"])
def test_relation_encoder(rng, conv_type):
    model, params, batch = build(rng, encoder_type="relation",
                                 conv_type=conv_type)
    predict, _ = model.apply(params, batch)
    assert predict.shape == (B, ANS)
    # GCN parameters must be registered (reference defect 2.1(1) fixed).
    flat = jax.tree_util.tree_leaves_with_path(params["params"])
    assert any("spatial_encoder" in jax.tree_util.keystr(p) for p, _ in flat)


def test_dropout_rng_training_mode(rng):
    model, params, batch = build(rng, decoder_type="base",
                                 predictor_type="base-cap")
    loss1, _ = model.apply(params, batch, method="get_loss",
                           deterministic=False,
                           rngs={"dropout": jax.random.key(1)})
    loss2, _ = model.apply(params, batch, method="get_loss",
                           deterministic=False,
                           rngs={"dropout": jax.random.key(2)})
    assert float(loss1) != float(loss2)  # dropout actually active


def test_compute_score_matches_soft_metric(rng):
    predict = jnp.asarray(rng.standard_normal((6, ANS)).astype(np.float32))
    target = jnp.asarray(rng.random((6, ANS)).astype(np.float32))
    scores, labels = compute_score(predict, target, get_label=True)
    want = np.asarray(target)[np.arange(6), np.asarray(predict).argmax(1)]
    np.testing.assert_allclose(np.asarray(scores).sum(1), want, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(labels),
                                  np.asarray(predict).argmax(1))


def test_bce_matches_torch(rng):
    import torch
    predict = rng.standard_normal((5, ANS)).astype(np.float32)
    target = (rng.random((5, ANS)) < 0.3).astype(np.float32)
    got = instance_bce_with_logits(jnp.asarray(predict), jnp.asarray(target))
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(predict), torch.from_numpy(target)) * ANS
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_masked_ce_matches_packed_ce(rng):
    import torch
    t_len = 7
    predict = rng.standard_normal((4, t_len, NTOKEN)).astype(np.float32)
    target = rng.integers(0, NTOKEN, (4, t_len))
    lens = np.array([7, 3, 5, 1])
    mask = (np.arange(t_len)[None, :] < lens[:, None]).astype(np.float32)
    got = ce_for_language_model(jnp.asarray(predict), jnp.asarray(target),
                                jnp.asarray(mask))
    # packed equivalent: flatten valid positions only (reference packs via
    # pack_padded_sequence, generator.py:117-120)
    rows = np.concatenate([predict[i, :lens[i]] for i in range(4)])
    tgts = np.concatenate([target[i, :lens[i]] for i in range(4)])
    want = torch.nn.functional.cross_entropy(torch.from_numpy(rows),
                                             torch.from_numpy(tgts))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_relation_encoder_semantic_and_implicit(rng):
    """use_imp + use_sem branches: implicit fully-connected graph and the
    semantic-graph wiring (graph itself from an external detector)."""
    from vqa_tpu.models.encoder import RelationEncoder
    from vqa_tpu.models.predictor import BasePredictor
    from vqa_tpu.models.wrapper import VQAModel
    enc = RelationEncoder(ntoken=NTOKEN, embed_dim=EMBED, hidden_dim=HIDDEN,
                          v_dim=V_DIM, num_objs=OBJS, dropout=0.1,
                          use_imp=True, use_spa=True, use_sem=True)
    model = VQAModel(encoder=enc,
                     predictor=BasePredictor(HIDDEN, ANS, dropout=0.1))
    batch = make_batch(rng, graph=True)
    batch["sem_graph"] = jnp.asarray(rng.integers(0, 15, (B, OBJS, OBJS)))
    params = model.init(jax.random.key(0), batch)
    predict, _ = model.apply(params, batch)
    assert predict.shape == (B, ANS)
    tops = set(params["params"]["encoder"].keys())
    assert {"implicit_encoder", "spatial_encoder", "semantic_encoder"} <= tops


def test_on_device_int8_dequant_input(rng):
    """batch with img_q/img_scale == batch with pre-dequantized img."""
    model, params, batch = build(rng)
    img = np.asarray(batch["img"])
    scale = np.abs(img).max(axis=2) / 127.0 + 1e-8
    q = np.clip(np.rint(img / scale[..., None]), -127, 127).astype(np.int8)
    deq = {k: v for k, v in batch.items() if k != "img"}
    deq["img_q"] = jnp.asarray(q)
    deq["img_scale"] = jnp.asarray(scale.astype(np.float32))
    ref_batch = dict(deq)
    ref_batch.pop("img_q"); ref_batch.pop("img_scale")
    ref_batch["img"] = jnp.asarray(q.astype(np.float32) * scale[..., None])
    p1, _ = model.apply(params, deq)
    p2, _ = model.apply(params, ref_batch)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("decoder_type", ["base", "butd"])
def test_lstm_decoder_forward_and_beam(rng, decoder_type):
    """LSTM cell path through decoders + beam search (reference rnn_type)."""
    from vqa_tpu.tools.beam import make_beam_search
    model, params, batch = build(rng, decoder_type=decoder_type,
                                 predictor_type="none", rnn_type="LSTM")
    _, caption = model.apply(params, batch)
    assert caption["predict"].shape == (B, C_LEN - 1, NTOKEN)
    assert np.isfinite(np.asarray(caption["predict"])).all()
    bs = make_beam_search(model, k=2, c_len=C_LEN, start_id=NTOKEN - 3,
                          end_id=NTOKEN - 2)
    tokens, scores = bs(params["params"], batch)
    assert tokens.shape == (B, 2, C_LEN)


def test_gcn_lstm_composition(rng):
    """Relation encoder + caption decoder: the 'GCN-LSTM' row the reference
    model matrix marks as not implemented (README.md:20-26) — supported here
    by composition."""
    model, params, batch = build(rng, encoder_type="relation",
                                 decoder_type="butd", predictor_type="none",
                                 rnn_type="LSTM")
    _, caption = model.apply(params, batch)
    assert caption["predict"].shape == (B, C_LEN - 1, NTOKEN)
    assert np.isfinite(np.asarray(caption["predict"])).all()


def test_set_model_relation_flags_plumb_through(rng):
    """--use_spa/--use_imp/--use_sem reach RelationEncoder via the factory
    (VERDICT r1 item 8: the reference hides these, encoder.py:202-234)."""
    model, params, batch = build(rng, encoder_type="relation",
                                 use_spa=True, use_imp=True)
    enc = params["params"]["encoder"]
    assert "spatial_encoder" in enc and "implicit_encoder" in enc
    assert "semantic_encoder" not in enc
    predict, _ = model.apply(params, batch)
    assert predict.shape == (B, ANS)


@pytest.mark.parametrize("decoder_type", ["base", "butd"])
def test_scan_teacher_forcing_matches_unrolled(rng, decoder_type):
    """nn.scan teacher forcing == the Python-unrolled loop, bit for bit
    (deterministic mode); the scan traces the decode step once, so jit
    compile time is O(1) in c_len instead of O(c_len)."""
    from vqa_tpu.models.generator import set_decoder

    batch = {
        "v": jnp.asarray(rng.standard_normal((B, OBJS, V_DIM)).astype(np.float32)),
        "c": jnp.asarray(rng.standard_normal((B, C_LEN, EMBED)).astype(np.float32)),
        "cap_len": jnp.asarray(rng.integers(2, C_LEN + 1, (B,))),
        "c_target": jnp.asarray(rng.integers(0, NTOKEN, (B, C_LEN))),
    }
    kw = dict(ntoken=NTOKEN, hidden_dim=DEC_HIDDEN, max_len=C_LEN,
              dropout=0.3, rnn_type="GRU", att_type="base")
    scan_dec = set_decoder(decoder_type, **kw)
    unrolled = scan_dec.clone(use_scan=False)
    params = scan_dec.init(jax.random.key(0), batch)
    out_scan = scan_dec.apply(params, batch, deterministic=True)
    out_unrl = unrolled.apply(params, batch, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_scan["mask"]),
                                  np.asarray(out_unrl["mask"]))
    np.testing.assert_allclose(np.asarray(out_scan["predict"]),
                               np.asarray(out_unrl["predict"]),
                               rtol=1e-6, atol=1e-6)
    # both param layouts must be identical (checkpoints interchange)
    s1 = jax.tree_util.tree_structure(params)
    s2 = jax.tree_util.tree_structure(unrolled.init(jax.random.key(0), batch))
    assert s1 == s2


def test_caption_loss_truncated_axis_matches_full(rng):
    """A length-bucketed batch (caption axis truncated to >= max cap_len + 1,
    data/loader.py) yields the identical loss: every dropped decode step is
    masked zero either way. Pinned with the caption-free base predictor —
    caption-reading heads (base-cap) run their GRU across the padded tail
    (reference quirk), so under bucketing that pad noise is absent
    (PARITY.md 'Length bucketing')."""
    model, params, batch = build(rng, decoder_type="butd",
                                 predictor_type="base", use_mtl=True)
    # force captions short enough that truncation is a real cut
    batch["cap_len"] = np.minimum(np.asarray(batch["cap_len"]), C_LEN - 3)
    bound = int(np.max(np.asarray(batch["cap_len"])))
    assert bound + 1 < C_LEN
    full_loss, _ = model.apply(params, batch, method="get_loss",
                               deterministic=True)
    short = dict(batch)
    # bound + 1 mirrors the loader: one padded position survives so the
    # caption max-pool's zero sentinel is present exactly as at full length
    short["c"] = batch["c"][:, :bound + 1]
    short_loss, _ = model.apply(params, short, method="get_loss",
                                deterministic=True)
    np.testing.assert_allclose(float(short_loss), float(full_loss),
                               rtol=1e-5)


def test_fused_vjp_scan_matches_stock(rng):
    """The custom-VJP teacher-forcing scan (ops/decode_scan.py) matches the
    nn.scan path: identical deterministic loss, and full-model parameter
    gradients equal at fp tolerance (deterministic — the two paths draw
    different dropout streams by design, see the fused_vjp attr note)."""
    model, params, batch = build(rng, decoder_type="butd", att_type="new",
                                 predictor_type="base", use_mtl=True)
    stock = model.clone(generator=model.generator.clone(fused_vjp=False))
    assert model.generator.fused_vjp  # default on
    # the fused path must actually be eligible (att_type='new' + BUTD+GRU;
    # an att_type='base' build would silently compare stock vs stock)
    assert model.generator.att_type == "new"

    lf, _ = model.apply(params, batch, method="get_loss", deterministic=True)
    ls, _ = stock.apply(params, batch, method="get_loss", deterministic=True)
    np.testing.assert_allclose(float(lf), float(ls), rtol=1e-6)

    def loss_of(m):
        def f(p):
            l, _ = m.apply(p, batch, method="get_loss", deterministic=True)
            return l
        return f

    gf = jax.grad(loss_of(model))(params)
    gs = jax.grad(loss_of(stock))(params)
    for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(gf)[0],
                            jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(path))


def test_pallas_att_gate_falls_back_off_tpu(rng):
    """`pallas_att=True` (wired from --use_pallas) must be a no-op off
    TPU: the generator's backend gate (models/generator.py
    caption_features) falls back to the XLA scan, so loss and gradients
    are bit-identical to pallas_att=False on this CPU test backend."""
    model, params, batch = build(rng, decoder_type="butd", att_type="new",
                                 predictor_type="base", use_mtl=True)
    pa = model.clone(generator=model.generator.clone(pallas_att=True))

    def loss_of(m):
        def f(p):
            l, _ = m.apply(p, batch, method="get_loss",
                           deterministic=False,
                           rngs={"dropout": jax.random.key(3)})
            return l
        return f

    l0, g0 = jax.value_and_grad(loss_of(model))(params)
    l1, g1 = jax.value_and_grad(loss_of(pa))(params)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("bits8", [True, False])
def test_fused_vjp_gradients_match_autodiff_with_dropout(rng, bits8):
    """The hand-structured backward equals plain autodiff of the identical
    pure forward under ACTIVE dropout (same fold_in keys => same masks) —
    for every input: params, v, vp, v_gates, prev_seq, h0s. Both dropout
    streams (uint8 thresh/256 and f32-uniform, PARITY.md dropout-stream
    matrix) are covered."""
    from vqa_tpu.ops.decode_scan import make_butd_caption_scan
    B, NOBJ, VDIM, E, H, T = 4, 7, 24, 10, 12, 6
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32) * 0.3
    P = {
        "word_rnn": {"wi": f(H + VDIM + E, 3 * H), "bi": f(3 * H),
                     "wh": f(H, 3 * H), "bh": f(3 * H)},
        "language_rnn": {"wi": f(VDIM + H, 3 * H), "bi": f(3 * H),
                         "wh": f(H, 3 * H), "bh": f(3 * H)},
        "h1_fcnet": {"w": f(H, H), "b": f(H)},
        "attention": {"W_q": {"fc0": {"v": f(H, H), "g": jnp.float32(1.3),
                                      "b": f(H)}},
                      "linear": {"v": f(H, 1), "g": jnp.float32(0.8),
                                 "b": f(1)}},
    }
    args = (P, f(B, NOBJ, VDIM), f(B, NOBJ, H), f(B, 3 * H),
            f(B, T, E), f(B, H), f(B, H))
    key = jax.random.key(7)
    co = f(T, B, H)
    for det in (True, False):
        scan_fn, ref_fn = make_butd_caption_scan(
            hidden_dim=H, v_dim=VDIM, dropout=0.4, att_dropout=0.25,
            deterministic=det, bits8_dropout=bits8)
        np.testing.assert_allclose(np.asarray(scan_fn(*args, key)),
                                   np.asarray(ref_fn(*args, key)),
                                   rtol=1e-6, atol=1e-6)
        argn = tuple(range(7))
        gc = jax.grad(lambda *a: jnp.sum(scan_fn(*a, key) * co),
                      argnums=argn)(*args)
        gr = jax.grad(lambda *a: jnp.sum(ref_fn(*a, key) * co),
                      argnums=argn)(*args)
        for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(gc)[0],
                                jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-5, atol=2e-6,
                err_msg=f"det={det} {jax.tree_util.keystr(path)}")


def test_bits8_dropout_unbiased(rng):
    """The decode scan's 8-bit-word dropout: keep rate equals the
    QUANTIZED threshold probability (thresh/256) and the survivor scale
    uses the same quantized value, so the estimator is exactly unbiased;
    rate=0 is the identity, and the gradient passes the mask unscaled."""
    from vqa_tpu.ops.decode_scan import apply_dropout as dropout
    key = jax.random.key(3)
    x = jnp.ones((512, 257), jnp.float32)
    for rate in (0.2, 0.5, 0.11):
        thresh = min(255, max(1, round((1 - rate) * 256)))
        keep_q = thresh / 256.0
        y = np.asarray(dropout(x, key, rate))
        kept = y != 0.0
        # observed keep rate ~ Binomial(n, keep_q): 5 sigma tolerance
        n = y.size
        sigma = math.sqrt(keep_q * (1 - keep_q) / n)
        assert abs(kept.mean() - keep_q) < 5 * sigma, (rate, kept.mean())
        # survivors are scaled by exactly 1/keep_q => E[y] == x
        np.testing.assert_allclose(np.unique(y[kept]), 1.0 / keep_q,
                                   rtol=1e-6)
        assert abs(float(y.mean()) - 1.0) < 6 * sigma / keep_q
        # same key => same mask; gradient is the mask * scale
        np.testing.assert_array_equal(y, np.asarray(dropout(x, key, rate)))
        g = np.asarray(jax.grad(lambda v: jnp.sum(dropout(v, key, rate)))(x))
        np.testing.assert_allclose(g, np.where(kept, 1.0 / keep_q, 0.0),
                                   rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(dropout(x, key, 0.0)),
                                  np.asarray(x))


def test_factored_scan_matches_materialized(rng):
    """factored_v mode (int8 feed): the scan over (q8, w) equals the plain
    scan over the materialized v = w * q8 — outputs and every gradient
    (params, w, vp, v_gates, prev_seq, h0s), deterministic AND under active
    dropout (same fold_in keys => same masks). fp-reorder tolerance: the
    pooling contracts (att * w) @ q8 instead of att @ (w * q8)."""
    from vqa_tpu.ops.decode_scan import make_butd_caption_scan
    B, NOBJ, VDIM, E, H, T = 4, 7, 24, 10, 12, 6
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32) * 0.3
    P = {
        "word_rnn": {"wi": f(H + VDIM + E, 3 * H), "bi": f(3 * H),
                     "wh": f(H, 3 * H), "bh": f(3 * H)},
        "language_rnn": {"wi": f(VDIM + H, 3 * H), "bi": f(3 * H),
                         "wh": f(H, 3 * H), "bh": f(3 * H)},
        "h1_fcnet": {"w": f(H, H), "b": f(H)},
        "attention": {"W_q": {"fc0": {"v": f(H, H), "g": jnp.float32(1.3),
                                      "b": f(H)}},
                      "linear": {"v": f(H, 1), "g": jnp.float32(0.8),
                                 "b": f(1)}},
    }
    q8 = jnp.asarray(rng.integers(-127, 128, (B, NOBJ, VDIM)), jnp.int8)
    w = jnp.asarray(rng.random((B, NOBJ)) * 0.05 + 0.01, jnp.float32)
    rest = (f(B, NOBJ, H), f(B, 3 * H), f(B, T, E), f(B, H), f(B, H))
    key = jax.random.key(7)
    co = f(T, B, H)
    for det in (True, False):
        kw = dict(hidden_dim=H, v_dim=VDIM, dropout=0.4, att_dropout=0.25,
                  deterministic=det)
        fac_fn, _ = make_butd_caption_scan(factored_v=True, **kw)
        _, ref_fn = make_butd_caption_scan(**kw)

        def ref_of(P_, w_, *r):
            v = w_[:, :, None] * q8.astype(w_.dtype)
            return ref_fn(P_, v, *r, key)

        np.testing.assert_allclose(
            np.asarray(fac_fn(P, q8, w, *rest, key)),
            np.asarray(ref_of(P, w, *rest)), rtol=2e-5, atol=2e-6)
        argn = tuple(range(7))
        gc = jax.grad(lambda P_, w_, *r: jnp.sum(
            fac_fn(P_, q8, w_, *r, key) * co), argnums=argn)(P, w, *rest)
        gr = jax.grad(lambda *a: jnp.sum(ref_of(*a) * co),
                      argnums=argn)(P, w, *rest)
        for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(gc)[0],
                                jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-6,
                err_msg=f"det={det} {jax.tree_util.keystr(path)}")


def test_mtl_int8_feed_matches_dense_feed(rng):
    """End to end: MTL get_loss on an int8-feed batch (factored decode scan
    + lazy predictor pooling) equals the dense-feed loss on the dequantized
    features, and its gradients are finite. Pins the encoder's factored
    payload (v_q8/v_w) against the materialized v = v_att * dequant(q8)."""
    from vqa_tpu.data.shards import quantize_features
    model, params, batch = build(rng, decoder_type="butd", att_type="new",
                                 predictor_type="base", use_mtl=True)
    img = np.asarray(batch["img"])
    q8, scale = quantize_features(img)
    int8_batch = dict(batch)
    del int8_batch["img"]
    int8_batch["img_q"] = jnp.asarray(q8)
    int8_batch["img_scale"] = jnp.asarray(scale)
    dense_batch = dict(batch)
    dense_batch["img"] = jnp.asarray(q8.astype(np.float32)
                                     * scale[..., None])

    def loss_of(b):
        def f(p):
            l, _ = model.apply(p, b, method="get_loss", deterministic=True)
            return l
        return f

    li = float(loss_of(int8_batch)(params))
    ld = float(loss_of(dense_batch)(params))
    np.testing.assert_allclose(li, ld, rtol=1e-5)
    gi = jax.grad(loss_of(int8_batch))(params)
    gd = jax.grad(loss_of(dense_batch))(params)
    for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(gi)[0],
                            jax.tree_util.tree_leaves(gd)):
        assert np.all(np.isfinite(np.asarray(a))), \
            jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))
