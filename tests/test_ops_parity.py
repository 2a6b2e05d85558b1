"""Numerical parity of the op library against torch semantics.

The reference is pure PyTorch; these tests build the equivalent torch modules
*in the test* (from the documented math, not by importing the reference) and
check that our flax ops produce identical outputs once weights are copied.
Covers: weight-norm Linear (dim=None), FCNet, GRU/LSTM SentenceEmbedding,
Concat/Multiply attention, DotProduct, and the GCN label-bias gather.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
from torch.nn.utils.weight_norm import weight_norm

import jax
import jax.numpy as jnp

from vqa_tpu.ops.linear import WNDense, FCNet, LReLUNet, DotProduct
from vqa_tpu.ops.rnn import SentenceEmbedding
from vqa_tpu.ops.attention import ConcatAttention, MultiplyAttention
from vqa_tpu.ops.gcn import label_bias_sum

TOL = dict(rtol=1e-5, atol=1e-5)


def t2n(t):
    return t.detach().numpy()


def test_wndense_matches_torch_weight_norm(rng):
    torch.manual_seed(0)
    lin = weight_norm(tnn.Linear(16, 8), dim=None)
    x = rng.standard_normal((4, 16)).astype(np.float32)

    model = WNDense(8)
    params = model.init(jax.random.key(0), jnp.asarray(x))
    params = {"params": {
        "v": t2n(lin.weight_v).T,
        "g": t2n(lin.weight_g).reshape(()),
        "b": t2n(lin.bias),
    }}
    got = model.apply(params, jnp.asarray(x))
    want = t2n(lin(torch.from_numpy(x)))
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def _fcnet_torch(in_dim, out_dim, mid_dim=0, layer=1):
    """Torch twin of reference FCNet (modules.py:13-60), eval mode."""
    layers = []
    if layer == 1 or mid_dim == 0:
        layers.append(weight_norm(tnn.Linear(in_dim, out_dim), dim=None))
    else:
        layers.append(weight_norm(tnn.Linear(in_dim, mid_dim), dim=None))
        layers.append(tnn.ReLU())
        for _ in range(layer - 2):
            layers.append(weight_norm(tnn.Linear(mid_dim, mid_dim), dim=None))
            layers.append(tnn.ReLU())
        layers.append(weight_norm(tnn.Linear(mid_dim, out_dim), dim=None))
    layers.append(tnn.ReLU())
    return tnn.Sequential(*layers)


def _copy_fcnet(seq):
    """Extract {fcN: {v,g,b}} from the torch twin."""
    out = {}
    idx = 0
    for m in seq:
        if isinstance(m, tnn.Linear):
            out[f"fc{idx}"] = {
                "v": t2n(m.weight_v).T,
                "g": t2n(m.weight_g).reshape(()),
                "b": t2n(m.bias),
            }
            idx += 1
    return out


@pytest.mark.parametrize("layer,mid", [(1, 0), (2, 32), (3, 32)])
def test_fcnet_matches_torch(rng, layer, mid):
    torch.manual_seed(1)
    ref = _fcnet_torch(16, 8, mid, layer).eval()
    x = rng.standard_normal((4, 16)).astype(np.float32)

    model = FCNet(out_dim=8, mid_dim=mid, layer=layer)
    model.init(jax.random.key(0), jnp.asarray(x))
    got = model.apply({"params": _copy_fcnet(ref)}, jnp.asarray(x))
    want = t2n(ref(torch.from_numpy(x)))
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


@pytest.mark.parametrize("rnn_type", ["GRU", "LSTM"])
def test_sentence_embedding_matches_torch(rng, rnn_type):
    torch.manual_seed(2)
    in_dim, hid, t_len = 12, 16, 10
    cls = tnn.GRU if rnn_type == "GRU" else tnn.LSTM
    ref = cls(input_size=in_dim, hidden_size=hid, num_layers=1, batch_first=True)
    x = rng.standard_normal((5, t_len, in_dim)).astype(np.float32)

    model = SentenceEmbedding(hidden_dim=hid, rnn_type=rnn_type)
    model.init(jax.random.key(0), jnp.asarray(x))
    params = {"params": {
        "wi_l0": t2n(ref.weight_ih_l0).T,
        "bi_l0": t2n(ref.bias_ih_l0),
        "wh_l0": t2n(ref.weight_hh_l0).T,
        "bh_l0": t2n(ref.bias_hh_l0),
    }}
    got_all = model.apply(params, jnp.asarray(x), method="forward_all")
    got_last = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        want_all, _ = ref(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(got_all), t2n(want_all), rtol=1e-4, atol=1e-5)
    # forward() == last padded step output (reference modules.py:156-159)
    np.testing.assert_allclose(np.asarray(got_last), t2n(want_all)[:, -1], rtol=1e-4, atol=1e-5)


def test_bidirectional_gru_matches_torch(rng):
    torch.manual_seed(3)
    in_dim, hid, t_len = 8, 12, 6
    ref = tnn.GRU(input_size=in_dim, hidden_size=hid, batch_first=True,
                  bidirectional=True)
    x = rng.standard_normal((3, t_len, in_dim)).astype(np.float32)

    model = SentenceEmbedding(hidden_dim=hid, rnn_type="GRU", bidirect=True)
    model.init(jax.random.key(0), jnp.asarray(x))
    params = {"params": {
        "wi_l0": t2n(ref.weight_ih_l0).T,
        "bi_l0": t2n(ref.bias_ih_l0),
        "wh_l0": t2n(ref.weight_hh_l0).T,
        "bh_l0": t2n(ref.bias_hh_l0),
        "wi_l0_reverse": t2n(ref.weight_ih_l0_reverse).T,
        "bi_l0_reverse": t2n(ref.bias_ih_l0_reverse),
        "wh_l0_reverse": t2n(ref.weight_hh_l0_reverse).T,
        "bh_l0_reverse": t2n(ref.bias_hh_l0_reverse),
    }}
    got = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        all_out, _ = ref(torch.from_numpy(x))
    want = np.concatenate([t2n(all_out)[:, -1, :hid], t2n(all_out)[:, 0, hid:]], axis=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


class _TorchConcatAtt(tnn.Module):
    """Torch twin of reference ConcatAttention (attention.py:18-51)."""

    def __init__(self, v_dim, q_dim, hidden_dim):
        super().__init__()
        self.sequence = tnn.Sequential(
            weight_norm(tnn.Linear(v_dim + q_dim, hidden_dim), dim=None),
            tnn.ReLU(),
            weight_norm(tnn.Linear(hidden_dim, 1), dim=None),
        )

    def forward(self, v, q):
        q = q.unsqueeze(1).repeat(1, v.size(1), 1)
        return torch.softmax(self.sequence(torch.cat((v, q), 2)), 1)


def test_concat_attention_matches_torch(rng):
    torch.manual_seed(4)
    ref = _TorchConcatAtt(32, 16, 24).eval()
    v = rng.standard_normal((2, 9, 32)).astype(np.float32)
    q = rng.standard_normal((2, 16)).astype(np.float32)

    model = ConcatAttention(hidden_dim=24)
    model.init(jax.random.key(0), jnp.asarray(v), jnp.asarray(q))
    lins = [m for m in ref.sequence if isinstance(m, tnn.Linear)]
    params = {"params": {
        "fc0": {"v": t2n(lins[0].weight_v).T, "g": t2n(lins[0].weight_g).reshape(()),
                "b": t2n(lins[0].bias)},
        "fc1": {"v": t2n(lins[1].weight_v).T, "g": t2n(lins[1].weight_g).reshape(()),
                "b": t2n(lins[1].bias)},
    }}
    got = model.apply(params, jnp.asarray(v), jnp.asarray(q))
    want = t2n(ref(torch.from_numpy(v), torch.from_numpy(q)))
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


class _TorchMultiplyAtt(tnn.Module):
    """Torch twin of reference MultiplyAttention (attention.py:55-86), eval mode."""

    def __init__(self, v_dim, q_dim, hidden_dim):
        super().__init__()
        self.W_v = _fcnet_torch(v_dim, hidden_dim)
        self.W_q = _fcnet_torch(q_dim, hidden_dim)
        self.linear = weight_norm(tnn.Linear(hidden_dim, 1), dim=None)

    def forward(self, v, q):
        vp = self.W_v(v)
        qp = self.W_q(q).unsqueeze(1)
        return torch.softmax(self.linear(vp * qp), 1)


def test_multiply_attention_matches_torch(rng):
    torch.manual_seed(5)
    ref = _TorchMultiplyAtt(32, 16, 24).eval()
    v = rng.standard_normal((2, 9, 32)).astype(np.float32)
    q = rng.standard_normal((2, 16)).astype(np.float32)

    model = MultiplyAttention(hidden_dim=24)
    model.init(jax.random.key(0), jnp.asarray(v), jnp.asarray(q))
    params = {"params": {
        "W_v": _copy_fcnet(ref.W_v),
        "W_q": _copy_fcnet(ref.W_q),
        "linear": {"v": t2n(ref.linear.weight_v).T,
                   "g": t2n(ref.linear.weight_g).reshape(()),
                   "b": t2n(ref.linear.bias)},
    }}
    got = model.apply(params, jnp.asarray(v), jnp.asarray(q))
    want = t2n(ref(torch.from_numpy(v), torch.from_numpy(q)))
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_multiply_attention_fold_matches_joint(rng):
    """The deterministic fold — (vp*qp)@w computed as vp@(qp*w), bias
    dropped under the softmax's shift invariance — equals the explicit
    joint/dropout form, in both plain and beam (q [B, k, H]) modes."""
    B, N, D, H, K = 3, 9, 20, 16, 4
    v = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    qk = jnp.asarray(rng.standard_normal((B, K, H)).astype(np.float32))
    fold = MultiplyAttention(hidden_dim=H, dropout=0.3)
    joint = MultiplyAttention(hidden_dim=H, dropout=0.0)
    params = fold.init(jax.random.key(1), v, q)
    rngs = {"dropout": jax.random.key(2)}
    for query in (q, qk):
        got = fold.apply(params, v, query, deterministic=True)
        want = joint.apply(params, v, query, deterministic=False, rngs=rngs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=1e-6)


def test_mixed_dtype_init_decoder_model(rng):
    """f32 params + bf16 features must init/apply cleanly through the
    decoder's nn.scan (regression: forcing the attention fold's einsum to
    vp.dtype flipped the scan carry dtype mid-graph and broke init)."""
    from vqa_tpu.models.wrapper import set_model
    B, NOBJ, VDIM, C_LEN, NTOKEN = 4, 9, 32, 6, 50
    batch = {
        "img": jnp.asarray(rng.standard_normal((B, NOBJ, VDIM))
                           .astype(np.float32)).astype(jnp.bfloat16),
        "q": jnp.asarray(rng.integers(0, NTOKEN, (B, 10)), jnp.int32),
        "c": jnp.asarray(rng.integers(0, NTOKEN, (B, C_LEN)), jnp.int32),
        "cap_len": jnp.asarray(np.full(B, C_LEN), jnp.int32),
    }
    model = set_model(encoder_type="base", predictor_type="none",
                      decoder_type="butd", ntoken=NTOKEN, v_dim=VDIM,
                      embed_dim=8, hidden_dim=16, decoder_hidden_dim=16,
                      att_type="new", c_len=C_LEN)
    params = model.init(jax.random.key(3), batch)
    p16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    _, cap = model.apply(p16, batch)
    assert np.isfinite(np.asarray(cap["predict"], np.float32)).all()


def test_dot_product_matches_torch(rng):
    torch.manual_seed(6)
    wa, wb = tnn.Linear(8, 6), tnn.Linear(10, 6)
    a = rng.standard_normal((2, 5, 8)).astype(np.float32)
    b = rng.standard_normal((2, 7, 10)).astype(np.float32)

    model = DotProduct(out_dim=6)
    model.init(jax.random.key(0), jnp.asarray(a), jnp.asarray(b))
    params = {"params": {
        "wa": t2n(wa.weight).T, "ba": t2n(wa.bias),
        "wb": t2n(wb.weight).T, "bb": t2n(wb.bias),
    }}
    got = model.apply(params, jnp.asarray(a), jnp.asarray(b))
    want = t2n(torch.bmm(wa(torch.from_numpy(a)),
                         wb(torch.from_numpy(b)).transpose(1, 2)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_lrelu_net(rng):
    torch.manual_seed(7)
    lin = tnn.Linear(8, 6, bias=False)
    x = rng.standard_normal((4, 8)).astype(np.float32)
    model = LReLUNet(out_dim=6, neg_slope=0.01)
    model.init(jax.random.key(0), jnp.asarray(x))
    got = model.apply({"params": {"w": t2n(lin.weight).T}}, jnp.asarray(x))
    want = t2n(torch.nn.functional.leaky_relu(lin(torch.from_numpy(x)), 0.01))
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_label_bias_sum_matches_gather(rng):
    graph = rng.integers(0, 12, size=(3, 9, 9))
    bias = rng.standard_normal((12, 7)).astype(np.float32)
    got = label_bias_sum(jnp.asarray(graph), jnp.asarray(bias), 12)
    want = bias[graph, :].sum(axis=2)  # the reference's host-side gather
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_two_layer_gru_matches_torch(rng):
    """Multi-layer path (rnn_layer=2) against torch."""
    torch.manual_seed(11)
    in_dim, hid, t_len = 10, 14, 7
    ref = tnn.GRU(input_size=in_dim, hidden_size=hid, num_layers=2,
                  batch_first=True)
    x = rng.standard_normal((4, t_len, in_dim)).astype(np.float32)
    model = SentenceEmbedding(hidden_dim=hid, rnn_layer=2, rnn_type="GRU")
    model.init(jax.random.key(0), jnp.asarray(x))
    params = {"params": {
        "wi_l0": t2n(ref.weight_ih_l0).T, "bi_l0": t2n(ref.bias_ih_l0),
        "wh_l0": t2n(ref.weight_hh_l0).T, "bh_l0": t2n(ref.bias_hh_l0),
        "wi_l1": t2n(ref.weight_ih_l1).T, "bi_l1": t2n(ref.bias_ih_l1),
        "wh_l1": t2n(ref.weight_hh_l1).T, "bh_l1": t2n(ref.bias_hh_l1),
    }}
    got = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(got), t2n(want)[:, -1],
                               rtol=1e-4, atol=1e-5)
