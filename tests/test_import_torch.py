"""Reference-checkpoint import (vqa_tpu/tools/import_torch.py).

Builds torch modules whose ``state_dict()`` keys replicate the reference
Wrapper's exact naming (`/root/reference/modules/*`: FCNet ``main``
Sequentials *including* the Dropout slots, ConcatAttention ``sequence``,
``q_rnn.rnn`` nesting, weight-normed Linears), converts, and checks

1. the imported tree is structurally identical to our ``model.init`` tree
   (every reference parameter lands at the right path/shape), and
2. our model's forward with the imported parameters reproduces the torch
   model's logits (end-to-end value parity for the imported weights).
"""

import numpy as np
import torch
import torch.nn as tnn
from torch.nn.utils.weight_norm import weight_norm

import jax
import jax.numpy as jnp

from vqa_tpu.models.wrapper import set_model
from vqa_tpu.tools.import_torch import import_reference_state_dict

NTOKEN, EMBED, HIDDEN, V_DIM, ANS, OBJS, Q_LEN, B = 40, 12, 16, 24, 10, 6, 5, 3


def ref_fcnet(in_dim, out_dim, mid_dim=0, layer=1):
    """Sequential with the reference's exact slot layout (modules.py:33-57)."""
    layers = []
    if layer == 1 or mid_dim == 0:
        layers.append(weight_norm(tnn.Linear(in_dim, out_dim), dim=None))
    else:
        layers.append(weight_norm(tnn.Linear(in_dim, mid_dim), dim=None))
        layers += [tnn.ReLU(), tnn.Dropout(0.0)]
        for _ in range(layer - 2):
            layers.append(weight_norm(tnn.Linear(mid_dim, mid_dim), dim=None))
            layers += [tnn.ReLU(), tnn.Dropout(0.0)]
        layers.append(weight_norm(tnn.Linear(mid_dim, out_dim), dim=None))
    layers.append(tnn.ReLU())
    m = tnn.Module()
    m.main = tnn.Sequential(*layers)
    m.forward = m.main.forward
    return m


class RefMultiplyAttention(tnn.Module):
    """attention.py:55-86 naming: W_v / W_q / linear."""

    def __init__(self):
        super().__init__()
        self.W_v = ref_fcnet(V_DIM, HIDDEN)
        self.W_q = ref_fcnet(HIDDEN, HIDDEN)
        self.linear = weight_norm(tnn.Linear(HIDDEN, 1), dim=None)

    def forward(self, v, q):
        joint = self.W_v.main(v) * self.W_q.main(q).unsqueeze(1)
        return torch.softmax(self.linear(joint), 1)


class RefQRnn(tnn.Module):
    """SentenceEmbedding naming: the GRU nests as ``.rnn`` (modules.py:123)."""

    def __init__(self):
        super().__init__()
        self.rnn = tnn.GRU(input_size=EMBED, hidden_size=HIDDEN,
                           batch_first=True)

    def forward(self, x):
        out, _ = self.rnn(x)
        return out[:, -1]


class RefEncoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.embedding = tnn.Embedding(NTOKEN + 1, EMBED, padding_idx=NTOKEN)
        self.q_rnn = RefQRnn()
        self.attention = RefMultiplyAttention()
        self.q_net = ref_fcnet(HIDDEN, HIDDEN)


class RefPredictor(tnn.Module):
    def __init__(self):
        super().__init__()
        self.v_net = ref_fcnet(V_DIM, HIDDEN)
        self.classifier = ref_fcnet(HIDDEN, ANS, mid_dim=2 * HIDDEN, layer=2)


class RefWrapper(tnn.Module):
    """state_dict() keys match the reference Wrapper for the Up-Down VQA
    config (encoder.* / predictor.*)."""

    def __init__(self):
        super().__init__()
        self.encoder = RefEncoder()
        self.predictor = RefPredictor()

    def forward(self, img, q_tok):
        e = self.encoder
        qh = e.q_rnn(e.embedding(q_tok))
        att = e.attention(img, qh)
        v = att * img
        joint = e.q_net.main(qh) * self.predictor.v_net.main(v.sum(1))
        return self.predictor.classifier.main(joint)


def test_import_updown_state_dict_end_to_end(rng):
    torch.manual_seed(17)
    ref = RefWrapper().eval()
    sd = ref.state_dict()

    params, unmapped = import_reference_state_dict(sd)
    assert unmapped == [], unmapped

    model = set_model(encoder_type="base", predictor_type="base",
                      decoder_type="none", ntoken=NTOKEN, v_dim=V_DIM,
                      embed_dim=EMBED, hidden_dim=HIDDEN, ans_dim=ANS,
                      dropout=0.0, att_type="new", att_dropout=0.0)
    img = rng.standard_normal((B, OBJS, V_DIM)).astype(np.float32)
    q_tok = rng.integers(0, NTOKEN, (B, Q_LEN)).astype(np.int32)
    batch = {"img": jnp.asarray(img), "q": jnp.asarray(q_tok)}

    init_params = model.init(jax.random.key(0), batch)["params"]
    # 1. structural identity: every reference parameter landed somewhere
    #    our model declares, with the declared shape
    want_paths = {tuple(p): np.shape(v) for p, v in
                  jax.tree_util.tree_flatten_with_path(init_params)[0]}
    got_paths = {tuple(p): np.shape(v) for p, v in
                 jax.tree_util.tree_flatten_with_path(
                     jax.tree_util.tree_map(jnp.asarray, params))[0]}
    assert want_paths == got_paths

    # 2. forward value parity
    with torch.no_grad():
        want = ref(torch.from_numpy(img), torch.from_numpy(q_tok)).numpy()
    got, _ = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, batch)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_import_cli_subprocess(tmp_path):
    """python -m vqa_tpu.tools.import_torch --src .pt --dst .ckpt"""
    import os
    import subprocess
    import sys
    torch.manual_seed(29)
    src, dst = str(tmp_path / "e.pt"), str(tmp_path / "e.ckpt")
    torch.save(RefWrapper().state_dict(), src)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "vqa_tpu.tools.import_torch",
         "--src", src, "--dst", dst],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert os.path.exists(dst)


def test_import_butd_generator_structure():
    """BUTD decoder keys (two GRUCells, h1/h2 Linears, MultiplyAttention)
    land on our BUTDDecoder init structure (generator.py:193-267 naming)."""
    torch.manual_seed(37)
    H = 16
    gen = tnn.Module()
    gen.word_rnn = tnn.GRUCell(input_size=H + V_DIM + EMBED, hidden_size=H)
    gen.language_rnn = tnn.GRUCell(input_size=V_DIM + H, hidden_size=H)
    att = tnn.Module()
    att.W_v = ref_fcnet(V_DIM, H)
    att.W_q = ref_fcnet(H, H)
    att.linear = weight_norm(tnn.Linear(H, 1), dim=None)
    gen.attention = att
    gen.h1_fcnet = tnn.Linear(H, H)
    gen.h2_fcnet = tnn.Linear(H, NTOKEN)
    wrap = tnn.Module()
    wrap.generator = gen
    params, unmapped = import_reference_state_dict(wrap.state_dict())
    assert unmapped == []

    from vqa_tpu.models.generator import BUTDDecoder
    dec = BUTDDecoder(ntoken=NTOKEN, hidden_dim=H, max_len=6, dropout=0.0,
                      att_type="new", att_dropout=0.0)
    import jax.numpy as jnp
    embed = {"v": jnp.zeros((2, OBJS, V_DIM)),
             "c": jnp.zeros((2, 6, EMBED)),
             "c_target": jnp.zeros((2, 6), jnp.int32),
             "cap_len": jnp.full((2,), 6, jnp.int32)}
    init = dec.init(jax.random.key(0), embed)["params"]
    want = {tuple(p): np.shape(v) for p, v in
            jax.tree_util.tree_flatten_with_path(init)[0]}
    got = {tuple(p): np.shape(v) for p, v in
           jax.tree_util.tree_flatten_with_path(params["generator"])[0]}
    assert want == got


def test_import_lrelu_net():
    """Reference LReLUNet (bias-free Linear in a Sequential) maps to our
    module-level ``w`` — not a collapsed ``fc0`` level (q-cap predictor)."""
    torch.manual_seed(31)
    pred = tnn.Module()
    vnet = tnn.Module()
    vnet.main = tnn.Sequential(tnn.Linear(V_DIM, HIDDEN, bias=False),
                               tnn.LeakyReLU(0.01))
    pred.v_net = vnet
    wrap = tnn.Module()
    wrap.predictor = pred
    params, unmapped = import_reference_state_dict(wrap.state_dict())
    assert unmapped == []
    np.testing.assert_array_equal(
        params["predictor"]["v_net"]["w"],
        wrap.state_dict()["predictor.v_net.main.0.weight"].numpy().T)


def test_convert_file_roundtrip(rng, tmp_path):
    """torch.save(.pt) -> convert() -> load_params reads the same tree."""
    from vqa_tpu.tools.import_torch import convert
    from vqa_tpu.training.checkpoint import load_params
    torch.manual_seed(23)
    ref = RefWrapper()
    src, dst = str(tmp_path / "epoch_0.pt"), str(tmp_path / "imported.ckpt")
    torch.save(ref.state_dict(), src)
    unmapped = convert(src, dst)
    assert unmapped == []
    loaded = load_params(dst)
    want, _ = import_reference_state_dict(ref.state_dict())
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(loaded)[0],
            jax.tree_util.tree_flatten_with_path(want)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_import_decoder_and_log_vars():
    """GRUCell / plain-Linear / ConcatAttention-sequence / log_vars keys
    map to the generator tree (value spot-checks incl. transposes)."""
    torch.manual_seed(19)
    H, NT = 8, 20
    dec = tnn.Module()
    dec.rnn = tnn.GRUCell(input_size=EMBED + V_DIM, hidden_size=H)
    att = tnn.Module()
    att.sequence = tnn.Sequential(
        weight_norm(tnn.Linear(V_DIM + H, H), dim=None), tnn.ReLU(),
        weight_norm(tnn.Linear(H, 1), dim=None))
    dec.attention = att
    dec.fcnet = tnn.Linear(H, NT)
    wrap = tnn.Module()
    wrap.generator = dec
    wrap.log_vars = tnn.Parameter(torch.zeros(2))
    sd = wrap.state_dict()

    params, unmapped = import_reference_state_dict(sd)
    assert unmapped == []
    gen = params["generator"]
    np.testing.assert_array_equal(
        gen["rnn"]["wi"], sd["generator.rnn.weight_ih"].numpy().T)
    np.testing.assert_array_equal(
        gen["rnn"]["bh"], sd["generator.rnn.bias_hh"].numpy())
    np.testing.assert_array_equal(
        gen["attention"]["fc0"]["v"],
        sd["generator.attention.sequence.0.weight_v"].numpy().T)
    assert "fc1" in gen["attention"]
    np.testing.assert_array_equal(
        gen["fcnet"]["w"], sd["generator.fcnet.weight"].numpy().T)
    np.testing.assert_array_equal(params["log_vars"], np.zeros(2))
