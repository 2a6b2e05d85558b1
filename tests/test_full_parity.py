"""Full-model forward parity: flax Up-Down VQA == torch twin, end to end.

Builds the complete reference pipeline in torch *in the test* (embedding ->
GRU last-padded-step -> top-down attention -> weighted features -> FCNet
joint -> weight-normed classifier, per the documented math), copies every
parameter into our flax model, and checks the answer logits match. This is
the accuracy-parity argument of SURVEY.md section 7.3 at the whole-model
level, without needing the real dataset.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
from torch.nn.utils.weight_norm import weight_norm

import jax
import jax.numpy as jnp

from vqa_tpu.models.wrapper import set_model

NTOKEN = 60
EMBED = 20
HIDDEN = 28
V_DIM = 24
ANS = 11
OBJS = 7
Q_LEN = 6
B = 5


def t2n(t):
    # .copy() matters: jnp.asarray (and on this backend even jnp.array)
    # zero-copies aligned numpy views of torch parameters, so without it
    # torch's in-place optimizer updates would silently mutate "exported"
    # jax params (bit us in test_train_parity).
    return t.detach().numpy().copy()


def wn_params(lin):
    return {"v": t2n(lin.weight_v).T, "g": t2n(lin.weight_g).reshape(()),
            "b": t2n(lin.bias)}


class TorchFCNet(tnn.Module):
    """Reference FCNet twin (modules.py:13-60), eval mode."""

    def __init__(self, in_dim, out_dim, mid_dim=0, layer=1):
        super().__init__()
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
        self.main = tnn.Sequential(*layers)

    def forward(self, x):
        return self.main(x)

    def export(self):
        out = {}
        i = 0
        for m in self.main:
            if isinstance(m, tnn.Linear):
                out[f"fc{i}"] = wn_params(m)
                i += 1
        return out


class TorchUpDown(tnn.Module):
    """Reference BaseEncoder + BasePredictor twin (encoder.py:96-183,
    predictor.py:54-93) with MultiplyAttention (attention.py:55-86)."""

    def __init__(self):
        super().__init__()
        self.embedding = tnn.Embedding(NTOKEN + 1, EMBED, padding_idx=NTOKEN)
        self.q_rnn = tnn.GRU(input_size=EMBED, hidden_size=HIDDEN,
                             batch_first=True)
        self.att_wv = TorchFCNet(V_DIM, HIDDEN)
        self.att_wq = TorchFCNet(HIDDEN, HIDDEN)
        self.att_linear = weight_norm(tnn.Linear(HIDDEN, 1), dim=None)
        self.q_net = TorchFCNet(HIDDEN, HIDDEN)
        self.v_net = TorchFCNet(V_DIM, HIDDEN)
        self.classifier = TorchFCNet(HIDDEN, ANS, mid_dim=2 * HIDDEN, layer=2)

    def forward(self, img, q_tokens):
        q = self.embedding(q_tokens)
        out, _ = self.q_rnn(q)
        q = out[:, -1]                              # last padded step
        vp = self.att_wv(img)
        qp = self.att_wq(q).unsqueeze(1)
        att = torch.softmax(self.att_linear(vp * qp), 1)
        v = att * img
        q = self.q_net(q)
        v = self.v_net(v.sum(1))
        return self.classifier(q * v)


def export_params(ref: TorchUpDown):
    table = t2n(ref.embedding.weight)
    return {
        "encoder": {
            "embedding": {"table": table},
            "q_rnn": {
                "wi_l0": t2n(ref.q_rnn.weight_ih_l0).T,
                "bi_l0": t2n(ref.q_rnn.bias_ih_l0),
                "wh_l0": t2n(ref.q_rnn.weight_hh_l0).T,
                "bh_l0": t2n(ref.q_rnn.bias_hh_l0),
            },
            "attention": {
                "W_v": ref.att_wv.export(),
                "W_q": ref.att_wq.export(),
                "linear": wn_params(ref.att_linear),
            },
            "q_net": ref.q_net.export(),
        },
        "predictor": {
            "v_net": ref.v_net.export(),
            "classifier": ref.classifier.export(),
        },
    }


def test_updown_full_forward_matches_torch(rng):
    torch.manual_seed(7)
    ref = TorchUpDown().eval()

    model = set_model(encoder_type="base", predictor_type="base",
                      decoder_type="none", ntoken=NTOKEN, v_dim=V_DIM,
                      embed_dim=EMBED, hidden_dim=HIDDEN,
                      decoder_hidden_dim=16, ans_dim=ANS, c_len=8,
                      dropout=0.2, att_type="new")

    img = rng.standard_normal((B, OBJS, V_DIM)).astype(np.float32)
    q = rng.integers(0, NTOKEN, (B, Q_LEN))
    batch = {"img": jnp.asarray(img), "q": jnp.asarray(q)}

    with torch.no_grad():
        want = t2n(ref(torch.from_numpy(img), torch.from_numpy(q)))

    got, _ = model.apply({"params": export_params(ref)}, batch)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_updown_concat_attention_matches_torch(rng):
    """Same pipeline with ConcatAttention (att_type='base')."""
    torch.manual_seed(8)

    class TorchConcat(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc0 = weight_norm(tnn.Linear(V_DIM + HIDDEN, HIDDEN), dim=None)
            self.fc1 = weight_norm(tnn.Linear(HIDDEN, 1), dim=None)

        def forward(self, v, q):
            q = q.unsqueeze(1).repeat(1, v.size(1), 1)
            x = torch.relu(self.fc0(torch.cat((v, q), 2)))
            return torch.softmax(self.fc1(x), 1)

    ref = TorchUpDown().eval()
    concat = TorchConcat().eval()

    model = set_model(encoder_type="base", predictor_type="base",
                      decoder_type="none", ntoken=NTOKEN, v_dim=V_DIM,
                      embed_dim=EMBED, hidden_dim=HIDDEN,
                      decoder_hidden_dim=16, ans_dim=ANS, c_len=8,
                      dropout=0.2, att_type="base")

    params = export_params(ref)
    params["encoder"]["attention"] = {
        "fc0": wn_params(concat.fc0),
        "fc1": wn_params(concat.fc1),
    }

    img = rng.standard_normal((B, OBJS, V_DIM)).astype(np.float32)
    q_tok = rng.integers(0, NTOKEN, (B, Q_LEN))

    with torch.no_grad():
        q = ref.embedding(torch.from_numpy(q_tok))
        out, _ = ref.q_rnn(q)
        qh = out[:, -1]
        att = concat(torch.from_numpy(img), qh)
        v = att * torch.from_numpy(img)
        want = t2n(ref.classifier(ref.q_net(qh) * ref.v_net(v.sum(1))))

    got, _ = model.apply({"params": params},
                         {"img": jnp.asarray(img), "q": jnp.asarray(q_tok)})
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_base_decoder_step_matches_torch(rng):
    """BaseDecoder.decode == torch GRUCell + ConcatAttention chain
    (generator.py:177-190), eval mode."""
    from vqa_tpu.models.generator import BaseDecoder

    DEC_H = 18
    torch.manual_seed(9)
    cell = tnn.GRUCell(input_size=EMBED + V_DIM, hidden_size=DEC_H)
    att_fc0 = weight_norm(tnn.Linear(V_DIM + DEC_H, DEC_H), dim=None)
    att_fc1 = weight_norm(tnn.Linear(DEC_H, 1), dim=None)
    fcnet = tnn.Linear(DEC_H, NTOKEN)

    dec = BaseDecoder(ntoken=NTOKEN, hidden_dim=DEC_H, max_len=8,
                      dropout=0.5, rnn_type="GRU", att_type="base")
    v = rng.standard_normal((B, OBJS, V_DIM)).astype(np.float32)
    prev = rng.standard_normal((B, EMBED)).astype(np.float32)
    h0 = np.zeros((B, DEC_H), np.float32)

    params = {
        "rnn": {"wi": t2n(cell.weight_ih).T, "bi": t2n(cell.bias_ih),
                "wh": t2n(cell.weight_hh).T, "bh": t2n(cell.bias_hh)},
        "attention": {"fc0": wn_params(att_fc0), "fc1": wn_params(att_fc1)},
        "fcnet": {"w": t2n(fcnet.weight).T, "b": t2n(fcnet.bias)},
    }

    def fn(mdl, v, v_mean, prev, h):
        return mdl.decode(v=v, v_mean=v_mean, prev=prev, h=h,
                          deterministic=True)

    h_list, logits, att = dec.apply(
        {"params": params}, jnp.asarray(v), jnp.asarray(v.mean(1)),
        jnp.asarray(prev), [jnp.asarray(h0)], method=fn)

    with torch.no_grad():
        tv = torch.from_numpy(v)
        th = torch.from_numpy(h0)
        q = th.unsqueeze(1).repeat(1, OBJS, 1)
        logits_att = att_fc1(torch.relu(att_fc0(torch.cat((tv, q), 2))))
        t_att = torch.softmax(logits_att, 1)
        att_v = (t_att * tv).sum(1)
        h_new = cell(torch.cat([torch.from_numpy(prev), att_v], dim=1), th)
        want = fcnet(h_new)

    np.testing.assert_allclose(np.asarray(att), t2n(t_att), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_list[0]), t2n(h_new), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(logits), t2n(want), rtol=1e-4,
                               atol=1e-5)


def test_masked_teacher_forcing_equals_shrinking_batch_loop(rng):
    """Our fixed-shape masked decoder forward == the reference's
    length-sorted shrinking-batch loop (generator.py:66-120), emulated
    exactly in torch: identical per-position logits and identical packed-CE
    loss. This closes the loop on the TPU-first redesign of the caption
    training path (SURVEY.md section 5.7)."""
    from vqa_tpu.models.generator import BaseDecoder
    from vqa_tpu.models.wrapper import ce_for_language_model

    DEC_H, MAX_LEN = 18, 6
    torch.manual_seed(10)
    cell = tnn.GRUCell(input_size=EMBED + V_DIM, hidden_size=DEC_H)
    att_fc0 = weight_norm(tnn.Linear(V_DIM + DEC_H, DEC_H), dim=None)
    att_fc1 = weight_norm(tnn.Linear(DEC_H, 1), dim=None)
    fcnet = tnn.Linear(DEC_H, NTOKEN)

    dec = BaseDecoder(ntoken=NTOKEN, hidden_dim=DEC_H, max_len=MAX_LEN,
                      dropout=0.5, rnn_type="GRU", att_type="base")
    params = {"params": {
        "rnn": {"wi": t2n(cell.weight_ih).T, "bi": t2n(cell.bias_ih),
                "wh": t2n(cell.weight_hh).T, "bh": t2n(cell.bias_hh)},
        "attention": {"fc0": wn_params(att_fc0), "fc1": wn_params(att_fc1)},
        "fcnet": {"w": t2n(fcnet.weight).T, "b": t2n(fcnet.bias)},
    }}

    v = rng.standard_normal((B, OBJS, V_DIM)).astype(np.float32)
    c_tok = rng.integers(0, NTOKEN, (B, MAX_LEN))
    cap_len = np.array([6, 3, 5, 2, 4])
    # caption embeddings: a fixed random table lookup shared by both sides
    table = rng.standard_normal((NTOKEN, EMBED)).astype(np.float32)
    c_emb = table[c_tok]

    # ours: full batch + mask
    out = dec.apply(params, {"v": jnp.asarray(v), "c": jnp.asarray(c_emb),
                             "cap_len": jnp.asarray(cap_len),
                             "c_target": jnp.asarray(c_tok)})
    ours_loss = float(ce_for_language_model(out["predict"], out["target"],
                                            out["mask"]))

    # torch: the reference's shrinking-batch loop, bit for bit
    with torch.no_grad():
        order = np.argsort(-cap_len, kind="stable")
        vs = torch.from_numpy(v[order])
        cs = torch.from_numpy(c_emb[order])
        ts = torch.from_numpy(c_tok[order])
        lens = cap_len[order]
        decode_len = lens - 1
        h = torch.zeros(B, DEC_H)
        outputs = torch.zeros(B, MAX_LEN, NTOKEN)
        for t in range(int(decode_len.max())):
            bt = int((decode_len > t).sum())
            ht = h[:bt]
            q = ht.unsqueeze(1).repeat(1, OBJS, 1)
            att = torch.softmax(att_fc1(torch.relu(att_fc0(
                torch.cat((vs[:bt], q), 2)))), 1)
            att_v = (att * vs[:bt]).sum(1)
            h = cell(torch.cat([cs[:bt, t, :], att_v], dim=1), ht)
            outputs[:bt, t, :] = fcnet(h)
        # packed positions + CE like wrapper.py:32-36 / generator.py:117-120
        rows, tgts = [], []
        for i in range(B):
            rows.append(outputs[i, :decode_len[i]])
            tgts.append(ts[i, 1:1 + decode_len[i]])
        want_loss = float(torch.nn.functional.cross_entropy(
            torch.cat(rows), torch.cat(tgts)))

        # per-position logits must agree too (unsort ours)
        ours_pred = np.asarray(out["predict"])[order]
        for i in range(B):
            np.testing.assert_allclose(ours_pred[i, :decode_len[i]],
                                       outputs[i, :decode_len[i]].numpy(),
                                       rtol=1e-4, atol=1e-4)

    np.testing.assert_allclose(ours_loss, want_loss, rtol=1e-5)
