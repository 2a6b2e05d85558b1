"""Training-dynamics parity: N-step optimization trajectories vs torch twins.

The forward-parity suite (test_full_parity.py) proves our logits match the
reference math; this file proves the *training dynamics* match too — the only
obtainable evidence for the 55.8 All-accuracy gate in an environment without
the real dataset. Each test runs the same initial parameters and the same
batch sequence through

  torch:  loss.backward() -> nn.utils.clip_grad_norm_(0.25)
          -> torch.optim.Adamax (param groups, per-task LR) -> StepLR
          (`/root/reference/train.py:55-59,100-113,133-136`)
  ours:   jax.value_and_grad through VQAModel.get_loss -> the optax chain
          from vqa_tpu.training.optim -> the real jitted make_train_step

and asserts the per-step loss trajectory and the final parameters agree.
Weight-norm backward (modules.py:38-55), Adamax epsilon/moment placement,
clip coefficient and StepLR epoch accounting are exactly where silent
accuracy drift would hide; these tests fail if any of them drifts.

Covered paths: pure optimizer (tensor-level), Up-Down VQA (encoder +
predictor), MTL with caption decoder + uncertainty log_vars, and ReGAT
(correlated GCN) — per VERDICT round-1 item 1.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
from torch.nn.utils.weight_norm import weight_norm

import jax
import jax.numpy as jnp
import optax

from vqa_tpu.models.wrapper import set_model
from vqa_tpu.training import optim as optim_lib
from vqa_tpu.training.state import TrainState, make_train_step

from test_full_parity import (
    TorchUpDown, TorchFCNet, export_params, wn_params, t2n,
    NTOKEN, EMBED, HIDDEN, V_DIM, ANS, OBJS, Q_LEN, B,
)

@pytest.fixture(autouse=True)
def x64():
    """Run every trajectory comparison in float64 (both frameworks): drift
    from a semantic mismatch survives any precision, f32 chaos does not."""
    with jax.enable_x64(True):
        yield


N_STEPS = 30
STEPS_PER_EPOCH = 5
LR, LR_VQA, LR_CAP = 2e-3, 4e-3, 3e-3
WARM_UP, STEP_SIZE, GAMMA = 1, 1, 0.5


# ---------------------------------------------------------------------------
# tensor-level: the optimizer chain itself
# ---------------------------------------------------------------------------

def test_adamax_chain_matches_torch_exactly(rng):
    """clip(0.25) + Adamax + lr on a raw tensor: near-bitwise over 60 steps,
    including steps whose gradient norm exceeds the clip threshold."""
    w0 = rng.standard_normal((13, 7)).astype(np.float32)
    grads = [rng.standard_normal((13, 7)).astype(np.float32)
             * (10.0 if i % 3 == 0 else 0.01) for i in range(60)]

    # torch
    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adamax([p], lr=LR)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        tnn.utils.clip_grad_norm_([p], 0.25)
        opt.step()

    # ours
    tx = optax.chain(optim_lib.clip_by_global_norm_torch(0.25),
                     optim_lib.scale_by_adamax_torch(),
                     optax.scale(-LR))
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params), t2n(p), rtol=1e-6, atol=1e-7)


def test_steplr_factor_matches_torch_schedule():
    """steplr_factor == torch StepLR stepped once per epoch after warm_up
    (reference train.py:133-136)."""
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adamax([p], lr=1.0)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=2, gamma=0.25)
    warm_up = 3
    for epoch in range(12):
        torch_lr = opt.param_groups[0]["lr"]
        ours = optim_lib.steplr_factor(epoch, warm_up, 2, 0.25)
        assert torch_lr == pytest.approx(ours), f"epoch {epoch}"
        if epoch >= warm_up:
            sched.step()


# ---------------------------------------------------------------------------
# shared harness
# ---------------------------------------------------------------------------

def run_torch_trajectory(model, groups, batches, loss_fn, lr_pairs,
                         n_steps=N_STEPS):
    """Reference recipe: Adamax param groups + clip 0.25 + per-epoch StepLR."""
    params = [{"params": g} if lr is None else {"params": g, "lr": lr}
              for g, lr in zip(groups, lr_pairs)]
    opt = torch.optim.Adamax(params, lr=LR)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=STEP_SIZE,
                                            gamma=GAMMA)
    losses = []
    for i in range(n_steps):
        loss = loss_fn(model, batches[i % len(batches)])
        opt.zero_grad()
        loss.backward()
        tnn.utils.clip_grad_norm_(
            [p for g in groups for p in g], 0.25)
        opt.step()
        losses.append(float(loss.detach()))
        if (i + 1) % STEPS_PER_EPOCH == 0:
            epoch = (i + 1) // STEPS_PER_EPOCH - 1
            if epoch >= WARM_UP:
                sched.step()
    return losses


def run_ours_trajectory(model, params0, batches, n_steps=N_STEPS,
                        lr_vqa=LR_VQA, lr_cap=LR_CAP):
    """The real production path: make_optimizer + make_train_step (jitted)."""
    tx = optim_lib.make_optimizer(lr=LR, lr_vqa=lr_vqa, lr_cap=lr_cap,
                                  max_norm=0.25, warm_up=WARM_UP,
                                  step_size=STEP_SIZE, gamma=GAMMA,
                                  steps_per_epoch=STEPS_PER_EPOCH)
    state = TrainState(params=params0, opt_state=tx.init(params0),
                       step=jnp.int32(0), rng=jax.random.key(0))
    step = make_train_step(model, tx)
    losses = []
    for i in range(n_steps):
        state, metrics = step(state, batches[i % len(batches)])
        losses.append(float(metrics["loss"]))
    return losses, state.params


def assert_tree_close(ours, want, rtol, atol, prefix=""):
    if isinstance(want, dict):
        assert set(ours) == set(want), f"{prefix}: keys {set(ours)} != {set(want)}"
        for k in want:
            assert_tree_close(ours[k], want[k], rtol, atol, f"{prefix}/{k}")
        return
    np.testing.assert_allclose(np.asarray(ours), want, rtol=rtol, atol=atol,
                               err_msg=prefix)


def tree_of(params):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), params)


def make_vqa_batches(rng, n=4, extra=()):
    """float64 batches: the trajectory comparison runs in f64 on both sides
    so that real semantic drift is distinguishable from f32 chaos (ReLU/max
    switching amplifies last-bit noise over N steps; gradients match to 1e-9
    in f32 but rarely-hit embedding rows drift ~1% by step 30)."""
    batches = []
    for _ in range(n):
        img = rng.standard_normal((B, OBJS, V_DIM))
        q = rng.integers(0, NTOKEN, (B, Q_LEN))
        a = (rng.random((B, ANS)) < 0.1).astype(np.float64) \
            * rng.choice([1/3, 2/3, 1.0], (B, ANS))
        b = {"img": img, "q": q, "a": a}
        if "c" in extra:
            b["c"] = rng.integers(0, NTOKEN, (B, MAX_LEN))
            b["cap_len"] = rng.integers(2, MAX_LEN + 1, (B,))
        if "graph" in extra:
            b["graph"] = rng.integers(0, 12, (B, OBJS, OBJS))
        batches.append(b)
    return batches


def to_jax(b):
    return {k: jnp.asarray(v) for k, v in b.items()}


# ---------------------------------------------------------------------------
# Up-Down VQA: encoder + predictor, param groups, StepLR
# ---------------------------------------------------------------------------

def torch_bce_loss(predict, target):
    """instance_bce_with_logits (reference wrapper.py:25-29)."""
    return F.binary_cross_entropy_with_logits(predict, target) * predict.size(1)


def test_updown_train_trajectory_matches_torch(rng):
    torch.manual_seed(7)
    ref = TorchUpDown().double().train()

    model = set_model(encoder_type="base", predictor_type="base",
                      decoder_type="none", ntoken=NTOKEN, v_dim=V_DIM,
                      embed_dim=EMBED, hidden_dim=HIDDEN,
                      decoder_hidden_dim=16, ans_dim=ANS, c_len=8,
                      dropout=0.0, att_type="new", att_dropout=0.0)

    batches = make_vqa_batches(rng)

    enc_params = (list(ref.embedding.parameters())
                  + list(ref.q_rnn.parameters())
                  + list(ref.att_wv.parameters())
                  + list(ref.att_wq.parameters())
                  + list(ref.att_linear.parameters())
                  + list(ref.q_net.parameters()))
    vqa_params = (list(ref.v_net.parameters())
                  + list(ref.classifier.parameters()))

    params0 = jax.tree_util.tree_map(
        jnp.asarray, export_params(ref))

    def loss_fn(m, b):
        predict = m(torch.from_numpy(b["img"]), torch.from_numpy(b["q"]))
        return torch_bce_loss(predict, torch.from_numpy(b["a"]))

    want_losses = run_torch_trajectory(
        ref, [enc_params, vqa_params], batches, loss_fn, [None, LR_VQA])
    ours_losses, params = run_ours_trajectory(
        model, params0, [to_jax(b) for b in batches])

    np.testing.assert_allclose(ours_losses, want_losses, rtol=1e-8,
                               err_msg="loss trajectory diverged")
    assert_tree_close(tree_of(params), export_params(ref),
                      rtol=1e-6, atol=5e-8, prefix="final params")


# ---------------------------------------------------------------------------
# MTL: encoder + predictor + caption decoder + uncertainty log_vars
# ---------------------------------------------------------------------------

DEC_H = 18
MAX_LEN = 6


class TorchConcatAtt(tnn.Module):
    """ConcatAttention twin (reference attention.py:18-51), hidden_dim=dim."""

    def __init__(self, v_dim, q_dim, hidden):
        super().__init__()
        self.fc0 = weight_norm(tnn.Linear(v_dim + q_dim, hidden), dim=None)
        self.fc1 = weight_norm(tnn.Linear(hidden, 1), dim=None)

    def forward(self, v, q):
        q = q.unsqueeze(1).repeat(1, v.size(1), 1)
        return torch.softmax(self.fc1(torch.relu(
            self.fc0(torch.cat((v, q), 2)))), 1)

    def export(self):
        return {"fc0": wn_params(self.fc0), "fc1": wn_params(self.fc1)}


class TorchMTL(tnn.Module):
    """Full Wrapper twin: Up-Down encoder/predictor (ConcatAttention) +
    BaseDecoder (shrinking-batch teacher forcing, generator.py:66-120) +
    log_vars (wrapper.py:47-52). log_vars are *optimized* at base lr here —
    our documented divergence from the reference, which builds them but
    leaves them out of the optimizer (train.py:55-57)."""

    def __init__(self):
        super().__init__()
        self.embedding = tnn.Embedding(NTOKEN + 1, EMBED, padding_idx=NTOKEN)
        self.q_rnn = tnn.GRU(input_size=EMBED, hidden_size=HIDDEN,
                             batch_first=True)
        self.enc_att = TorchConcatAtt(V_DIM, HIDDEN, HIDDEN)
        self.q_net = TorchFCNet(HIDDEN, HIDDEN)
        self.v_net = TorchFCNet(V_DIM, HIDDEN)
        self.classifier = TorchFCNet(HIDDEN, ANS, mid_dim=2 * HIDDEN, layer=2)
        self.cell = tnn.GRUCell(input_size=EMBED + V_DIM, hidden_size=DEC_H)
        self.dec_att = TorchConcatAtt(V_DIM, DEC_H, DEC_H)
        self.dec_out = tnn.Linear(DEC_H, NTOKEN)
        with torch.no_grad():   # generator.py:173-175 init quirk
            self.dec_out.weight.uniform_(-0.1, 0.1)
            self.dec_out.bias.zero_()
        self.log_vars = tnn.Parameter(torch.zeros(2))

    def forward(self, img, q_tok, c_tok, cap_len, target):
        qe = self.embedding(q_tok)
        out, _ = self.q_rnn(qe)
        qh = out[:, -1]
        att = self.enc_att(img, qh)
        v = att * img                                     # weighted features

        # VQA head
        predict = self.classifier(self.q_net(qh) * self.v_net(v.sum(1)))
        loss_vqa = torch_bce_loss(predict, target)

        # caption head: reference shrinking-batch loop, grads on
        c_emb = self.embedding(c_tok)
        order = np.argsort(-cap_len, kind="stable")
        vs, cs, ts = v[order], c_emb[order], c_tok[order]
        decode_len = cap_len[order] - 1
        h = torch.zeros(v.size(0), DEC_H, dtype=v.dtype)
        rows, tgts = [], []
        step_out = []
        for t in range(int(decode_len.max())):
            bt = int((decode_len > t).sum())
            h = h[:bt]
            a = self.dec_att(vs[:bt], h)
            att_v = (a * vs[:bt]).sum(1)
            h = self.cell(torch.cat([cs[:bt, t, :], att_v], dim=1), h)
            step_out.append(self.dec_out(h))
        for i in range(v.size(0)):
            n = int(decode_len[i])
            rows.extend(step_out[t][i:i + 1] for t in range(n))
            tgts.append(ts[i, 1:1 + n])
        loss_cap = F.cross_entropy(torch.cat(rows), torch.cat(tgts))

        s = self.log_vars
        loss = (torch.exp(-s[0]) * loss_vqa + s[0]
                + torch.exp(-s[1]) * loss_cap + s[1])
        return loss


def export_mtl_params(m: TorchMTL):
    return {
        "encoder": {
            "embedding": {"table": t2n(m.embedding.weight)},
            "q_rnn": {
                "wi_l0": t2n(m.q_rnn.weight_ih_l0).T,
                "bi_l0": t2n(m.q_rnn.bias_ih_l0),
                "wh_l0": t2n(m.q_rnn.weight_hh_l0).T,
                "bh_l0": t2n(m.q_rnn.bias_hh_l0),
            },
            "attention": m.enc_att.export(),
            "q_net": m.q_net.export(),
        },
        "predictor": {
            "v_net": m.v_net.export(),
            "classifier": m.classifier.export(),
        },
        "generator": {
            "rnn": {"wi": t2n(m.cell.weight_ih).T, "bi": t2n(m.cell.bias_ih),
                    "wh": t2n(m.cell.weight_hh).T, "bh": t2n(m.cell.bias_hh)},
            "attention": m.dec_att.export(),
            "fcnet": {"w": t2n(m.dec_out.weight).T, "b": t2n(m.dec_out.bias)},
        },
        "log_vars": t2n(m.log_vars),
    }


def test_mtl_train_trajectory_matches_torch(rng):
    torch.manual_seed(11)
    ref = TorchMTL().double().train()

    model = set_model(encoder_type="base", predictor_type="base",
                      decoder_type="base", ntoken=NTOKEN, v_dim=V_DIM,
                      embed_dim=EMBED, hidden_dim=HIDDEN,
                      decoder_hidden_dim=DEC_H, ans_dim=ANS, c_len=MAX_LEN,
                      dropout=0.0, att_type="base", use_mtl=True)

    batches = make_vqa_batches(rng, extra=("c",))

    enc_params = (list(ref.embedding.parameters())
                  + list(ref.q_rnn.parameters())
                  + list(ref.enc_att.parameters())
                  + list(ref.q_net.parameters())
                  + [ref.log_vars])
    vqa_params = (list(ref.v_net.parameters())
                  + list(ref.classifier.parameters()))
    cap_params = (list(ref.cell.parameters()) + list(ref.dec_att.parameters())
                  + list(ref.dec_out.parameters()))

    params0 = jax.tree_util.tree_map(lambda x: jnp.array(x), export_mtl_params(ref))

    def loss_fn(m, b):
        return m(torch.from_numpy(b["img"]), torch.from_numpy(b["q"]),
                 torch.from_numpy(b["c"]), b["cap_len"],
                 torch.from_numpy(b["a"]))

    want_losses = run_torch_trajectory(
        ref, [enc_params, vqa_params, cap_params], batches, loss_fn,
        [None, LR_VQA, LR_CAP])
    ours_losses, params = run_ours_trajectory(
        model, params0, [to_jax(b) for b in batches])

    np.testing.assert_allclose(ours_losses, want_losses, rtol=1e-8,
                               err_msg="MTL loss trajectory diverged")
    assert_tree_close(tree_of(params), export_mtl_params(ref),
                      rtol=1e-6, atol=5e-8, prefix="final params")


# ---------------------------------------------------------------------------
# ReGAT: correlated GCN path
# ---------------------------------------------------------------------------

class TorchCorrConv(tnn.Module):
    """CorrelatedGraphConv twin (reference gcn.py:113-168), registered
    properly (our intended-model fix of defect 2.1#1)."""

    def __init__(self, dim, num_labels=12):
        super().__init__()
        self.w0 = tnn.Linear(dim, dim, bias=False)
        self.w1 = tnn.Linear(dim, dim, bias=False)
        self.w2 = tnn.Linear(dim, dim, bias=False)
        stdv = 1.0 / (dim ** 0.5)
        self.label_bias = tnn.Parameter(
            torch.empty(num_labels, dim).uniform_(-stdv, stdv))
        self.dp_a = tnn.Linear(dim, dim)
        self.dp_b = tnn.Linear(dim, dim)
        self.num_labels = num_labels

    def forward(self, f, graph):
        adj = (graph != 0).to(f.dtype)
        out = self.w2(f) + torch.bmm(adj, self.w0(f)) \
            + torch.bmm(adj, self.w1(f))
        onehot = F.one_hot(graph.long(), self.num_labels).to(f.dtype).sum(2)
        out = out + onehot @ self.label_bias
        alpha = torch.bmm(self.dp_a(f), self.dp_b(f).transpose(1, 2))
        alpha = torch.softmax(torch.bmm(adj, torch.relu(alpha)), 1)
        return torch.bmm(alpha, out)

    def export(self):
        return {
            "w0": t2n(self.w0.weight).T,
            "w1": t2n(self.w1.weight).T,
            "w2": t2n(self.w2.weight).T,
            "label_bias": t2n(self.label_bias),
            "dot_product": {"wa": t2n(self.dp_a.weight).T,
                            "ba": t2n(self.dp_a.bias),
                            "wb": t2n(self.dp_b.weight).T,
                            "bb": t2n(self.dp_b.bias)},
        }


class TorchReGAT(tnn.Module):
    """RelationEncoder (spatial corr GCN) + BasePredictor twin."""

    def __init__(self):
        super().__init__()
        self.core = TorchUpDown()
        self.conv = TorchCorrConv(V_DIM)

    def forward(self, img, q_tok, graph):
        c = self.core
        qe = c.embedding(q_tok)
        out, _ = c.q_rnn(qe)
        qh = out[:, -1]
        vp = c.att_wv(img)
        qp = c.att_wq(qh).unsqueeze(1)
        att = torch.softmax(c.att_linear(vp * qp), 1)
        v = att * img
        v = torch.relu(self.conv(v, graph))   # GCN stack, dropout=0
        return c.classifier(c.q_net(qh) * c.v_net(v.sum(1)))


def test_regat_train_trajectory_matches_torch(rng):
    torch.manual_seed(13)
    ref = TorchReGAT().double().train()

    model = set_model(encoder_type="relation", predictor_type="base",
                      decoder_type="none", ntoken=NTOKEN, v_dim=V_DIM,
                      embed_dim=EMBED, hidden_dim=HIDDEN,
                      decoder_hidden_dim=16, ans_dim=ANS, c_len=8,
                      dropout=0.0, att_type="new", att_dropout=0.0,
                      conv_type="corr", conv_layer=1)

    batches = make_vqa_batches(rng, extra=("graph",))

    params0 = export_params(ref.core)
    params0["encoder"]["spatial_encoder"] = {"conv0": ref.conv.export()}
    params0 = jax.tree_util.tree_map(lambda x: jnp.array(x), params0)

    c = ref.core
    enc_params = (list(c.embedding.parameters()) + list(c.q_rnn.parameters())
                  + list(c.att_wv.parameters()) + list(c.att_wq.parameters())
                  + list(c.att_linear.parameters()) + list(c.q_net.parameters())
                  + list(ref.conv.parameters()))
    vqa_params = list(c.v_net.parameters()) + list(c.classifier.parameters())

    def loss_fn(m, b):
        predict = m(torch.from_numpy(b["img"]), torch.from_numpy(b["q"]),
                    torch.from_numpy(b["graph"]))
        return torch_bce_loss(predict, torch.from_numpy(b["a"]))

    want_losses = run_torch_trajectory(
        ref, [enc_params, vqa_params], batches, loss_fn, [None, LR_VQA],
        n_steps=20)
    ours_losses, params = run_ours_trajectory(
        model, params0, [to_jax(b) for b in batches], n_steps=20)

    np.testing.assert_allclose(ours_losses, want_losses, rtol=1e-8,
                               err_msg="ReGAT loss trajectory diverged")
    want = export_params(ref.core)
    want["encoder"]["spatial_encoder"] = {"conv0": ref.conv.export()}
    assert_tree_close(tree_of(params), want, rtol=1e-6, atol=5e-8,
                      prefix="final params")
