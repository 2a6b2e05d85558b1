"""Tests: max-relevance (train_select) step, caption selection, sampler,
explainability metrics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqa_tpu.data.dataset import set_dataset
from vqa_tpu.data.loader import Loader
from vqa_tpu.data.synthetic import make_synthetic_root
from vqa_tpu.models.wrapper import set_model
from vqa_tpu.training import optim as optim_lib
from vqa_tpu.training.state import TrainState
from vqa_tpu.training.select import (
    get_select_loss, make_train_select_step, per_sample_bce,
)
from vqa_tpu.tools.select_caption import similarity, select_caption
from vqa_tpu.tools.metric import answer_mention_rate, attention_coverage
from vqa_tpu.tools.sample import sample_vqa
import functools


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return make_synthetic_root(str(tmp_path_factory.mktemp("sel")),
                               num_images=6, num_questions=24)


def _all_loader(root, batch_size=6):
    ds = set_dataset(load_path=root["annot"],
                     feature_path=root["feature_root"],
                     ans_dim=root["ans_dim"],
                     caption_id_path=root["select_path"],
                     is_train=True, dataset_type="all")
    return ds


def test_per_sample_bce_consistency(rng):
    from vqa_tpu.models.wrapper import instance_bce_with_logits
    p = jnp.asarray(rng.standard_normal((6, 9)).astype(np.float32))
    t = jnp.asarray((rng.random((6, 9)) < 0.3).astype(np.float32))
    np.testing.assert_allclose(float(per_sample_bce(p, t).mean()),
                               float(instance_bce_with_logits(p, t)), rtol=1e-6)


def test_train_select_step(root):
    model = set_model(encoder_type="base", predictor_type="base-cap",
                      decoder_type="base", ntoken=root["ntoken"],
                      v_dim=root["v_dim"], embed_dim=16, hidden_dim=24,
                      decoder_hidden_dim=20, ans_dim=root["ans_dim"],
                      c_len=root["c_len"], dropout=0.1, use_mtl=True)
    ds = _all_loader(root)
    batch = ds.get_batch_all(list(range(6)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k in ("img", "q", "a", "c_all", "cap_len_all")}
    assert batch["c_all"].shape == (6, 5, root["c_len"])

    method = functools.partial(get_select_loss, deterministic=True)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, batch,
                           method=method)
    tx = optim_lib.make_optimizer(lr=2e-3, steps_per_epoch=4)
    state = TrainState(params=variables["params"],
                       opt_state=tx.init(variables["params"]),
                       step=jnp.int32(0), rng=jax.random.key(2))
    step = make_train_select_step(model, tx)
    losses = []
    for _ in range(12):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert "train/cap/loss" in metrics


def test_selection_gradient_routing(root):
    """Gradient flows only through the selected candidate caption."""
    model = set_model(encoder_type="base", predictor_type="base-cap",
                      decoder_type="none", ntoken=root["ntoken"],
                      v_dim=root["v_dim"], embed_dim=8, hidden_dim=12,
                      decoder_hidden_dim=8, ans_dim=root["ans_dim"],
                      c_len=root["c_len"], dropout=0.0)
    ds = _all_loader(root)
    raw = ds.get_batch_all(list(range(4)))
    batch = {k: jnp.asarray(v) for k, v in raw.items()
             if k in ("img", "q", "a", "c_all", "cap_len_all")}
    method = functools.partial(get_select_loss, deterministic=True)
    params = model.init({"params": jax.random.key(0)}, batch,
                        method=method)["params"]

    def loss_of_c(c_all):
        b = dict(batch, c_all=c_all)
        loss, _ = model.apply({"params": params}, b, method=method)
        return loss

    # int tokens aren't differentiable; instead check the selection is
    # stable and the loss only depends on the selected captions: replacing a
    # non-selected caption with pads must not change the loss.
    loss0, _ = model.apply({"params": params}, batch, method=method)
    # find selections by probing: recompute per-candidate losses
    emb = model.apply({"params": params},
                      {"img": batch["img"], "q": batch["q"]},
                      method=lambda m, b: m.encoder(b, deterministic=True))
    # replace candidate 0..4 one at a time for sample 0, find the one that
    # changes the loss — exactly one should
    changed = []
    pad_row = jnp.full((root["c_len"],), root["ntoken"] - 1, jnp.int32)
    for cand in range(5):
        c_mod = batch["c_all"].at[0, cand].set(pad_row)
        loss1 = loss_of_c(c_mod)
        changed.append(abs(float(loss1) - float(loss0)) > 1e-7)
    assert sum(changed) <= 2  # selected candidate (and rarely a re-selection)


def test_select_caption_scores_each_candidate(rng):
    q = rng.standard_normal((4, 8)).astype(np.float32)
    a = rng.standard_normal((2, 8)).astype(np.float32)
    good = np.concatenate([q, a])        # caption containing q and a words
    bad = rng.standard_normal((5, 8)).astype(np.float32)
    assert select_caption(q, a, [bad, good, bad]) == 1
    assert similarity(q, q) == pytest.approx(1.0, abs=1e-5)


def test_sampler(root, tmp_path):
    model = set_model(encoder_type="base", predictor_type="base",
                      decoder_type="none", ntoken=root["ntoken"],
                      v_dim=root["v_dim"], embed_dim=8, hidden_dim=12,
                      decoder_hidden_dim=8, ans_dim=root["ans_dim"],
                      c_len=root["c_len"], dropout=0.0)
    ds = set_dataset(load_path=root["annot"],
                     feature_path=root["feature_root"],
                     ans_dim=root["ans_dim"], is_train=True,
                     dataset_type="vqa")
    loader = Loader(ds, 6, prefetch=0)
    batch = {k: jnp.asarray(v) for k, v in ds.get_batch([0]).items()
             if k in ("img", "q", "a")}
    params = model.init(jax.random.key(0), batch)["params"]
    ans_list = [f"a{i}" for i in range(root["ans_dim"])]
    hist = sample_vqa(model, params, loader, ans_list)
    assert sum(hist.values()) == len(ds)


def test_explainability_metrics():
    assert answer_mention_rate(["the dog is red", "a cat"],
                               ["red", "bird"]) == 0.5
    att = np.array([[0.5, 0.3, 0.1, 0.1], [0.25, 0.25, 0.25, 0.25]])
    cov = attention_coverage(att, k=2)
    assert cov == pytest.approx((0.8 + 0.5) / 2)


def test_show_att_visualization(rng, tmp_path):
    from vqa_tpu.tools import visualize
    if not visualize.HAS_PIL:
        pytest.skip("PIL unavailable")
    from PIL import Image
    img = Image.new("RGB", (100, 80), (40, 90, 120))
    att = np.array([0.5, 0.3, 0.2])
    bbox = np.array([[5, 5, 40, 40], [50, 10, 90, 50], [10, 50, 60, 75]],
                    np.float32)
    out = visualize.show_att(att, img, bbox, k=2)
    assert out.size == (100, 80)
