"""Multi-chip evidence beyond the smoke dryrun (VERDICT r3 item 5).

Each test runs a REAL sharded configuration on the virtual 8-device CPU
mesh — DP batch sharding x TP-sharded classifier/vocab heads, exactly the
layout ``__graft_entry__.dryrun_multichip`` uses — and asserts *numerics
parity* with single-device execution, not just that the step runs:

- the full MTL train step (encoder + VQA head + BUTD caption decoder,
  uncertainty-weighted loss) at the dryrun shape;
- the ReGAT config (relation encoder: the [B, objs, objs] graph batches
  shard on the batch axis alongside the features);
- the max-relevance ``train_select`` step (all-candidate captions,
  stop-gradient argmin selection).

The reference's whole distributed story is dead code
(/root/reference/train.py:89-92, an unreachable ``nn.DataParallel`` block);
these pin that the rebuild's mesh layer preserves the math it replaces.
"""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from vqa_tpu.models.wrapper import set_model
from vqa_tpu.parallel.mesh import (
    make_mesh, param_shardings, shard_batch,
)
from vqa_tpu.training import optim as optim_lib
from vqa_tpu.training.state import (
    TrainState, create_train_state, make_train_step,
)

NTOKEN, ANS, OBJS, V_DIM, Q_LEN, C_LEN = 64, 16, 6, 32, 5, 8


def _batch(rng, batch_size, caption=False, graph=False, select=False):
    import jax.numpy as jnp

    out = {
        "img": jnp.asarray(
            rng.standard_normal((batch_size, OBJS, V_DIM)).astype(np.float32)),
        "q": jnp.asarray(rng.integers(0, NTOKEN, (batch_size, Q_LEN))),
        "a": jnp.asarray(
            (rng.random((batch_size, ANS)) < 0.1).astype(np.float32)),
    }
    if caption:
        out["c"] = jnp.asarray(rng.integers(0, NTOKEN, (batch_size, C_LEN)))
        out["cap_len"] = jnp.asarray(
            rng.integers(3, C_LEN + 1, (batch_size,)).astype(np.int32))
    if graph:
        out["graph"] = jnp.asarray(
            rng.integers(0, 12, (batch_size, OBJS, OBJS)))
    if select:
        n_cap = 3
        out["c_all"] = jnp.asarray(
            rng.integers(0, NTOKEN, (batch_size, n_cap, C_LEN)))
        out["cap_len_all"] = jnp.asarray(
            rng.integers(3, C_LEN + 1, (batch_size, n_cap)).astype(np.int32))
    return out


def _model(**kw):
    defaults = dict(
        encoder_type="base", predictor_type="base", decoder_type="none",
        ntoken=NTOKEN, v_dim=V_DIM, embed_dim=12, hidden_dim=16,
        decoder_hidden_dim=16, ans_dim=ANS, c_len=C_LEN, dropout=0.1,
        att_type="new",
    )
    defaults.update(kw)
    return set_model(**defaults)


def _shard_state(mesh, state, tx):
    """dryrun_multichip's layout: TP heads + replicated rest; optimizer
    moments re-initialized on the sharded params to inherit the layout."""
    p_shard = param_shardings(mesh, state.params)
    params = jax.tree_util.tree_map(jax.device_put, state.params, p_shard)
    return state.replace(
        params=params,
        opt_state=tx.init(params),
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        rng=jax.device_put(state.rng, NamedSharding(mesh, P())))


def _assert_tree_close(got, want, rtol=2e-4, atol=1e-5):
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol), got, want)


def _mesh_4x2():
    assert jax.device_count() == 8
    return make_mesh(n_data=4, n_model=2)


def _tp_actually_sharded(mesh, params):
    """At least one head weight must really split over the 'model' axis."""
    shardings = param_shardings(mesh, params)
    return any(
        "model" in (s.spec[1] if len(s.spec) > 1 else ()) or
        "model" in s.spec
        for s in jax.tree_util.tree_leaves(
            shardings, is_leaf=lambda x: isinstance(x, NamedSharding))
        if s.spec != P())


def test_mtl_dp_tp_step_matches_single_device():
    """Full MTL train step (dryrun shape) DP=4 x TP=2 == single device."""
    mesh = _mesh_4x2()
    model = _model(predictor_type="base-cap", decoder_type="butd",
                   use_mtl=True)
    rng = np.random.default_rng(0)
    batch = _batch(rng, batch_size=8, caption=True)
    tx = optim_lib.make_optimizer(lr=2e-3, steps_per_epoch=10)
    step = make_train_step(model, tx)

    ref_state, ref_metrics = step(
        create_train_state(model, tx, batch, seed=0), batch)

    state = _shard_state(mesh, create_train_state(model, tx, batch, seed=0),
                         tx)
    assert _tp_actually_sharded(mesh, ref_state.params)
    new_state, metrics = step(state, shard_batch(mesh, batch))

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    assert "train/cap/loss" in metrics
    _assert_tree_close(new_state.params, ref_state.params)


def test_regat_dp_tp_step_matches_single_device():
    """ReGAT config: the [B, objs, objs] relation graphs shard on the batch
    axis alongside the features; step numerics match single device."""
    mesh = _mesh_4x2()
    model = _model(encoder_type="relation", conv_layer=1)
    rng = np.random.default_rng(1)
    batch = _batch(rng, batch_size=8, graph=True)
    tx = optim_lib.make_optimizer(lr=2e-3, steps_per_epoch=10)
    step = make_train_step(model, tx)

    ref_state, ref_metrics = step(
        create_train_state(model, tx, batch, seed=0), batch)

    sharded_batch = shard_batch(mesh, batch)
    # the graph really shards over 'data', same as the feature tensors
    assert sharded_batch["graph"].sharding.spec == P("data")
    state = _shard_state(mesh, create_train_state(model, tx, batch, seed=0),
                         tx)
    new_state, metrics = step(state, sharded_batch)

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    _assert_tree_close(new_state.params, ref_state.params)


def test_train_select_dp_tp_step_matches_single_device():
    """Max-relevance selection step (train_select's step_factory) over the
    mesh: candidate expansion, stop-gradient argmin and the joint MTL loss
    all shard cleanly; numerics match single device."""
    import functools
    import jax.numpy as jnp
    from vqa_tpu.training.select import (
        get_select_loss, make_train_select_step,
    )

    mesh = _mesh_4x2()
    model = _model(predictor_type="base-cap", decoder_type="base",
                   use_mtl=True)
    rng = np.random.default_rng(2)
    batch = _batch(rng, batch_size=8, select=True)
    tx = optim_lib.make_optimizer(lr=2e-3, steps_per_epoch=10)
    step = make_train_select_step(model, tx)

    def init_state():
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            batch, method=functools.partial(get_select_loss,
                                            deterministic=True))
        return TrainState(params=variables["params"],
                          opt_state=tx.init(variables["params"]),
                          step=jnp.int32(0), rng=jax.random.key(2))

    ref_state, ref_metrics = step(init_state(), batch)

    state = _shard_state(mesh, init_state(), tx)
    new_state, metrics = step(state, shard_batch(mesh, batch))

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    assert "train/score" in metrics
    _assert_tree_close(new_state.params, ref_state.params)
