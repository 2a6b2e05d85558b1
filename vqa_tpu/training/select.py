"""Q-Relevant max-relevance training: all captions, backprop from the best.

The reference declares ``train_select`` with a full signature but the body is
``pass`` (`/root/reference/train.py:139-158`; SURVEY.md section 2.1). This
implements the intended strategy from "Generating Question Relevant Captions
to Aid VQA" (reference README.md:10: *use all captions, but only backprop
the loss from the most relevant one*):

Every step sees all candidate captions per QA pair in one compiled graph:
the VQA head scores each candidate, the per-sample candidate with the lowest
VQA loss is selected under ``stop_gradient``, and both the VQA loss and the
caption-decoder loss backpropagate only through that candidate. Candidate
expansion is a batched reshape ([B, n_cap, ...] -> [B*n_cap, ...]) — no
Python loop, MXU-batched.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from vqa_tpu.models.wrapper import VQAModel, compute_score, ce_for_language_model
from vqa_tpu.training.state import TrainState


def per_sample_bce(predict: jax.Array, target: jax.Array) -> jax.Array:
    """Per-sample instance BCE (wrapper.py:25-29 without the batch mean):
    mean over answers x ans_dim == sum consistency with instance_bce."""
    loss = jnp.maximum(predict, 0) - predict * target + jnp.log1p(
        jnp.exp(-jnp.abs(predict)))
    return jnp.mean(loss, axis=-1) * predict.shape[-1]


def get_select_loss(mdl: VQAModel, batch: Dict[str, Any],
                    deterministic: bool = False
                    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Joint loss with per-sample max-relevance caption selection.

    batch: img [B, objs, v_dim], q [B, q_len], a [B, ans],
           c_all [B, n_cap, c_len], cap_len_all [B, n_cap].
    """
    embed = mdl.encoder({"img": batch["img"], "q": batch["q"]},
                        deterministic=deterministic)
    v, q = embed["v"], embed["q"]
    B, n_cap, c_len = batch["c_all"].shape

    # candidate-expanded VQA forward
    c_emb = mdl.encoder.embed(batch["c_all"])            # [B, n, T, E]
    flat = lambda x: x.reshape((B * n_cap,) + x.shape[2:])
    pbatch = {
        "v": jnp.repeat(v, n_cap, axis=0),
        "q": jnp.repeat(q, n_cap, axis=0),
        "c": flat(c_emb),
        "cap_len": flat(batch["cap_len_all"]),
    }
    predict = mdl.predictor(pbatch, deterministic=deterministic)  # [B*n, A]
    target = jnp.repeat(batch["a"].astype(jnp.float32), n_cap, axis=0)
    per = per_sample_bce(predict, target).reshape(B, n_cap)

    # most relevant candidate = lowest VQA loss; selection is not
    # differentiated (stop_gradient), the selected path is
    sel = jnp.argmin(jax.lax.stop_gradient(per), axis=1)          # [B]
    loss_vqa = jnp.mean(jnp.take_along_axis(per, sel[:, None], axis=1))

    sel_predict = jnp.take_along_axis(
        predict.reshape(B, n_cap, -1), sel[:, None, None], axis=1)[:, 0]
    writes = {
        "train/loss": loss_vqa,
        "train/score": jnp.sum(compute_score(sel_predict,
                                             batch["a"].astype(jnp.float32))),
    }

    loss = loss_vqa
    log_vars = mdl.log_vars if mdl.mtl_active else None
    if log_vars is not None:
        loss = jnp.exp(-log_vars[0]) * loss_vqa + log_vars[0]

    if mdl.generator is not None:
        c_sel = jnp.take_along_axis(batch["c_all"], sel[:, None, None],
                                    axis=1)[:, 0]                 # [B, T]
        cap_len_sel = jnp.take_along_axis(batch["cap_len_all"],
                                          sel[:, None], axis=1)[:, 0]
        gbatch = {
            "v": v,
            "c": mdl.encoder.embed(c_sel),
            "c_target": c_sel,
            "cap_len": cap_len_sel,
        }
        caption = mdl.generator(gbatch, deterministic=deterministic)
        loss_cap = ce_for_language_model(caption["predict"],
                                         caption["target"], caption["mask"])
        writes["train/cap/loss"] = loss_cap
        if log_vars is not None:
            loss = loss + jnp.exp(-log_vars[1]) * loss_cap + log_vars[1]
        else:
            loss = loss + loss_cap
    return loss, writes


def make_train_select_step(model: VQAModel, tx: optax.GradientTransformation,
                           compute_dtype=None) -> Callable:
    """Jitted max-relevance train step (same contract as make_train_step)."""
    from vqa_tpu.training.state import _cast_floats

    def loss_fn(params, batch, dropout_key):
        if compute_dtype is not None:
            params = _cast_floats(params, compute_dtype)
            batch = _cast_floats(batch, compute_dtype)
        return model.apply({"params": params}, batch,
                           method=functools.partial(get_select_loss,
                                                    deterministic=False),
                           rngs={"dropout": dropout_key})

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict[str, Any]):
        dropout_key = jax.random.fold_in(state.rng, state.step)
        (loss, writes), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, dropout_key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(writes)
        metrics["loss"] = loss
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1), metrics

    return train_step
