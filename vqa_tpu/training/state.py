"""Train state + jitted step factories.

Replaces the reference's eager per-batch loop body
(`/root/reference/train.py:100-113`: forward, backward, clip, Adamax step) by
a single compiled ``train_step``: ``jax.value_and_grad`` through
``VQAModel.get_loss``, optax chain (clip -> per-group adamax -> StepLR), one
XLA graph. The state is donated every step so parameter buffers update
in-place in HBM.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vqa_tpu.models.wrapper import VQAModel


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jax.Array            # int32 scalar
    rng: jax.Array             # PRNG key


def create_train_state(model: VQAModel, tx: optax.GradientTransformation,
                       sample_batch: Dict[str, Any], seed: int = 1111,
                       prng_impl: str | None = None) -> TrainState:
    """Initialize params from a sample batch (shapes only matter).

    ``prng_impl``: PRNG implementation for the run key (None = jax default,
    threefry2x32). ``"rbg"`` lowers dropout bit-generation to XLA's
    ``RngBitGenerator`` — on TPU the MTL decoder's per-step [B, objs, H]
    attention-dropout masks made threefry the single largest cost of the
    train step (PERF.md "MTL train step": ~15 ms of each 33 ms decode
    iteration at B=4096 was threefry rounds fused into the attention
    chain, fwd + remat + bwd). The key's impl rides through
    ``split``/``fold_in`` and into every ``nn.Dropout``.
    """
    root = jax.random.key(seed, impl=prng_impl)
    init_key, run_key = jax.random.split(root)
    variables = model.init({"params": init_key, "dropout": run_key},
                           sample_batch, method="get_loss")
    params = variables["params"]
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.int32(0), rng=run_key)


def _cast_floats(tree: Any, dtype) -> Any:
    """Cast float leaves to ``dtype``; leave ints/bools untouched."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


def make_train_step(model: VQAModel, tx: optax.GradientTransformation,
                    compute_dtype: Any = None
                    ) -> Callable[[TrainState, Dict[str, Any]],
                                  Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the jitted train step (donates the state).

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) enables mixed-precision
    training: master params, gradients and optimizer moments stay f32 while
    the forward/backward matmuls run in ``compute_dtype`` (the cast sits
    inside ``loss_fn`` so autodiff produces f32 gradient leaves); the loss
    functions themselves upcast to f32 (wrapper.py). The reference trains
    pure f32 (/root/reference/train.py:100-113); on TPU the MXU runs bf16 at
    ~2x the f32 rate, and the mini-split convergence study (PERF.md "bf16
    training") shows matching loss trajectories.
    """

    def loss_fn(params, batch, dropout_key):
        if compute_dtype is not None:
            params = _cast_floats(params, compute_dtype)
            batch = _cast_floats(batch, compute_dtype)
        loss, writes = model.apply({"params": params}, batch,
                                   method="get_loss", deterministic=False,
                                   rngs={"dropout": dropout_key})
        return loss, writes

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict[str, Any]):
        dropout_key = jax.random.fold_in(state.rng, state.step)
        (loss, writes), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, dropout_key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(writes)
        metrics["loss"] = loss
        new_state = state.replace(params=params, opt_state=opt_state,
                                  step=state.step + 1)
        return new_state, metrics

    return train_step


def make_eval_step(model: VQAModel) -> Callable:
    """Jitted VQA eval step -> per-sample (score, label, bound).

    Mirrors evaluate()'s accumulation quantities (train.py:181-189): score =
    soft score of the argmax answer; bound = target.max(1) (ground-truth
    upper bound).
    """

    @jax.jit
    def eval_step(params, batch):
        score, label, target = model.apply({"params": params}, batch,
                                           method="forward_vqa")
        return jnp.sum(score, axis=1), label, jnp.max(target, axis=1)

    return eval_step


def make_infer_step(model: VQAModel) -> Callable:
    """Jitted batched inference: batch -> answer logits [B, ans_dim]."""

    @jax.jit
    def infer_step(params, batch):
        predict, _ = model.apply({"params": params}, batch)
        return predict

    return infer_step
