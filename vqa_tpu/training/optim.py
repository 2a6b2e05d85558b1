"""Optimizer + LR schedule matching the reference training recipe.

The reference (`/root/reference/train.py:52-59,133-136`) uses:
- Adamax, base lr 2e-3, with *param groups*: encoder at ``lr``, predictor at
  ``lr_vqa = max(lr_vqa, lr)``, generator at ``lr_cap = max(lr_cap, lr)``;
- global grad-norm clip 0.25 (train.py:109);
- ``StepLR(step_size, gamma)`` stepped once per epoch after ``warm_up``
  epochs (train.py:133-136) — lr factor at epoch e is
  ``gamma ** floor(max(0, e - warm_up) / step_size)``.

Here this becomes one optax chain: clip -> per-group adamax scaling -> lr
schedule by step count (steps_per_epoch is static per run). Note: the
reference's param groups omit the MTL ``log_vars`` (they live on the Wrapper,
train.py:55-57), so uncertainty weights are silently never optimized — a
latent defect; here ``log_vars`` train under the base lr (documented
divergence, the intended Kendall et al. behavior).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def steplr_factor(epoch: int, warm_up: int, step_size: int, gamma: float) -> float:
    """torch StepLR factor at a given (0-indexed) training epoch."""
    if step_size == 0:
        return 1.0
    return gamma ** (max(0, epoch - warm_up) // step_size)


def _group_label(path: tuple) -> str:
    """Label top-level param subtrees: encoder/enc, predictor/vqa, generator/cap."""
    top = path[0].key if hasattr(path[0], "key") else str(path[0])
    if top == "predictor":
        return "vqa"
    if top == "generator":
        return "cap"
    return "enc"  # encoder + log_vars + anything else at base lr


def make_optimizer(lr: float,
                   lr_vqa: float = 0.0,
                   lr_cap: float = 0.0,
                   max_norm: float = 0.25,
                   warm_up: int = 0,
                   step_size: int = 0,
                   gamma: float = 0.5,
                   steps_per_epoch: int = 1,
                   b1: float = 0.9,
                   b2: float = 0.999,
                   eps: float = 1e-8) -> optax.GradientTransformation:
    """Build the full update chain (clip -> group adamax -> StepLR schedule)."""
    lr_vqa = max(lr_vqa, lr)
    lr_cap = max(lr_cap, lr)

    def group(base_lr: float) -> optax.GradientTransformation:
        chain = [optax.scale_by_adamax(b1=b1, b2=b2, eps=eps)]
        if step_size != 0:
            def schedule(step):
                epoch = step // steps_per_epoch
                n = jnp.maximum(0, epoch - warm_up) // step_size
                return -base_lr * (gamma ** n)
            chain.append(optax.scale_by_schedule(schedule))
        else:
            chain.append(optax.scale(-base_lr))
        return optax.chain(*chain)

    transforms = {
        "enc": group(lr),
        "vqa": group(lr_vqa),
        "cap": group(lr_cap),
    }

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: _group_label(path), params)

    return optax.chain(
        optax.clip_by_global_norm(max_norm),
        optax.multi_transform(transforms, label_fn),
    )
