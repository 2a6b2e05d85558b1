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

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class ScaleByAdamaxTorchState(NamedTuple):
    count: jax.Array
    mu: optax.Updates    # first moment (torch exp_avg)
    nu: optax.Updates    # infinity norm (torch exp_inf)


def scale_by_adamax_torch(b1: float = 0.9, b2: float = 0.999,
                          eps: float = 1e-8) -> optax.GradientTransformation:
    """Adamax with *torch-exact* semantics (torch.optim.Adamax).

    torch updates ``exp_inf = max(b2 * exp_inf, |g| + eps)`` — epsilon is
    added to |g| *inside* the max — and divides by the bias correction:
    ``p -= lr / (1 - b1**t) * exp_avg / exp_inf``. optax's
    ``scale_by_adamax`` instead computes ``max(b2 * nu, |g|)`` and divides by
    ``nu + eps``: a subtly different denominator whose drift compounds over
    an optimization trajectory. Accuracy parity with the reference recipe
    (`/root/reference/train.py:58`) requires the torch form; the
    N-step trajectory test (tests/test_train_parity.py) pins it.
    """

    def init_fn(params):
        return ScaleByAdamaxTorchState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda n, g: jnp.maximum(b2 * n, jnp.abs(g) + eps),
            state.nu, updates)
        bias_correction = 1.0 - b1 ** count.astype(jnp.float32)
        new_updates = jax.tree_util.tree_map(
            lambda m, n: m / (bias_correction * n), mu, nu)
        return new_updates, ScaleByAdamaxTorchState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def clip_by_global_norm_torch(max_norm: float) -> optax.GradientTransformation:
    """Global-norm clip with *torch-exact* semantics.

    torch ``nn.utils.clip_grad_norm_`` scales by ``max_norm / (norm + 1e-6)``
    whenever that coefficient is < 1 (`/root/reference/train.py:109`);
    optax's ``clip_by_global_norm`` omits the 1e-6. The difference is tiny
    per step but the trajectory parity test pins exact semantics.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        coef = jnp.minimum(max_norm / (g_norm + 1e-6), 1.0)
        return jax.tree_util.tree_map(lambda g: g * coef, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


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
        chain = [scale_by_adamax_torch(b1=b1, b2=b2, eps=eps)]
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
        clip_by_global_norm_torch(max_norm),
        optax.multi_transform(transforms, label_fn),
    )
