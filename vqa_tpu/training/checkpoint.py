"""Checkpoint save/restore.

Same artifact layout as the reference (`checkpoint/<exp>/epoch_{n}.ckpt`,
``best_model.ckpt``; SURVEY.md section 5.4) but the payload is complete:
{params, opt_state, step, rng, best_score, epoch} — the reference only saved
``model.state_dict()`` and silently restarted optimizer moments on resume
(train.py:127, main.py:204-213). Serialization is flax msgpack (pure bytes,
no pickle of code).
"""

from __future__ import annotations

import os
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from vqa_tpu.training.state import TrainState

_async_lock = threading.Lock()
_pending: list = []


def save_checkpoint_async(path: str, state: TrainState, epoch: int,
                          best_score: float = 0.0) -> threading.Thread:
    """Non-blocking checkpoint: device->host copy happens on the caller,
    serialization + fsync on a background thread (preemption loses at most
    one save interval, SURVEY.md section 5.3). ``wait_for_checkpoints()``
    joins outstanding saves."""
    host_state = jax.device_get(state)

    def work():
        save_checkpoint(path, host_state, epoch, best_score)

    t = threading.Thread(target=work, daemon=True)
    with _async_lock:
        _pending.append(t)
    t.start()
    return t


def wait_for_checkpoints() -> None:
    with _async_lock:
        pending, _pending[:] = _pending[:], []
    for t in pending:
        t.join()


def save_checkpoint(path: str, state: TrainState, epoch: int,
                    best_score: float = 0.0) -> None:
    payload = {
        "params": jax.device_get(state.params),
        # to_state_dict: optax NamedTuple states -> nested dicts (msgpack-able)
        "opt_state": serialization.to_state_dict(
            jax.device_get(state.opt_state)),
        "step": int(state.step),
        "rng": np.asarray(jax.random.key_data(state.rng)),
        "epoch": int(epoch),
        "best_score": float(best_score),
    }
    data = serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, payload))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_checkpoint(path: str, state: Optional[TrainState] = None
                    ) -> Dict[str, Any]:
    """Load a checkpoint; if ``state`` is given, return (restored_state, meta).

    Restoring into an existing state keeps pytree structure/dtypes (msgpack
    stores raw arrays).
    """
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = {"epoch": int(payload["epoch"]),
            "best_score": float(payload["best_score"])}
    if state is None:
        return {**payload, **meta}
    if not payload.get("opt_state"):
        # e.g. a checkpoint written by tools/import_torch.py: params only,
        # no optimizer moments — resuming training from it is undefined
        raise ValueError(
            f"{path} has no optimizer state (an imported/params-only "
            "checkpoint): it supports eval/decode (load_params) or warm "
            "start (merge_params), not training resume")
    restored = state.replace(
        params=serialization.from_state_dict(state.params, payload["params"]),
        opt_state=serialization.from_state_dict(state.opt_state,
                                                payload["opt_state"]),
        step=jax.numpy.int32(payload["step"]),
        rng=_wrap_rng(payload),
    )
    return {"state": restored, **meta}


def _wrap_rng(payload: Dict[str, Any]) -> jax.Array:
    # the key impl is determined by the key-data width (threefry2x32 stores
    # uint32[2], rbg uint32[4] — the two impls --prng_impl offers), so
    # checkpoints restore under the impl they were trained with regardless
    # of the current flag
    rng_data = jax.numpy.asarray(payload["rng"])
    impl = "rbg" if rng_data.shape[-1] == 4 else "threefry2x32"
    return jax.random.wrap_key_data(rng_data, impl=impl)


def load_params(path: str) -> Any:
    """Params-only restore (for eval / decode / warm start)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return payload["params"]


def merge_params(target: Any, loaded: Any) -> Any:
    """Non-strict warm start: copy leaves present in both with equal shape.

    Equivalent to the reference's ``load_state_dict(..., strict=False)``
    (main.py:214-217): unknown/mismatched entries keep the fresh init.
    """
    if isinstance(target, dict):
        out = {}
        for k, v in target.items():
            if isinstance(loaded, dict) and k in loaded:
                out[k] = merge_params(v, loaded[k])
            else:
                out[k] = v
        return out
    t = np.asarray(target)
    l = np.asarray(loaded)
    return loaded if t.shape == l.shape else target


# ---------------------------------------------------------------- orbax

def save_checkpoint_orbax(path: str, state: TrainState, epoch: int,
                          best_score: float = 0.0) -> None:
    """Orbax-backed save (interoperable with the orbax tooling ecosystem).

    Same payload as ``save_checkpoint``; ``path`` becomes an orbax checkpoint
    directory. The msgpack format remains the default (single-file, no extra
    dependency surface); this is the alternative for users already running
    orbax-managed checkpoint retention/preemption tooling.
    """
    import orbax.checkpoint as ocp

    payload = {
        "params": jax.device_get(state.params),
        "opt_state": serialization.to_state_dict(
            jax.device_get(state.opt_state)),
        "step": np.asarray(int(state.step)),
        "rng": np.asarray(jax.random.key_data(state.rng)),
        "epoch": np.asarray(int(epoch)),
        "best_score": np.asarray(float(best_score)),
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), payload, force=True)


def load_checkpoint_orbax(path: str, state: TrainState) -> Dict[str, Any]:
    """Restore from an orbax checkpoint directory into an existing state."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        payload = ckptr.restore(os.path.abspath(path))
    restored = state.replace(
        params=serialization.from_state_dict(state.params, payload["params"]),
        opt_state=serialization.from_state_dict(state.opt_state,
                                                payload["opt_state"]),
        step=jax.numpy.int32(payload["step"]),
        rng=_wrap_rng(payload),
    )
    return {"state": restored, "epoch": int(payload["epoch"]),
            "best_score": float(payload["best_score"])}
