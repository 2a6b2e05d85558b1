"""Device mesh + sharding specs (data parallel x tensor parallel).

TPU-native replacement for the reference's (absent) distributed layer
(SURVEY.md section 5.8). Strategy:

- Mesh axes ``('data', 'model')``. Batch arrays shard their leading axis over
  ``data``; gradients reduce with XLA-inserted ``psum`` over ICI — this
  covers and supersedes the reference's dead ``nn.DataParallel`` block
  (train.py:89-92).
- Tensor parallelism: the wide output projections (answer classifier
  [hidden, ans_dim], decoder vocab projection [hidden, ntoken]) shard their
  output dim over ``model``; activations all-gather only at those heads. At
  the reference model scale TP is optional (params < 60M) but the shardings
  are first-class so pod-slice scaling is a mesh-shape change, not a rewrite.
- The reference's decoder-on-second-device placement (main.py:88,
  wrapper.py:148-150) is subsumed: one jit graph over the whole mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'model') mesh. Defaults: all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    # n_data >= 1 catches n_model > device count early (it would pass the
    # product check as 0 * n_model and build an empty grid whose failure
    # surfaces later as an opaque ZeroDivisionError/XLA error)
    assert n_data >= 1 and n_model >= 1, \
        f"degenerate mesh {n_data}x{n_model} on {len(devices)} devices"
    assert n_data * n_model <= len(devices), \
        f"need {n_data * n_model} devices, have {len(devices)}"
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def replicate(mesh: Mesh, tree: Any) -> Any:
    """device_put a pytree fully replicated over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def replicate_global(mesh: Mesh, tree: Any) -> Any:
    """Replicate host-local arrays over a (possibly multi-host) mesh.

    ``jax.device_put`` to a non-addressable sharding only accepts
    uncommitted/numpy inputs (it asserts the value is identical on every
    process) — but jit/init outputs are committed arrays. Round-trip through
    host numpy first; PRNG key arrays go via key_data/wrap_key_data (their
    extended dtype cannot convert to numpy directly). Correct only when
    every process holds the same values (e.g. seeded identical init).
    """
    sharding = NamedSharding(mesh, P())

    def put(x):
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(x))
            return jax.random.wrap_key_data(jax.device_put(data, sharding),
                                            impl=str(jax.random.key_impl(x)))
        return jax.device_put(np.asarray(x), sharding)

    return jax.tree_util.tree_map(put, tree)


def batch_shardings(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Leading-axis 'data' sharding for arrays, replicated scalars.

    Divisibility is checked against the devices *this process* feeds: in
    multi-host runs each host holds batch_size rows that spread over its
    local slice of the 'data' axis.
    """
    out = {}
    n_data = mesh.shape["data"]
    n_local = max(1, n_data // jax.process_count())
    for k, v in batch.items():
        arr = np.asarray(v)
        if arr.ndim >= 1 and arr.shape[0] % n_local == 0:
            out[k] = NamedSharding(mesh, P("data"))
        else:
            out[k] = NamedSharding(mesh, P())
    return out


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """device_put a host batch with data-parallel shardings.

    Multi-host: each process holds only its shard of the global batch (the
    Loader feeds per-host batches, loader.py num_shards); the global array
    is assembled without cross-host data movement via
    ``make_array_from_process_local_data`` — the per-host rows land on that
    host's own devices.
    """
    shardings = batch_shardings(mesh, batch)
    if jax.process_count() > 1:
        out = {}
        for k, v in batch.items():
            arr = np.asarray(v)
            out[k] = jax.make_array_from_process_local_data(
                shardings[k], arr)
        return out
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}


# Param subtrees whose trailing (output) dim shards over the 'model' axis:
# the answer classifier's final layer and the decoder vocab projections —
# the only weight matrices wide enough to be worth splitting.
_TP_SUFFIXES = ("classifier", "fcnet", "h2_fcnet", "cls_net")


def _param_spec(path: tuple, leaf) -> P:
    keys = [p.key if hasattr(p, "key") else str(p) for p in path]
    in_tp_module = any(k in _TP_SUFFIXES for k in keys)
    if in_tp_module and getattr(leaf, "ndim", 0) >= 1:
        name = keys[-1]
        if getattr(leaf, "ndim", 0) == 2 and name in ("v", "w"):
            return P(None, "model")
        if getattr(leaf, "ndim", 0) == 1 and name == "b":
            return P("model")
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding tree: TP for wide output heads, replicated elsewhere.

    Only shards dims that divide evenly by the 'model' axis size; everything
    else stays replicated (safe default).
    """
    n_model = mesh.shape["model"]

    def spec_for(path, leaf):
        spec = _param_spec(path, leaf)
        # verify divisibility; fall back to replication if it doesn't divide
        for dim, axis in enumerate(spec):
            if axis == "model" and leaf.shape[dim] % n_model != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, params: Any) -> Any:
    shardings = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
