"""Import reference PyTorch checkpoints into this framework.

The reference saves ``torch.save(model.state_dict())`` per epoch
(`/root/reference/train.py:127`, `main.py:214-217`). This tool converts
such a state_dict — keyed by the reference Wrapper's module tree
(``encoder.*``/``predictor.*``/``generator.*``/``log_vars``) — into this
repo's flax parameter tree, so users migrating from the reference can keep
their trained models. Handled mappings:

- ``weight_norm(nn.Linear, dim=None)`` -> WNDense {v (transposed), g
  (scalar), b}; torch stores ``weight_v``/``weight_g`` (ops/linear.py).
- FCNet ``main.{i}`` / ConcatAttention ``sequence.{i}`` Sequentials -> our
  ``fc{n}`` with n = rank of the i-th *Linear* (ReLU/Dropout hold no
  params, so the sorted parameter-bearing indices enumerate the Linears).
- ``nn.GRU/LSTM`` ``rnn.weight_ih_l{k}[_reverse]`` -> ``wi_l{k}[_reverse]``
  etc., transposed to [in, gates*hidden] (ops/rnn.py keeps torch's gate
  order, so weights transfer without gate reshuffling).
- ``nn.GRUCell/LSTMCell`` ``weight_ih`` -> ``wi`` etc. (decoder cells).
- plain ``nn.Linear`` -> {w (transposed), b}; ``nn.Embedding.weight`` ->
  embedding ``table``; ``log_vars`` passes through.

Reference checkpoints contain NO GCN parameters — the reference keeps its
conv layers in a plain Python list invisible to ``state_dict()``
(SURVEY.md 2.1 defect 1) — so ReGAT imports warm-start everything except
the graph convs; combine with ``merge_params`` (non-strict warm start).

CLI: ``python -m vqa_tpu.tools.import_torch --src epoch_12.pt --dst
best_model.ckpt`` then use the ``.ckpt`` with ``--load_model`` / val /
decode as usual.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, List, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _set(tree: Dict[str, Any], path: List[str], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def import_reference_state_dict(sd: Dict[str, Any]
                                ) -> Tuple[Dict[str, Any], List[str]]:
    """reference state_dict -> (flax params tree, list of unmapped keys)."""
    sd = {k: _np(v) for k, v in sd.items()}
    out: Dict[str, Any] = {}
    unmapped: List[str] = []
    consumed = set()

    # ---- group weight-normed Linears: ...<mod>.weight_v/.weight_g[/.bias]
    for key in list(sd):
        if not key.endswith(".weight_v"):
            continue
        base = key[: -len(".weight_v")]
        g_key, b_key = base + ".weight_g", base + ".bias"
        if g_key not in sd:
            continue
        entry = {"v": sd[key].T, "g": sd[g_key].reshape(())}
        consumed.update({key, g_key})
        if b_key in sd:
            entry["b"] = sd[b_key]
            consumed.add(b_key)
        _set(out, _translate_path(base), entry)

    # ---- everything else
    for key, val in sd.items():
        if key in consumed:
            continue
        parts = key.split(".")
        leaf = parts[-1]
        base_parts = parts[:-1]

        if key == "log_vars":
            out["log_vars"] = val
        elif leaf == "weight" and base_parts and base_parts[-1] == "embedding":
            _set(out, _translate_path(".".join(base_parts)) + ["table"], val)
        elif leaf.startswith(("weight_ih", "weight_hh",
                              "bias_ih", "bias_hh")):
            # nn.GRU/LSTM ("weight_ih_l0[_reverse]") or cells ("weight_ih")
            kind = leaf[:9] if leaf.startswith("weight") else leaf[:7]
            rest = leaf[len(kind):].lstrip("_")           # "l0[_reverse]"
            ours = {"weight_ih": "wi", "weight_hh": "wh",
                    "bias_ih": "bi", "bias_hh": "bh"}[kind]
            name = f"{ours}_{rest}" if rest else ours
            # the reference nests the stacked RNN as <mod>.rnn.*; our
            # SentenceEmbedding declares wi_l0 directly on the module
            if rest and base_parts and base_parts[-1] == "rnn":
                base_parts = base_parts[:-1]
            val = val.T if kind.startswith("weight") else val
            _set(out, _translate_path(".".join(base_parts)) + [name], val)
        elif leaf == "weight":
            base = _translate_path(".".join(base_parts))
            # reference LReLUNet = Sequential(Linear(bias=False), LeakyReLU)
            # (modules.py:62-77); ours declares its single `w` directly on
            # the module, so the collapsed Sequential level drops out. A
            # *plain* bias-free Linear inside a Sequential can only be
            # LReLUNet — FCNet/attention Linears are all weight-normed.
            if base and base[-1].startswith("fc") \
                    and ".".join(base_parts) + ".bias" not in sd \
                    and base_parts[-1].isdigit():
                base = base[:-1]
            _set(out, base + ["w"], val.T)
        elif leaf == "bias":
            _set(out, _translate_path(".".join(base_parts)) + ["b"], val)
        else:
            unmapped.append(key)
    return out, unmapped


def _translate_path(dotted: str) -> List[str]:
    """reference module path -> our flax path, collapsing Sequential
    indices (``main.0`` / ``sequence.2``) into ``fc{rank}``. Ranks equal
    the numeric index order; ReLU/Dropout entries carry no parameters so
    they never appear in state_dict keys."""
    parts = dotted.split(".")
    path: List[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("main", "sequence") and i + 1 < len(parts) \
                and parts[i + 1].isdigit():
            # collapse: Sequential indices with params, in order, are the
            # Linears; torch FCNet layer spacing is 3 (Linear, ReLU,
            # Dropout) after the first, ConcatAttention spacing is 2
            idx = int(parts[i + 1])
            rank = 0 if idx == 0 else (1 + (idx - 1) // (3 if p == "main"
                                                         else 2))
            path.append(f"fc{rank}")
            i += 2
        else:
            path.append(p)
            i += 1
    return path


def convert(src: str, dst: str) -> List[str]:
    """Load a torch .pt state_dict, convert, write a params-only .ckpt.

    The output carries no optimizer state (the reference never saved any,
    SURVEY.md section 5.4): it is for eval/decode (``load_params``) or warm
    start (``merge_params``); ``load_checkpoint`` refuses to resume training
    from it with a clear error.
    """
    import torch
    from flax import serialization

    sd = torch.load(src, map_location="cpu", weights_only=True)
    params, unmapped = import_reference_state_dict(sd)
    payload = {"params": params, "opt_state": {}, "step": 0,
               "rng": np.zeros(2, np.uint32), "epoch": 0,
               "best_score": 0.0}
    with open(dst, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    return unmapped


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--src", required=True, help="reference .pt state_dict")
    ap.add_argument("--dst", required=True, help="output .ckpt (params-only)")
    args = ap.parse_args(argv)
    unmapped = convert(args.src, args.dst)
    print(f"wrote {args.dst}")
    if unmapped:
        print("unmapped keys (left at their initialized values):")
        for k in unmapped:
            print(f"  {k}")


if __name__ == "__main__":
    main()
