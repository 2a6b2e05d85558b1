"""Numerics-variant convergence study (VERDICT r1 item 6; extended r4/r5).

Trains the Up-Down VQA+caption MTL model on the synthetic mini-split with
identical seeds and data order under each numerics variant —

  f32            pure float32 (the reference's arithmetic)
  bf16           bf16 compute, f32 master params/moments (the default)
  int8feed-bf16  int8 quantized feature feed + bf16 compute (the shipping
                 fast-config economics, data/shards.quantize_features)

— and reports loss trajectories plus final train-split VQA scores. Runs on
CPU (the study is about numerics, not speed). Results are recorded in
PERF.md "bf16 training" — step-parity tests pin per-step agreement, this
pins that the variants *converge* alike over a long horizon.

``--decoder butd`` (round 5, VERDICT r4 item 3) runs the SAME study
through the shipping MTL decode path: the BUTD decoder with
MultiplyAttention, whose teacher-forcing scan trains through the
hand-written custom-VJP backward (ops/decode_scan.py) — including, in the
int8feed variant, the factored-v int8 scan. The script asserts the
custom-VJP scan was actually constructed (no silent fallback to nn.scan),
so the trajectories certify the most hand-derived math in the repo at
convergence horizon, not just step parity (tests/test_models.py).

Usage:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/bf16_convergence.py \
      [--steps 600] [--decoder base|butd]
"""

import argparse
import json
import os
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from vqa_tpu.data.synthetic import make_synthetic_root
from vqa_tpu.data.dataset import set_dataset
from vqa_tpu.data.loader import Loader
from vqa_tpu.data.shards import quantize_features
from vqa_tpu.models.wrapper import set_model
from vqa_tpu.training import optim as optim_lib
from vqa_tpu.training.state import (
    create_train_state, make_eval_step, make_train_step,
)
from vqa_tpu.training.train import model_batch

BATCH = 32


def _int8_feed(batch):
    """Replace the dense feature tensor with the production int8 feed."""
    import jax.numpy as jnp
    q8, scales = quantize_features(np.asarray(batch["img"]))
    out = {k: v for k, v in batch.items() if k != "img"}
    out["img_q"] = jnp.asarray(q8)
    out["img_scale"] = jnp.asarray(scales)
    return out


def run(variant: str, root: str, paths: dict, steps: int,
        decoder: str = "base") -> dict:
    import jax
    import jax.numpy as jnp

    ds = set_dataset(load_path=paths["annot"],
                     feature_path=paths["feature_root"],
                     ans_dim=paths["ans_dim"],
                     caption_id_path=paths["select_path"],
                     dataset_type="vqa-e", is_train=True)
    loader = Loader(ds, BATCH, shuffle=True, seed=7, prefetch=0)
    # butd: the shipping MTL decode path — BUTD + MultiplyAttention
    # ("new"), which trains through the custom-VJP teacher-forcing scan
    # (ops/decode_scan.py; factored-v int8 route under the int8 feed)
    model = set_model(encoder_type="base", predictor_type="base",
                      decoder_type=decoder, ntoken=paths["ntoken"],
                      v_dim=paths["v_dim"], embed_dim=16,
                      hidden_dim=64, decoder_hidden_dim=64,
                      ans_dim=paths["ans_dim"], c_len=paths["c_len"],
                      att_type="new" if decoder == "butd" else "base",
                      use_mtl=True)
    fused_calls = [0]
    if decoder == "butd":
        # certify the fused custom-VJP scan is the path actually traced
        # (it would silently fall back to nn.scan if its guards failed)
        from vqa_tpu.ops import decode_scan as _ds
        _orig = _ds.make_butd_caption_scan

        def _counting(*a, **k):
            fused_calls[0] += 1
            return _orig(*a, **k)
        _ds.make_butd_caption_scan = _counting
    tx = optim_lib.make_optimizer(lr=2e-3, max_norm=0.25,
                                  steps_per_epoch=len(loader))
    sample = None
    for b in loader:
        sample = model_batch(b)
        break
    # identical init across variants: always from the dense sample
    state = create_train_state(model, tx, sample, seed=1111)
    compute_dtype = None if variant == "f32" else jnp.bfloat16
    feed = _int8_feed if variant == "int8feed-bf16" else (lambda b: b)
    step = make_train_step(model, tx, compute_dtype=compute_dtype)

    losses, i = [], 0
    try:
        while i < steps:
            for b in loader:
                if i >= steps:
                    break
                state, metrics = step(state, feed(model_batch(b)))
                losses.append(float(metrics["loss"]))
                i += 1
    finally:
        if decoder == "butd":
            _ds.make_butd_caption_scan = _orig
    if decoder == "butd":
        assert fused_calls[0] > 0, (
            "BUTD study requested but the custom-VJP scan was never "
            "constructed — the fused path silently fell back to nn.scan")
    # quick train-split VQA score with the final params (greedy argmax),
    # always evaluated on the dense feed so the score is comparable
    eval_step = make_eval_step(model)
    score = n = 0.0
    for b in loader:
        nvalid = int(b.pop("nvalid"))
        s, _, _ = eval_step(state.params, model_batch(b))
        score += float(np.asarray(s)[:nvalid].sum())
        n += nvalid
    dtypes = {str(x.dtype) for x in jax.tree_util.tree_leaves(state.params)}
    return {"variant": variant, "losses": losses,
            "final_score": score / n, "param_dtypes": sorted(dtypes),
            "fused_scan_traces": fused_calls[0]}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=600,
                        help="training steps per variant (600 = ~75 epochs "
                             "of the mini-split: the long-horizon study)")
    parser.add_argument("--decoder", choices=("base", "butd"),
                        default="base",
                        help="butd = the shipping MTL decode path: BUTD + "
                             "MultiplyAttention through the custom-VJP "
                             "teacher-forcing scan (ops/decode_scan.py)")
    args = parser.parse_args()
    steps = args.steps

    with tempfile.TemporaryDirectory() as root:
        paths = make_synthetic_root(root, num_images=16, num_questions=256,
                                    num_objs=6, v_dim=32, vocab_size=40,
                                    num_answers=12, seed=3)
        runs = [run(v, root, paths, steps, decoder=args.decoder)
                for v in ("f32", "bf16", "int8feed-bf16")]

    r32, r16, rq8 = runs
    k = max(1, steps // 10)
    print(f"{'step':>6} {'f32 loss':>12} {'bf16 loss':>12} {'int8f loss':>12}")
    idxs = list(range(0, steps, k)) + [steps - 1]
    for i in idxs:
        print(f"{i:>6} {r32['losses'][i]:>12.5f} {r16['losses'][i]:>12.5f} "
              f"{rq8['losses'][i]:>12.5f}")

    def gap(a, b):
        return float(np.mean([abs(x - y) / abs(x)
                              for x, y in zip(a[-20:], b[-20:])]))

    print(json.dumps({
        "steps": steps,
        "decoder": args.decoder,
        "final_loss": {r["variant"]: r["losses"][-1] for r in runs},
        "final_score": {r["variant"]: r["final_score"] for r in runs},
        "bf16_param_dtypes": r16["param_dtypes"],
        "fused_scan_traces": {r["variant"]: r["fused_scan_traces"]
                              for r in runs},
        "mean_rel_loss_gap_last20": {
            "bf16_vs_f32": gap(r32["losses"], r16["losses"]),
            "int8feed_vs_f32": gap(r32["losses"], rq8["losses"]),
        },
    }, indent=2))


if __name__ == "__main__":
    main()
