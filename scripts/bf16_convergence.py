"""bf16 mixed-precision convergence study (VERDICT r1 item 6).

Trains the Up-Down VQA+caption MTL model on the synthetic mini-split twice
— f32 and bf16-compute (master params/moments f32) — with identical seeds
and data order, and reports the loss trajectories plus final VQA scores.
Runs on CPU (the study is about numerics, not speed). Results go into
PERF.md "bf16 training".

Usage: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/bf16_convergence.py
"""

import json
import os
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from vqa_tpu.data.synthetic import make_synthetic_root
from vqa_tpu.data.dataset import set_dataset
from vqa_tpu.data.loader import Loader
from vqa_tpu.models.wrapper import set_model
from vqa_tpu.training import optim as optim_lib
from vqa_tpu.training.state import create_train_state, make_train_step
from vqa_tpu.training.train import model_batch

STEPS = 120
BATCH = 32


def run(train_dtype: str, root: str, paths: dict) -> dict:
    import jax.numpy as jnp
    ds = set_dataset(load_path=paths["annot"],
                     feature_path=paths["feature_root"],
                     ans_dim=paths["ans_dim"],
                     caption_id_path=paths["select_path"],
                     dataset_type="vqa-e", is_train=True)
    loader = Loader(ds, BATCH, shuffle=True, seed=7, prefetch=0)
    model = set_model(encoder_type="base", predictor_type="base",
                      decoder_type="base", ntoken=paths["ntoken"],
                      v_dim=paths["v_dim"], embed_dim=16,
                      hidden_dim=64, decoder_hidden_dim=64,
                      ans_dim=paths["ans_dim"], c_len=paths["c_len"],
                      use_mtl=True)
    tx = optim_lib.make_optimizer(lr=2e-3, max_norm=0.25,
                                  steps_per_epoch=len(loader))
    sample = None
    for b in loader:
        sample = model_batch(b)
        break
    state = create_train_state(model, tx, sample, seed=1111)
    compute_dtype = jnp.bfloat16 if train_dtype == "bfloat16" else None
    step = make_train_step(model, tx, compute_dtype=compute_dtype)

    losses, i = [], 0
    while i < STEPS:
        for b in loader:
            if i >= STEPS:
                break
            state, metrics = step(state, model_batch(b))
            losses.append(float(metrics["loss"]))
            i += 1
    # quick train-split VQA score with the final params (greedy argmax)
    from vqa_tpu.training.state import make_eval_step
    eval_step = make_eval_step(model)
    score = n = 0.0
    for b in loader:
        nvalid = int(b.pop("nvalid"))
        s, _, _ = eval_step(state.params, model_batch(b))
        score += float(np.asarray(s)[:nvalid].sum())
        n += nvalid
    # confirm master params stayed f32
    import jax
    dtypes = {str(x.dtype) for x in jax.tree_util.tree_leaves(state.params)}
    return {"dtype": train_dtype, "losses": losses,
            "final_score": score / n, "param_dtypes": sorted(dtypes)}


def main():
    with tempfile.TemporaryDirectory() as root:
        paths = make_synthetic_root(root, num_images=16, num_questions=256,
                                    num_objs=6, v_dim=32, vocab_size=40,
                                    num_answers=12, seed=3)
        r32 = run("float32", root, paths)
        r16 = run("bfloat16", root, paths)

    k = max(1, STEPS // 10)
    print(f"{'step':>6} {'f32 loss':>12} {'bf16 loss':>12} {'rel diff':>10}")
    for i in range(0, STEPS, k):
        a, b = r32["losses"][i], r16["losses"][i]
        print(f"{i:>6} {a:>12.5f} {b:>12.5f} {abs(a - b) / abs(a):>10.4f}")
    a, b = r32["losses"][-1], r16["losses"][-1]
    print(f"{STEPS - 1:>6} {a:>12.5f} {b:>12.5f} {abs(a - b) / abs(a):>10.4f}")
    print(json.dumps({
        "final_loss_f32": r32["losses"][-1],
        "final_loss_bf16": r16["losses"][-1],
        "final_score_f32": r32["final_score"],
        "final_score_bf16": r16["final_score"],
        "bf16_param_dtypes": r16["param_dtypes"],
        "mean_rel_loss_gap_last20": float(np.mean([
            abs(x - y) / abs(x) for x, y in
            zip(r32["losses"][-20:], r16["losses"][-20:])])),
    }, indent=2))


if __name__ == "__main__":
    main()
