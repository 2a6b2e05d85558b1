"""Device trace of the single-task Up-Down VQA train step.

The flagship inference path is floor-proven (PERF.md "int8-GEMM
shootout") and the MTL tail is floor-proven (PERF.md round-4 c=19-20
analysis); this script produces the same evidence for the remaining
headline path — the single-task train step (157.1k q/s at B=8192,
int8 feed + bf16 mixed, PERF.md "Other measured paths"). Prints the
top device ops by total duration so the step time can be attributed:
either a lever exists (a line that shouldn't be there) or the GEMM
lines pin the floor.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/trace_train_vqa.py [B] [dense|int8] [pallas]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _trace_util import top_ops
from vqa_tpu.models.wrapper import set_model
from vqa_tpu.training import optim as optim_lib
from vqa_tpu.training.state import TrainState, make_train_step

NOBJ, VDIM, QLEN = 36, 2048, 10
NTOKEN, ANS = 20000, 3129
TRACE_DIR = "/tmp/train_vqa_trace"


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    feed = sys.argv[2] if len(sys.argv) > 2 else "int8"
    use_pallas = len(sys.argv) > 3 and sys.argv[3] == "pallas"
    print("devices:", jax.devices(), "B:", B, "feed:", feed,
          "pallas:", use_pallas, flush=True)
    model = set_model(encoder_type="base", predictor_type="base",
                      decoder_type="none", ntoken=NTOKEN, v_dim=VDIM,
                      embed_dim=300, hidden_dim=1024,
                      decoder_hidden_dim=512, ans_dim=ANS, c_len=20,
                      att_type="new", use_pallas=use_pallas)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((B, NOBJ, VDIM), dtype=np.float32)
    batch = {
        "q": jnp.asarray(rng.integers(0, NTOKEN, (B, QLEN)), dtype=jnp.int32),
        "a": jnp.asarray((rng.random((B, ANS)) < 0.01).astype(np.float32)),
    }
    if feed == "int8":
        from vqa_tpu.data.shards import quantize_features
        q8, scale = quantize_features(img)
        batch["img_q"] = jnp.asarray(q8)
        batch["img_scale"] = jnp.asarray(scale)
    else:
        batch["img"] = jnp.asarray(img)
    tx = optim_lib.make_optimizer(lr=2e-3, max_norm=0.25)
    params = model.init(jax.random.PRNGKey(0),
                        {k: v[:8] for k, v in batch.items()})["params"]
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.int32(0), rng=jax.random.key(0, impl="rbg"))
    step = make_train_step(model, tx, compute_dtype=jnp.bfloat16)

    def run(state):
        state, metrics = step(state, batch)
        np.asarray(metrics["loss"])
        return state

    for _ in range(2):
        state = run(state)
    t0 = time.perf_counter()
    for _ in range(3):
        state = run(state)
    dt = (time.perf_counter() - t0) / 3
    print(f"steady (per-dispatch timing, relay-inclusive): {dt * 1e3:.1f} "
          f"ms/step ({B / dt:,.0f} q/s)", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(2):
        state = run(state)
    jax.profiler.stop_trace()
    top_ops(TRACE_DIR)


if __name__ == "__main__":
    main()
