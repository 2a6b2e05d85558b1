"""Device trace of the MTL (VQA + BUTD caption) train step, fused cap loss.

Captures a jax.profiler trace of the round-3 MTL training hot path
(generator.caption_loss: CE inside the remat'd decoder scan) and prints the
top device ops by total duration — the evidence for PERF.md "MTL train
step" (VERDICT r2 item 1: done = >=20k q/s *trace-verified*).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_mtl.py [B]
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _trace_util import top_ops
from vqa_tpu.models.wrapper import set_model
from vqa_tpu.training import optim as optim_lib
from vqa_tpu.training.state import TrainState, make_train_step

NOBJ, VDIM, QLEN, CLEN = 36, 2048, 10, 20
NTOKEN, ANS = 20000, 3129
TRACE_DIR = "/tmp/mtl_trace"




def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    # optional 2nd arg: caption-axis length (emulates a --length_bucket feed)
    clen = int(sys.argv[2]) if len(sys.argv) > 2 else CLEN
    # optional 3rd arg "int8": the production quantized feed (factored scan)
    feed = sys.argv[3] if len(sys.argv) > 3 else "dense"
    # optional 4th arg "pallas": the fused decode-attention kernels
    # (ops/pallas/decode_att.py) — the shipping MTL config
    use_pallas = len(sys.argv) > 4 and sys.argv[4] == "pallas"
    print("devices:", jax.devices(), "B:", B, "clen:", clen, "feed:", feed,
          "pallas:", use_pallas, flush=True)
    model = set_model(encoder_type="base", predictor_type="base",
                      decoder_type="butd", ntoken=NTOKEN, v_dim=VDIM,
                      embed_dim=300, hidden_dim=1024,
                      decoder_hidden_dim=1024, ans_dim=ANS, c_len=CLEN,
                      att_type="new", use_mtl=True, use_pallas=use_pallas)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((B, NOBJ, VDIM), dtype=np.float32)
    batch = {
        "q": jnp.asarray(rng.integers(0, NTOKEN, (B, QLEN)), dtype=jnp.int32),
        "a": jnp.asarray((rng.random((B, ANS)) < 0.01).astype(np.float32)),
        "c": jnp.asarray(rng.integers(0, NTOKEN, (B, clen)), dtype=jnp.int32),
        "cap_len": jnp.asarray(rng.integers(5, clen + 1, (B,)).astype(np.int32)),
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
