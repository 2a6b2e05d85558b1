"""Benchmark: Up-Down VQA batch-inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "questions/s", "vs_baseline": R}

The headline BASELINE.json target is >= 5x the reference PyTorch GPU
questions/sec for batch inference. The reference publishes no speed numbers
(SURVEY.md section 6), so the baseline is anchored to a measurement taken on
this host (2026-08-16, torch 2.x CPU): the reference model (GRU question
encoder + 36-box fusion attention + 2-layer classifier, ~0.25
GFLOP/question) run through its eager eval loop shape (batch 128 forward,
`/root/reference/train.py:162-222`) sustains **165 questions/s on one CPU
core** (773 ms/batch-128, single-threaded — this container exposes 1 core).
The 2019-class single GPU implied by the repo runs the same eager loop
~15-40x faster than one CPU core for this GEMM mix; the upstream
bottom-up-attention-vqa codebase this reference derives from reports epoch
times equivalent to ~2.2k q/s *training* on a Titan Xp, putting eager eval
at roughly 2x that. REF_GPU_QPS = 165 x 30 = ~5,000 q/s encodes the
measured floor x documented factor (2x the round-1 guess of 2,500 —
deliberately the stricter bar). vs_baseline = value / (5 * REF_GPU_QPS), so
vs_baseline >= 1.0 means the 5x target is met.

Two configurations (see PERF.md):
- fast: int8 feature feed + bf16 parameters + lazy-v pooling + the streaming
  Pallas GRU kernel (716k q/s measured, round 3) — long XLA compile through
  this harness's remote-compile relay (~5-7 min), and one observed compile
  hang, so it runs in a watchdogged subprocess;
- safe: f32 XLA (226k q/s, ~40 s compile) — the fallback that always lands.

Measurement notes:
- Each timed iteration runs REPS=8 *data-dependently chained* forwards in
  one jit (every forward's predicted ids perturb the next one's question
  tokens) and fetches the final ids to the host (np.asarray). The fetched
  values depend on every chained forward, so execution is provably complete
  — while the harness relay's fixed per-dispatch cost (~20-30 ms, which a
  production TPU host does not pay and which dominated the r1 per-call
  numbers) amortizes to ~1/8 per forward. (block_until_ready resolves early
  through the relay, so fetches are the only reliable completion signal;
  queueing multiple executions before a fetch can hang the relay, so the
  loop is strictly serial.)
- Inputs are staged in HBM outside the loop. The harness tunnel's
  host->device bandwidth (~130 MB/s) is two orders of magnitude below a real
  v5e host link, so including the 75 MB/batch feature upload would benchmark
  the test tunnel, not the chip; the production feed path (packed shards ->
  prefetch loader -> device_put) is exercised in tests and main.py instead.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REF_GPU_QPS = 5000.0   # measured CPU floor x documented GPU factor, see docstring
REF_CPU_QPS = 165.0    # measured: eager eval loop, 1 CPU core, this host
TARGET_MULTIPLIER = 5.0

BATCH_SIZE = 16384
WARMUP = 2
ITERS = 3
REPS = 8           # forwards chained per fetch (data-dependent; see below)
FAST_TIMEOUT_S = 720

NTOKEN = 20000
ANS_DIM = 3129
NUM_OBJS = 36
V_DIM = 2048
Q_LEN = 10


def run_config(fast: bool) -> float:
    import jax
    import jax.numpy as jnp
    from vqa_tpu.models.wrapper import set_model

    try:
        from ml_dtypes import bfloat16 as feat_dtype
    except ImportError:
        feat_dtype = np.float32

    model = set_model(
        encoder_type="base", predictor_type="base", decoder_type="none",
        ntoken=NTOKEN, v_dim=V_DIM, embed_dim=300, hidden_dim=1024,
        decoder_hidden_dim=512, ans_dim=ANS_DIM, c_len=20, dropout=0.2,
        att_type="new", use_pallas=fast)

    rng = np.random.default_rng(0)
    batches = []
    for _ in range(2):  # rotate distinct device-resident batches
        x = rng.standard_normal((BATCH_SIZE, NUM_OBJS, V_DIM),
                                dtype=np.float32)
        b = {"q": jnp.asarray(
            rng.integers(0, NTOKEN, (BATCH_SIZE, Q_LEN)).astype(np.int32))}
        if fast:
            # the production int8 feed with bf16 scales + lazy v (the
            # encoder pools attended features directly over the int8
            # payload, so the dequantized [B, objs, v_dim] tensor is never
            # materialized — models/encoder.py lazy_v, on by default):
            # measured 22.9 ms/call vs 31.5 materialized and 33.4 for the
            # dense bf16 feed, and faster than running the GEMM itself in
            # int8 (PERF.md "int8 MXU")
            from vqa_tpu.data.shards import quantize_features
            q8, scales = quantize_features(x)
            b["img_q"] = jnp.asarray(q8)
            b["img_scale"] = jnp.asarray(scales).astype(jnp.bfloat16)
        else:
            b["img"] = jnp.asarray(x.astype(feat_dtype))
        batches.append(b)
    small = {k: v[:32] for k, v in batches[0].items()}
    params = model.init(jax.random.key(0), small)["params"]
    if fast:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params)

    # REPS forwards are chained inside one jit with a data dependency (each
    # iteration's predicted ids perturb the next iteration's question
    # tokens), and the fetched result depends on every link — as strong a
    # completion proof as per-iteration fetches, but the harness relay's
    # fixed per-dispatch cost (~20-30 ms, absent on a production TPU host)
    # amortizes to ~1/REPS per forward instead of dominating the number.
    @jax.jit
    def infer_chain(params, batch):
        def step(i, c):
            b = dict(batch, q=(batch["q"] + c[:, None]) % NTOKEN)
            predict, _ = model.apply({"params": params}, b)
            return jnp.argmax(predict, axis=1).astype(jnp.int32)
        return jax.lax.fori_loop(
            0, REPS, step, jnp.zeros((BATCH_SIZE,), jnp.int32))

    for i in range(WARMUP):
        np.asarray(infer_chain(params, batches[i % 2]))

    start = time.perf_counter()
    for i in range(ITERS):
        labels = np.asarray(infer_chain(params, batches[i % 2]))
    elapsed = time.perf_counter() - start
    assert labels.shape == (BATCH_SIZE,)
    return BATCH_SIZE * REPS * ITERS / elapsed


def emit(qps: float) -> None:
    print(json.dumps({
        "metric": "vqa_updown_batch_inference_questions_per_sec_per_chip",
        "value": round(qps, 1),
        "unit": "questions/s",
        "vs_baseline": round(qps / (TARGET_MULTIPLIER * REF_GPU_QPS), 3),
    }))


def main():
    cfg = os.environ.get("VQA_BENCH_CONFIG", "")
    if cfg:  # child process: run one configuration and print the raw qps
        print(f"QPS {run_config(fast=(cfg == 'fast')):.1f}")
        return

    # try the fast configuration under a watchdog, fall back to safe
    env = dict(os.environ, VQA_BENCH_CONFIG="fast",
               PYTHONPATH=os.path.dirname(os.path.abspath(__file__))
               + os.pathsep + os.environ.get("PYTHONPATH", ""))
    try:
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, capture_output=True, text=True,
                              timeout=FAST_TIMEOUT_S)
        for line in proc.stdout.splitlines():
            if line.startswith("QPS "):
                emit(float(line.split()[1]))
                return
    except subprocess.TimeoutExpired:
        pass
    emit(run_config(fast=False))


if __name__ == "__main__":
    main()
