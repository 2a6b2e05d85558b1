"""End-to-end ReGAT (RelationEncoder + classifier) inference throughput.

The PERF.md ReGAT rows. Measures the full model forward (question GRU +
attention + spatial corr-GCN + classifier). Two timing modes:

- legacy per-call (the r1 convention that measured 47.3k q/s at B=4096
  f32): one dispatch + answer-id fetch per iteration — includes the harness
  relay's fixed ~20-30 ms per-dispatch cost;
- chained (default, same scheme as bench.py): REPS forwards data-dependently
  chained inside one jit per fetch, so the relay cost amortizes to ~1/REPS
  and the number reflects the chip.

Configs: f32 XLA, bf16 XLA, bf16 + int8 GCN projections (--use_int8: one
dynamic row quant shared by the 3 big GEMMs, ops/quant.py), bf16 + fused
Pallas chain kernel.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_regat.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from vqa_tpu.models.wrapper import set_model

NOBJ, VDIM, QLEN = 36, 2048, 10
NTOKEN, ANS = 20000, 3129
WARMUP, ITERS, REPS = 1, 3, 8


def run(B, dtype, use_pallas=False, use_int8=False, conv_layer=1,
        chained=True):
    model = set_model(encoder_type="relation", predictor_type="base",
                      decoder_type="none", ntoken=NTOKEN, v_dim=VDIM,
                      embed_dim=300, hidden_dim=1024, ans_dim=ANS,
                      att_type="new", conv_type="corr",
                      conv_layer=conv_layer, use_pallas=use_pallas,
                      use_int8=use_int8)
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.standard_normal((B, NOBJ, VDIM),
                                               dtype=np.float32)).astype(dtype),
        "q": jnp.asarray(rng.integers(0, NTOKEN, size=(B, QLEN)),
                         dtype=jnp.int32),
        "graph": jnp.asarray(rng.integers(0, 12, size=(B, NOBJ, NOBJ)),
                             dtype=jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0),
                        {k: v[:8] for k, v in batch.items()})
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)

    if chained:
        @jax.jit
        def infer(params, batch):
            def step(i, c):
                b = dict(batch, q=(batch["q"] + c[:, None]) % NTOKEN)
                predict, _ = model.apply(params, b)
                return jnp.argmax(predict, axis=-1).astype(jnp.int32)
            return jax.lax.fori_loop(0, REPS, step,
                                     jnp.zeros((B,), jnp.int32))
        per_fetch = REPS
    else:
        @jax.jit
        def infer(params, batch):
            predict, _ = model.apply(params, batch)
            return jnp.argmax(predict, axis=-1)
        per_fetch = 1

    for _ in range(WARMUP):
        np.asarray(infer(params, batch))
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        np.asarray(infer(params, batch))
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / per_fetch
    name = (f"B={B} {dtype.__name__}"
            f"{' +int8' if use_int8 else ''}"
            f"{' +fused' if use_pallas else ''}"
            f"{' chained' if chained else ' per-call'}")
    print(f"{name:44s} {ms:8.1f} ms   ({B / (ms / 1e3):,.0f} q/s)",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    # B=16384 + the int8 activation copies exceeds HBM by ~0.4 GB -> the
    # int8 comparison runs at B=8192 (bf16 row alongside for apples/apples)
    run(8192, jnp.bfloat16)
    run(8192, jnp.bfloat16, use_int8=True)


if __name__ == "__main__":
    main()
