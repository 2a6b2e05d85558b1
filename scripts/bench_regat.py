"""End-to-end ReGAT (RelationEncoder + classifier) inference throughput.

The PERF.md ReGAT row. Measures the full model forward (question GRU +
attention + spatial corr-GCN + classifier) with per-iteration answer-id
fetches, same convention as bench.py. Compares f32/XLA (the r1 configuration
that measured 47.3k q/s at B=4096) against bf16 and bf16 + fused kernels.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_regat.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from vqa_tpu.models.wrapper import set_model

NOBJ, VDIM, QLEN = 36, 2048, 10
NTOKEN, ANS = 20000, 3129
WARMUP, ITERS = 2, 5


def run(B, dtype, use_pallas, conv_layer=1):
    model = set_model(encoder_type="relation", predictor_type="base",
                      decoder_type="none", ntoken=NTOKEN, v_dim=VDIM,
                      embed_dim=300, hidden_dim=1024, ans_dim=ANS,
                      att_type="new", conv_type="corr",
                      conv_layer=conv_layer, use_pallas=use_pallas)
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

    @jax.jit
    def infer(params, batch):
        predict, _ = model.apply(params, batch)
        return jnp.argmax(predict, axis=-1)

    for _ in range(WARMUP):
        np.asarray(infer(params, batch))
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        np.asarray(infer(params, batch))
        best = min(best, time.perf_counter() - t0)
    name = f"B={B} {dtype.__name__}{' +fused' if use_pallas else ''} conv_layer={conv_layer}"
    print(f"{name:44s} {best * 1e3:8.1f} ms   ({B / best:,.0f} q/s)",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    run(4096, jnp.float32, False)      # r1 convention (measured 47.3k q/s)
    run(4096, jnp.bfloat16, False)
    run(4096, jnp.bfloat16, True)
    run(16384, jnp.bfloat16, True)     # serving batch, fused
    run(16384, jnp.bfloat16, False)


if __name__ == "__main__":
    main()
