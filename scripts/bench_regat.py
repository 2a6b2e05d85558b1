"""End-to-end ReGAT (RelationEncoder + classifier) inference throughput.

The PERF.md ReGAT rows. Measures the full model forward (question GRU +
attention + spatial corr-GCN + classifier). Two timing modes
(scripts/_bench_util.py):

- per-call (the r1 convention that measured 47.3k q/s at B=4096 f32): one
  dispatch + answer-id fetch per iteration — includes the harness relay's
  fixed ~20-30 ms per-dispatch cost;
- chained (default, same scheme as bench.py): REPS forwards
  data-dependently chained inside one jit per fetch.

``python bench_regat.py`` runs the 2-config int8 comparison (~15 min of
relay compiles); ``python bench_regat.py full`` reproduces every published
PERF.md row (6 configs, slow). Note B=16384 with use_int8 exceeds HBM by
~0.4 GB (documented in PERF.md) — the int8 rows run at B=8192.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_regat.py [full]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _bench_util import chained_ms, timed

from vqa_tpu.models.wrapper import set_model

NOBJ, VDIM, QLEN = 36, 2048, 10
NTOKEN, ANS = 20000, 3129
REPS = 8


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
        def step(c, params, batch):
            b = dict(batch, q=(batch["q"] + c[:, None]) % NTOKEN)
            predict, _ = model.apply(params, b)
            return jnp.argmax(predict, axis=-1).astype(jnp.int32)
        ms = chained_ms(step, jnp.zeros((B,), jnp.int32), (params, batch),
                        reps=REPS, mode="amortize")
    else:
        @jax.jit
        def infer(params, batch):
            predict, _ = model.apply(params, batch)
            return jnp.argmax(predict, axis=-1)
        ms = timed(infer, params, batch) * 1e3

    name = (f"B={B} {dtype.__name__}"
            f"{' +int8' if use_int8 else ''}"
            f"{' +fused' if use_pallas else ''}"
            f"{' chained' if chained else ' per-call'}")
    print(f"{name:44s} {ms:8.1f} ms   ({B / (ms / 1e3):,.0f} q/s)",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    full = len(sys.argv) > 1 and sys.argv[1] == "full"
    if full:  # every published PERF.md row
        run(4096, jnp.float32, chained=False)   # r1 convention
        run(4096, jnp.bfloat16, chained=False)
        run(16384, jnp.bfloat16, chained=False)
        run(16384, jnp.bfloat16)
    run(8192, jnp.bfloat16)
    run(8192, jnp.bfloat16, use_int8=True)


if __name__ == "__main__":
    main()
