"""Trace one ReGAT inference call (B=8192, bf16, spatial corr-GCN) on TPU.

Attributes the per-call cost across the GCN projections, correlation
einsum, graph-local chain and the base encoder, completing the
trace-backed PERF.md story (flagship: trace_forward.py, beam:
trace_beam.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_regat.py [int8]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from vqa_tpu.models.wrapper import set_model

INT8 = len(sys.argv) > 1 and sys.argv[1] == "int8"
B, NOBJ, VDIM, QLEN = 8192, 36, 2048, 10
NTOKEN, ANS = 20000, 3129


def main():
    print("devices:", jax.devices(), "int8:", INT8, flush=True)
    model = set_model(encoder_type="relation", predictor_type="base",
                      decoder_type="none", ntoken=NTOKEN, v_dim=VDIM,
                      embed_dim=300, hidden_dim=1024, ans_dim=ANS,
                      att_type="new", conv_type="corr", conv_layer=1,
                      use_int8=INT8)
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.standard_normal(
            (B, NOBJ, VDIM), dtype=np.float32)).astype(jnp.bfloat16),
        "q": jnp.asarray(rng.integers(0, NTOKEN, size=(B, QLEN)),
                         dtype=jnp.int32),
        "graph": jnp.asarray(rng.integers(0, 12, size=(B, NOBJ, NOBJ)),
                             dtype=jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0),
                        {k: v[:8] for k, v in batch.items()})
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)

    @jax.jit
    def infer(params, batch):
        predict, _ = model.apply(params, batch)
        return jnp.argmax(predict, axis=-1)

    for _ in range(2):
        np.asarray(infer(params, batch))
    t0 = time.perf_counter()
    np.asarray(infer(params, batch))
    print(f"steady: {(time.perf_counter() - t0) * 1e3:.1f} ms/call",
          flush=True)

    jax.profiler.start_trace("/tmp/regat_trace")
    for _ in range(2):
        np.asarray(infer(params, batch))
    jax.profiler.stop_trace()
    print("trace written to /tmp/regat_trace", flush=True)


if __name__ == "__main__":
    main()
