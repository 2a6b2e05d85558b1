"""Trace one beam-search decode call (B=4096, k=3, bf16) on the TPU.

The beam loop runs 19 sequential steps; this trace attributes the
per-step cost (cell GEMMs, attention, vocab head / fused vocab kernel)
so the next decode optimization targets measurement, not estimates
(PERF.md "Beam decode").

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_beam.py [fused]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from vqa_tpu.models.wrapper import set_model
from vqa_tpu.tools.beam import make_beam_search

FUSED = len(sys.argv) > 1 and sys.argv[1] == "fused"
B, NOBJ, VDIM, QLEN = 4096, 36, 2048, 10
NTOKEN, K, C_LEN = 20000, 3, 20


def main():
    print("devices:", jax.devices(), "fused:", FUSED, flush=True)
    model = set_model(encoder_type="base", predictor_type="none",
                      decoder_type="butd", ntoken=NTOKEN, v_dim=VDIM,
                      embed_dim=300, hidden_dim=1024,
                      decoder_hidden_dim=1024, att_type="new", c_len=C_LEN)
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.standard_normal(
            (B, NOBJ, VDIM), dtype=np.float32)).astype(jnp.bfloat16),
        "q": jnp.asarray(rng.integers(0, NTOKEN, size=(B, QLEN)),
                         dtype=jnp.int32),
        "c": jnp.asarray(rng.integers(0, NTOKEN, size=(B, C_LEN)),
                         dtype=jnp.int32),
        "cap_len": jnp.asarray(np.full(B, C_LEN), jnp.int32),
    }
    small = {k: v[:8] for k, v in batch.items()}
    params = model.init(jax.random.PRNGKey(0), small)["params"]
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    bs = make_beam_search(model, k=K, c_len=C_LEN, start_id=NTOKEN - 3,
                          end_id=NTOKEN - 2, fused_vocab=FUSED)

    def call():
        tokens, scores = bs(params, batch)
        return np.asarray(tokens[:, 0, 0])

    for _ in range(2):
        call()
    t0 = time.perf_counter()
    call()
    print(f"steady: {(time.perf_counter() - t0) * 1e3:.1f} ms/batch",
          flush=True)

    jax.profiler.start_trace("/tmp/beam_trace")
    call()
    jax.profiler.stop_trace()
    print("trace written to /tmp/beam_trace", flush=True)


if __name__ == "__main__":
    main()
