"""Beam-decode throughput: XLA vocab head vs the fused Pallas vocab head.

Extends the PERF.md "Beam decode" table (r2 baseline: 16,762 captions/s at
B=4096, k=3, bf16, c_len=20). The fused head (ops/pallas/vocab_topk.py)
replaces the per-step [B*k, V] logits materialization + lax.top_k +
logsumexp with GEMM + running top-k + online logsumexp in one kernel.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_beam.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from vqa_tpu.models.wrapper import set_model
from vqa_tpu.tools.beam import make_beam_search

NOBJ, VDIM, QLEN = 36, 2048, 10
NTOKEN = 20000
K, C_LEN = 3, 20
WARMUP, ITERS = 2, 4


def run(B, dtype, fused, streams=1, approx=False):
    model = set_model(encoder_type="base", predictor_type="none",
                      decoder_type="butd", ntoken=NTOKEN, v_dim=VDIM,
                      embed_dim=300, hidden_dim=1024,
                      decoder_hidden_dim=1024, att_type="new", c_len=C_LEN)
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.standard_normal(
            (B, NOBJ, VDIM), dtype=np.float32)).astype(dtype),
        "q": jnp.asarray(rng.integers(0, NTOKEN, size=(B, QLEN)),
                         dtype=jnp.int32),
        "c": jnp.asarray(rng.integers(0, NTOKEN, size=(B, C_LEN)),
                         dtype=jnp.int32),
        "cap_len": jnp.asarray(np.full(B, C_LEN), jnp.int32),
    }
    small = {k: v[:8] for k, v in batch.items()}
    params = model.init(jax.random.PRNGKey(0), small)["params"]
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)
    bs = make_beam_search(model, k=K, c_len=C_LEN, start_id=NTOKEN - 3,
                          end_id=NTOKEN - 2, fused_vocab=fused,
                          streams=streams, approx_topk=approx)

    def call():
        tokens, scores = bs(params, batch)
        return np.asarray(tokens[:, 0, 0])

    for _ in range(WARMUP):
        call()
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        call()
        best = min(best, time.perf_counter() - t0)
    name = (f"B={B} {dtype.__name__} {'fused-vocab' if fused else 'XLA'}"
            f" S={streams}{' approx-topk' if approx else ''}")
    print(f"{name:44s} {best * 1e3:8.1f} ms   ({B / best:,.0f} captions/s)",
          flush=True)


def main():
    import sys
    print("devices:", jax.devices(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "fused"):
        for fused in (False, True):
            run(4096, jnp.bfloat16, fused)
    if which in ("all", "approx"):
        # opt-in serving trade: approx_max_k (recall .99) vocab top-k
        run(4096, jnp.bfloat16, False, approx=True)
    if which in ("all", "streams"):
        # software-pipelined sub-batches: stream B's MXU work fills
        # stream A's VPU (top_k) tail
        run(4096, jnp.bfloat16, False, streams=2)
        run(4096, jnp.bfloat16, False, streams=4)
        run(8192, jnp.bfloat16, False, streams=2)
        run(8192, jnp.bfloat16, False, streams=1)


if __name__ == "__main__":
    main()
