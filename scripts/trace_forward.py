"""Capture a jax.profiler trace of the headline Up-Down forward on the TPU.

Writes an XPlane trace under /tmp/vqa_trace and prints the top ops by
self-time so the next optimization targets the measured bottleneck, not the
estimated one (PERF.md 'Where the forward time goes' is FLOP-derived).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_forward.py [fast]
  fast = bf16 params + Pallas GRU (the shipping fast config)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from vqa_tpu.models.wrapper import set_model

FAST = len(sys.argv) > 1 and sys.argv[1] == "fast"
B, NOBJ, VDIM, QLEN = 16384, 36, 2048, 10
NTOKEN, ANS = 20000, 3129


def main():
    print("devices:", jax.devices(), "fast:", FAST, flush=True)
    model = set_model(encoder_type="base", predictor_type="base",
                      decoder_type="none", ntoken=NTOKEN, v_dim=VDIM,
                      embed_dim=300, hidden_dim=1024, ans_dim=ANS,
                      att_type="new", use_pallas=FAST)
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.standard_normal((B, NOBJ, VDIM),
                                               dtype=np.float32)),
        "q": jnp.asarray(rng.integers(0, NTOKEN, size=(B, QLEN)),
                         dtype=jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0),
                        {k: v[:64] for k, v in batch.items()})
    if FAST:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
        batch["img"] = batch["img"].astype(jnp.bfloat16)

    @jax.jit
    def infer(params, batch):
        predict, _ = model.apply(params, batch)
        return jnp.argmax(predict, axis=-1)

    # compile + warm
    for _ in range(2):
        np.asarray(infer(params, batch))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(infer(params, batch))
    dt = (time.perf_counter() - t0) / 3
    print(f"steady: {dt * 1e3:.1f} ms/call ({B / dt:,.0f} q/s)", flush=True)

    jax.profiler.start_trace("/tmp/vqa_trace")
    for _ in range(2):
        np.asarray(infer(params, batch))
    jax.profiler.stop_trace()
    print("trace written to /tmp/vqa_trace", flush=True)


if __name__ == "__main__":
    main()
