"""Capture a jax.profiler trace of the headline Up-Down forward on the TPU.

Writes an XPlane trace under /tmp/vqa_trace and prints the top ops by
self-time so the next optimization targets the measured bottleneck, not the
estimated one (PERF.md 'Where the forward time goes' is FLOP-derived).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_forward.py [MODE]
  MODE: fast  = bf16 params + Pallas GRU (dense bf16 feed)
        int8feed = fast + int8 feature feed, bf16 GEMMs + lazy v
                   (the shipping fast config)
        int8  = int8feed + the int8 v-projection GEMM (--use_int8)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _trace_util import top_ops
from vqa_tpu.models.wrapper import set_model

MODE = sys.argv[1] if len(sys.argv) > 1 else ""
FAST = MODE in ("fast", "int8", "int8feed")
B, NOBJ, VDIM, QLEN = 16384, 36, 2048, 10
NTOKEN, ANS = 20000, 3129


def main():
    print("devices:", jax.devices(), "mode:", MODE or "f32", flush=True)
    model = set_model(encoder_type="base", predictor_type="base",
                      decoder_type="none", ntoken=NTOKEN, v_dim=VDIM,
                      embed_dim=300, hidden_dim=1024, ans_dim=ANS,
                      att_type="new", use_pallas=FAST,
                      use_int8=(MODE == "int8"))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, NOBJ, VDIM), dtype=np.float32)
    batch = {
        "q": jnp.asarray(rng.integers(0, NTOKEN, size=(B, QLEN)),
                         dtype=jnp.int32),
    }
    if MODE in ("int8", "int8feed"):
        from vqa_tpu.data.shards import quantize_features
        q8, scales = quantize_features(x)
        batch["img_q"] = jnp.asarray(q8)
        batch["img_scale"] = jnp.asarray(scales).astype(jnp.bfloat16)
    else:
        batch["img"] = jnp.asarray(x)
    params = model.init(jax.random.PRNGKey(0),
                        {k: v[:64] for k, v in batch.items()})
    if FAST:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
        if "img" in batch:
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
    top_ops("/tmp/vqa_trace")


if __name__ == "__main__":
    main()
