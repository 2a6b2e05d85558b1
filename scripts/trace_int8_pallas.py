"""Trace the Pallas-int8-GEMM model variant to name its in-situ loss.

The fused int8 GEMM kernel ties XLA isolated (6.8 ms) yet the model variant
measures 37.8 ms vs 23.2 shipping — ~16 ms beyond what the kernel + its
small epilogue can account for. This traces the exact R4 configuration of
scripts/bench_int8_layout.py and prints leaf device ops.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_int8_pallas.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _trace_util import top_ops

from vqa_tpu.models.wrapper import set_model
from vqa_tpu.data.shards import quantize_features
import vqa_tpu.ops.quant as quant_mod

B, NOBJ, VDIM, QLEN = 16384, 36, 2048, 10
NTOKEN, ANS = 20000, 3129
TRACE_DIR = "/tmp/int8_pallas_trace"


def main():
    print("devices:", jax.devices(), flush=True)
    real = quant_mod.int8_dot
    quant_mod.int8_dot = lambda *a, **k: real(*a, **{**k, "use_pallas": True})

    model = set_model(encoder_type="base", predictor_type="base",
                      decoder_type="none", ntoken=NTOKEN, v_dim=VDIM,
                      embed_dim=300, hidden_dim=1024, ans_dim=ANS,
                      dropout=0.2, att_type="new", use_pallas=True,
                      use_int8=True)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, NOBJ, VDIM), dtype=np.float32)
    q8, scales = quantize_features(x)
    batch = {"img_q": jnp.asarray(q8),
             "img_scale": jnp.asarray(scales).astype(jnp.bfloat16),
             "q": jnp.asarray(rng.integers(0, NTOKEN, (B, QLEN))
                              .astype(np.int32))}
    params = model.init(jax.random.PRNGKey(0),
                        {k: v[:32] for k, v in batch.items()})
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    @jax.jit
    def infer(params, batch):
        predict, _ = model.apply(params, batch)
        return jnp.argmax(predict, axis=-1)

    np.asarray(infer(params, batch))          # compile + warm
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(2):
        np.asarray(infer(params, batch))
    jax.profiler.stop_trace()
    print("trace written to", TRACE_DIR, flush=True)
    top_ops(TRACE_DIR)


if __name__ == "__main__":
    main()
