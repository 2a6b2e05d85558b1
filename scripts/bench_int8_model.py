"""Flagship forward: bf16 vs int8-fed v-projection, relay cost canceled.

Back-to-back comparison of the Up-Down inference forward (B=16384,
use_pallas GRU) with the dense bf16 feed vs the quantized int8 feed
(--use_int8 path: the dominant v-projection GEMM runs int8 on the MXU).
Same methodology as profile_gcn.py: REPS iterations inside one jit with a
data dependency (predicted ids perturb the next iteration's question
tokens), per-call ms = (t(N)-t(1))/(N-1).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_int8_model.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _bench_util import chained_ms

from vqa_tpu.models.wrapper import set_model
from vqa_tpu.data.shards import quantize_features

B, NOBJ, VDIM, QLEN = 16384, 36, 2048, 10
NTOKEN, ANS = 20000, 3129
REPS = 6


def bench(model, params, batch, name):
    def step(c, params, batch):
        b = dict(batch, q=(batch["q"] + c[:, None]) % NTOKEN)
        predict, _ = model.apply({"params": params}, b)
        return jnp.argmax(predict, axis=1).astype(jnp.int32)

    ms = chained_ms(step, jnp.zeros((B,), jnp.int32), (params, batch),
                    reps=REPS, mode="amortize")
    print(f"{name:40s} {ms:8.2f} ms/call   ({B / (ms / 1e3):,.0f} q/s)",
          flush=True)
    return ms


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, NOBJ, VDIM), dtype=np.float32)
    q8, scales = quantize_features(x)
    q_tok = jnp.asarray(rng.integers(0, NTOKEN, (B, QLEN)).astype(np.int32))

    kw = dict(encoder_type="base", predictor_type="base", decoder_type="none",
              ntoken=NTOKEN, v_dim=VDIM, embed_dim=300, hidden_dim=1024,
              ans_dim=ANS, dropout=0.2, att_type="new", use_pallas=True)
    m_bf = set_model(**kw)
    m_q8 = set_model(use_int8=True, **kw)

    batch_bf = {"img": jnp.asarray(x).astype(jnp.bfloat16), "q": q_tok}
    batch_q8 = {"img_q": jnp.asarray(q8),
                "img_scale": jnp.asarray(scales).astype(jnp.bfloat16),
                "q": q_tok}
    small = {k: v[:32] for k, v in batch_q8.items()}
    params = m_q8.init(jax.random.key(0), small)["params"]
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    bench(m_bf, params, batch_bf, "bf16 feed, bf16 GEMMs")
    # the use_int8 model routes the v-projection through the fused Pallas
    # int8 GEMM (ops/pallas/int8_matmul.py) when use_pallas is on; forcing
    # BOTH shape gates off isolates the XLA int8_dot route for the same
    # graph (a 3-D img_q takes the supports_3d gate first — patching only
    # supports() would leave the Pallas 3-D kernel routed, ADVICE r3 #1)
    from vqa_tpu.ops.pallas import int8_matmul
    real_supports = int8_matmul.supports
    real_supports_3d = int8_matmul.supports_3d
    int8_matmul.supports = lambda *a, **k: False
    int8_matmul.supports_3d = lambda *a, **k: False
    bench(m_q8, params, batch_q8, "int8 feed, int8 v-proj (XLA) + lazy v")
    int8_matmul.supports = real_supports
    int8_matmul.supports_3d = real_supports_3d
    bench(m_q8, params, batch_q8, "int8 feed, int8 v-proj (Pallas) + lazy v")
    # int8 feed + bf16 GEMMs: the dequant fuses into both feature reads
    # (projection operand + att*v pooling), halving their HBM traffic,
    # without the int8 GEMM's dequant epilogue. lazy_v=False isolates the
    # r2 fast config; the lazy-v row pools att*scale weights directly over
    # the int8 payload so the dequantized v never materializes (VERDICT r2
    # item 5 accept/reject measurement)
    m_mat = m_bf.clone(encoder=m_bf.encoder.clone(lazy_v=False))
    bench(m_mat, params, batch_q8, "int8 feed, bf16 GEMMs, materialized")
    bench(m_bf, params, batch_q8, "int8 feed, bf16 GEMMs, lazy v")


if __name__ == "__main__":
    main()
