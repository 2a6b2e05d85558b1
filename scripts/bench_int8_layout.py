"""Can the int8 v-projection win at model level with pinned input layouts?

Chain of evidence so far (PERF.md "Round-3 int8-GEMM shootout"):
  - isolated, the int8 GEMM beats bf16 1.9x (6.66 vs 12.75 ms) and the
    bf16 GEMM is already at 97% of MXU peak — the ONLY way past the 23.2 ms
    shipping forward is int8 MXU compute;
  - in model context XLA un-fuses the int8 dequant epilogue (s32/f32
    HBM round-trips) and the fused Pallas kernel loses further (37.8 ms)
    — the model graph hands it `img_q` in XLA's chosen {2,0,1} layout and
    every 2-D consumer pays a 1.2 GB relayout copy.

This experiment pins `img_q` to row-major ({2,1,0} = major_to_minor
(0,1,2)) via jax.experimental.layout so the flatten-to-rows reshape is a
bitcast, then measures in one window:

  R1 shipping (int8 feed, bf16 GEMMs, lazy v)   — re-anchor
  R3 XLA int8 v-proj + pinned img_q layout
  R4 Pallas int8 v-proj + pinned img_q layout

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_int8_layout.py
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _bench_util import chained_ms

from vqa_tpu.models.wrapper import set_model
from vqa_tpu.data.shards import quantize_features
import vqa_tpu.ops.quant as quant_mod

B, NOBJ, VDIM, QLEN = 16384, 36, 2048, 10
NTOKEN, ANS = 20000, 3129
REPS = 6


def bench(model, params, batch, name, jit_kwargs=None):
    def step(c, params, batch):
        b = dict(batch, q=(batch["q"] + c[:, None]) % NTOKEN)
        predict, _ = model.apply({"params": params}, b)
        return jnp.argmax(predict, axis=1).astype(jnp.int32)

    try:
        ms = chained_ms(step, jnp.zeros((B,), jnp.int32), (params, batch),
                        reps=REPS, mode="amortize", jit_kwargs=jit_kwargs)
    except Exception as e:
        print(f"{name:52s} FAILED: {str(e)[:140]}", flush=True)
        return
    print(f"{name:52s} {ms:8.2f} ms/call   ({B / (ms / 1e3):,.0f} q/s)",
          flush=True)


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

    batch = {"img_q": jnp.asarray(q8),
             "img_scale": jnp.asarray(scales).astype(jnp.bfloat16),
             "q": q_tok}
    params = m_q8.init(jax.random.key(0),
                       {k: v[:32] for k, v in batch.items()})["params"]
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    import os
    if not os.environ.get("VQA_SKIP_R1"):
        bench(m_bf, params, batch, "R1 shipping: bf16 GEMMs, lazy v")

    # pin img_q (and everything else) to row-major input layouts
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    dev_sharding = SingleDeviceSharding(jax.devices()[0])

    def row_major(x):
        return Format(Layout(tuple(range(x.ndim))), dev_sharding)

    jit_kwargs = {"in_shardings": (
        Format(Layout((0,)), dev_sharding),        # carry [B]
        jax.tree_util.tree_map(row_major, params),
        jax.tree_util.tree_map(row_major, batch),
    )}
    # R3 must actually run the XLA int8 dot: m_q8 has use_pallas=True, which
    # the encoder forwards into int8_dot, so the Pallas 3-D kernel would be
    # routed unless BOTH shape gates are forced off (ADVICE r3 #2 — the old
    # int8_dot use_pallas=True monkeypatch was a no-op and R3 silently ran
    # the same config as R5 plus layout pinning).
    from vqa_tpu.ops.pallas import int8_matmul
    real_supports = int8_matmul.supports
    real_supports_3d = int8_matmul.supports_3d
    if not os.environ.get("VQA_ONLY_R5"):
        int8_matmul.supports = lambda *a, **k: False
        int8_matmul.supports_3d = lambda *a, **k: False
        try:
            bench(m_q8, params, batch, "R3 XLA int8 v-proj + pinned layouts",
                  jit_kwargs=jit_kwargs)
        finally:
            int8_matmul.supports = real_supports
            int8_matmul.supports_3d = real_supports_3d
        # R4: the Pallas route (the model's default at these shapes) with
        # the same pinned layouts — no monkeypatch needed
        bench(m_q8, params, batch,
              "R4 Pallas int8 v-proj + pinned layouts",
              jit_kwargs=jit_kwargs)
    # R5: the 3-D-native kernel (int8_dot picks it for 3-D inputs),
    # default layouts — no reshape exists in the graph to fight over
    bench(m_q8, params, batch, "R5 Pallas-3d int8 v-proj")


if __name__ == "__main__":
    main()
