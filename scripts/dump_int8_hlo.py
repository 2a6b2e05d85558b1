"""Dump the TPU-optimized HLO of the int8-GEMM inference forward.

Diagnostic for the model-level int8 regression (PERF.md "int8 MXU compute"):
the standalone [B*36, 2048] @ [2048, 1024] int8 GEMM with fused dequant
epilogue beats bf16 1.9x (scripts/bench_int8_kernel.py), yet the model-level
use_int8 row loses. This compiles the exact inference forward (no Pallas, so
the compile is fast and the int8 dot is XLA's) and prints every s8/s32 dot
plus the instructions around it, so the extra HBM passes can be named.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dump_int8_hlo.py
Writes /tmp/int8_hlo.txt.
"""

import re
import sys

import numpy as np
import jax
import jax.numpy as jnp

from vqa_tpu.models.wrapper import set_model
from vqa_tpu.data.shards import quantize_features

B, NOBJ, VDIM, QLEN = 16384, 36, 2048, 10
NTOKEN, ANS = 20000, 3129


def main():
    model = set_model(encoder_type="base", predictor_type="base",
                      decoder_type="none", ntoken=NTOKEN, v_dim=VDIM,
                      embed_dim=300, hidden_dim=1024, ans_dim=ANS,
                      att_type="new", use_pallas=False, use_int8=True)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, NOBJ, VDIM), dtype=np.float32)
    q8, scales = quantize_features(x)
    batch = {
        "img_q": jnp.asarray(q8),
        "img_scale": jnp.asarray(scales).astype(jnp.bfloat16),
        "q": jnp.asarray(rng.integers(0, NTOKEN, (B, QLEN)).astype(np.int32)),
    }
    params = model.init(jax.random.PRNGKey(0),
                        {k: v[:32] for k, v in batch.items()})["params"]
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    def infer(params, batch):
        predict, _ = model.apply({"params": params}, batch)
        return jnp.argmax(predict, axis=-1)

    print("lower+compile ...", flush=True)
    compiled = jax.jit(infer).lower(params, batch).compile()
    (text,) = [m.to_string() for m in compiled.runtime_executable()
               .hlo_modules()] if hasattr(compiled, "runtime_executable") \
        else [compiled.as_text()]
    with open("/tmp/int8_hlo.txt", "w") as f:
        f.write(text)
    lines = text.splitlines()
    print(f"wrote /tmp/int8_hlo.txt ({len(lines)} lines)\n", flush=True)
    # every dot and every >=0.5 GB intermediate around the int8 one
    for i, ln in enumerate(lines):
        if re.search(r"= s32\[|dot\(", ln) and "dot" in ln:
            print(ln.strip()[:260])
    print("\nlarge intermediates (>=0.5 GB):")
    for ln in lines:
        m = re.match(r"\s*%?\S+ = (\w+)\[([\d,]*)\]", ln)
        if not m:
            continue
        dt, dims = m.groups()
        size = {"s8": 1, "u8": 1, "bf16": 2, "f16": 2, "f32": 4, "s32": 4,
                "u32": 4}.get(dt)
        if not size or not dims:
            continue
        n = int(np.prod([int(d) for d in dims.split(",") if d]))
        if n * size >= 0.5e9:
            print(f"  {n * size / 1e9:5.2f} GB  {ln.strip()[:200]}")


if __name__ == "__main__":
    main()
