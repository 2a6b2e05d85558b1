"""Dump the TPU-optimized HLO of the MTL train step and explain the
fusions the device trace names (scripts/trace_mtl.py), so trace rows like
`multiply_reduce_fusion.43` can be attributed to model ops.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dump_mtl_hlo.py \
        [B] [fusion.1126 multiply_reduce_fusion.43 ...]
Writes the full text to /tmp/mtl_hlo.txt and prints each requested fusion's
computation body (shapes + root expression).
"""

import re
import sys

import numpy as np
import jax
import jax.numpy as jnp

from vqa_tpu.models.wrapper import set_model
from vqa_tpu.training import optim as optim_lib
from vqa_tpu.training.state import TrainState, make_train_step

NOBJ, VDIM, QLEN, CLEN = 36, 2048, 10, 20
NTOKEN, ANS = 20000, 3129


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    # optional: clen + feed (match a trace_mtl.py invocation), then names
    argv = sys.argv[2:]
    clen = int(argv.pop(0)) if argv and argv[0].isdigit() else CLEN
    feed = argv.pop(0) if argv and argv[0] in ("dense", "int8") else "dense"
    use_pallas = bool(argv) and argv[0] == "pallas"
    if use_pallas:
        argv.pop(0)
    names = argv
    model = set_model(encoder_type="base", predictor_type="base",
                      decoder_type="butd", ntoken=NTOKEN, v_dim=VDIM,
                      embed_dim=300, hidden_dim=1024,
                      decoder_hidden_dim=1024, ans_dim=ANS, c_len=CLEN,
                      att_type="new", use_mtl=True, use_pallas=use_pallas)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((B, NOBJ, VDIM), dtype=np.float32)
    batch = {
        "q": jnp.asarray(rng.integers(0, NTOKEN, (B, QLEN)), dtype=jnp.int32),
        "a": jnp.asarray((rng.random((B, ANS)) < 0.01).astype(np.float32)),
        "c": jnp.asarray(rng.integers(0, NTOKEN, (B, clen)), dtype=jnp.int32),
        "cap_len": jnp.asarray(
            rng.integers(5, clen + 1, (B,)).astype(np.int32)),
    }
    if feed == "int8":
        from vqa_tpu.data.shards import quantize_features
        q8, scale = quantize_features(img)
        batch["img_q"] = jnp.asarray(q8)
        batch["img_scale"] = jnp.asarray(scale)
    else:
        batch["img"] = jnp.asarray(img)
    tx = optim_lib.make_optimizer(lr=2e-3, max_norm=0.25)
    params = model.init(jax.random.PRNGKey(0),
                        {k: v[:8] for k, v in batch.items()})["params"]
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.int32(0), rng=jax.random.key(0, impl="rbg"))
    step = make_train_step(model, tx, compute_dtype=jnp.bfloat16)
    print("lower+compile ...", flush=True)
    compiled = jax.jit(step).lower(state, batch).compile()
    (text,) = [m.to_string() for m in compiled.runtime_executable()
               .hlo_modules()] if hasattr(compiled, "runtime_executable") \
        else [compiled.as_text()]
    with open("/tmp/mtl_hlo.txt", "w") as f:
        f.write(text)
    print(f"wrote /tmp/mtl_hlo.txt ({len(text.splitlines())} lines)")

    if not names:
        return
    # computation bodies are named `%fused_computation.N` and referenced by
    # the fusion instruction `%fusion.N = ... fusion(...), calls=%fused_...`
    lines = text.splitlines()
    for want in names:
        print(f"\n=== {want} ===")
        pat = re.compile(rf"%{re.escape(want)} = ")
        idx = [i for i, ln in enumerate(lines) if pat.search(ln)]
        if not idx:
            print("  (not found)")
            continue
        for i in idx[:1]:
            ln = lines[i].strip()
            print("  " + ln[:400])
            m = re.search(r"calls=%?([\w.\-]+)", ln)
            if not m:
                continue
            comp = m.group(1)
            # print the called computation body
            start = next((j for j, l in enumerate(lines)
                          if re.match(rf"\s*%?{re.escape(comp)} ", l)), None)
            if start is None:
                continue
            j = start
            while j < len(lines):
                print("    " + lines[j].rstrip()[:300])
                if lines[j].rstrip().endswith("}"):
                    break
                j += 1


if __name__ == "__main__":
    main()
