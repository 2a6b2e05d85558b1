"""Training-step throughput with relay dispatch amortized (chained steps).

The PERF.md r1 train rows (39 ms/step Up-Down B=512) timed one dispatch +
metric fetch per step, which includes the harness relay's fixed ~20-30 ms
cost — a real training loop runs steps back-to-back with no host sync, so
the honest number chains REPS steps in one jit via lax.scan (exactly what
``train.py`` does between logging points) and fetches once.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from vqa_tpu.models.wrapper import set_model
from vqa_tpu.training import optim as optim_lib
from vqa_tpu.training.state import TrainState, make_train_step

NOBJ, VDIM, QLEN, CLEN = 36, 2048, 10, 20
NTOKEN, ANS = 20000, 3129
WARMUP, ITERS, REPS = 1, 3, 8


def run(name, caption=False, compute_dtype=None, B=512, fused_cap=True,
        remat=True, clen=CLEN, fused_vjp=True, feed="dense", bits8=True,
        pallas_att=False, encoder="base"):
    # A/B knob for the decode scan's 8-bit dropout masks (default on in
    # the library — this reroutes the generator's late import)
    import functools
    import vqa_tpu.ops.decode_scan as ds
    if not hasattr(ds, "_orig_make_butd_caption_scan"):
        ds._orig_make_butd_caption_scan = ds.make_butd_caption_scan
    ds.make_butd_caption_scan = functools.partial(
        ds._orig_make_butd_caption_scan, bits8_dropout=bits8)
    model = set_model(encoder_type=encoder, predictor_type="base",
                      decoder_type="butd" if caption else "none",
                      ntoken=NTOKEN, v_dim=VDIM, embed_dim=300,
                      hidden_dim=1024, decoder_hidden_dim=1024, ans_dim=ANS,
                      c_len=CLEN, att_type="new", use_mtl=caption,
                      conv_type="corr", conv_layer=1)
    if caption and not remat:
        model = model.clone(generator=model.generator.clone(remat_scan=False))
    if caption and not fused_vjp:
        model = model.clone(generator=model.generator.clone(fused_vjp=False))
    if caption and pallas_att:
        model = model.clone(generator=model.generator.clone(pallas_att=True))
    if not fused_cap:
        from vqa_tpu.models.wrapper import VQAModel
        model = VQAModel(encoder=model.encoder, predictor=model.predictor,
                         generator=model.generator, use_mtl=caption,
                         fused_cap_loss=False)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((B, NOBJ, VDIM), dtype=np.float32)
    batch = {
        "q": jnp.asarray(rng.integers(0, NTOKEN, (B, QLEN)), dtype=jnp.int32),
        "a": jnp.asarray((rng.random((B, ANS)) < 0.01).astype(np.float32)),
    }
    if encoder == "relation":
        # spatial relation labels: 0 = no edge, 1..11 = edge classes
        # (data/relation.py label space; the bias gathers per label)
        batch["graph"] = jnp.asarray(
            rng.integers(0, 12, (B, NOBJ, NOBJ)), dtype=jnp.int32)
    if feed == "int8":
        # the production quantized feed: the encoder emits the factored
        # payload and the decoder scan pools over int8 (decode_scan.py
        # factored_v); grad-of-v collapses to a [B, objs] accumulate
        from vqa_tpu.data.shards import quantize_features
        q8, scale = quantize_features(img)
        batch["img_q"] = jnp.asarray(q8)
        batch["img_scale"] = jnp.asarray(scale)
    else:
        batch["img"] = jnp.asarray(img)
    if caption:
        # clen < CLEN emulates a length-bucketed batch (loader truncates
        # the caption axis to the bucket bound; see data/loader.py)
        batch["c"] = jnp.asarray(rng.integers(0, NTOKEN, (B, clen)),
                                 dtype=jnp.int32)
        batch["cap_len"] = jnp.asarray(
            rng.integers(5, clen + 1, (B,)).astype(np.int32))

    tx = optim_lib.make_optimizer(lr=2e-3, max_norm=0.25, warm_up=1,
                                  step_size=2, gamma=0.5,
                                  steps_per_epoch=1000)
    params = model.init(jax.random.PRNGKey(0),
                        {k: v[:8] for k, v in batch.items()})["params"]
    state = TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.int32(0), rng=jax.random.key(0, impl="rbg"))
    inner = make_train_step(model, tx, compute_dtype=compute_dtype)

    @jax.jit
    def steps(state, batch):
        def body(s, _):
            s, metrics = inner(s, batch)
            return s, metrics["loss"]
        return jax.lax.scan(body, state, None, length=REPS)

    for _ in range(WARMUP):
        state2, losses = steps(state, batch)
        np.asarray(losses)
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        _, losses = steps(state, batch)
        np.asarray(losses)
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / REPS
    print(f"{name:44s} {ms:8.1f} ms/step   ({B / (ms / 1e3):,.0f} q/s)",
          flush=True)


def main():
    import sys
    print("devices:", jax.devices(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "vqa"):
        run("Up-Down VQA, B=512, bf16 mixed (train default)",
            compute_dtype=jnp.bfloat16)
        run("Up-Down VQA, B=4096, bf16 mixed", compute_dtype=jnp.bfloat16,
            B=4096)
    if which == "vqa-int8":
        # int8 feed on the single-task train step: the forward dequant
        # fuses into the v-projection operand read and lazy-v pools over
        # the int8 payload (encoder.py lazy_v is active in training);
        # features are data, so no grad-of-v exists on this path at all
        run("Up-Down VQA, B=4096, bf16 mixed (dense window)",
            compute_dtype=jnp.bfloat16, B=4096)
        run("Up-Down VQA, B=4096, bf16 mixed, int8 feed",
            compute_dtype=jnp.bfloat16, B=4096, feed="int8")
        run("Up-Down VQA, B=8192, bf16 mixed, int8 feed",
            compute_dtype=jnp.bfloat16, B=8192, feed="int8")
    if which == "vqa-int8-xl":
        run("Up-Down VQA, B=8192, bf16 mixed (dense)",
            compute_dtype=jnp.bfloat16, B=8192)
        run("Up-Down VQA, B=16384, bf16 mixed, int8 feed",
            compute_dtype=jnp.bfloat16, B=16384, feed="int8")
    if which in ("all", "mtl"):
        run("MTL VQA+BUTD, B=512, bf16, stacked (r2 layout)",
            caption=True, compute_dtype=jnp.bfloat16, fused_cap=False)
        run("MTL VQA+BUTD, B=512, bf16, fused cap loss",
            caption=True, compute_dtype=jnp.bfloat16)
        run("MTL VQA+BUTD, B=2048, bf16, fused cap loss",
            caption=True, compute_dtype=jnp.bfloat16, B=2048)
        run("MTL VQA+BUTD, B=4096, bf16, fused cap loss",
            caption=True, compute_dtype=jnp.bfloat16, B=4096)
        run("MTL VQA+BUTD, B=4096, bf16, fused, c=12 bucket",
            caption=True, compute_dtype=jnp.bfloat16, B=4096, clen=12)
        # remat=False stacks the [T, B, objs, H] attention joint (5.3 GB at
        # B=4096 — OOM on 16 GB); only viable at small batch, kept for the
        # record: run(..., B=1024, remat=False)
    if which in ("all", "mtl-scale"):
        # batch scaling + finer buckets on top of the c=12 bucket result
        # (B=8192 OOMs — the step's activations + grads + opt state exceed
        # 16 GB HBM at that batch)
        run("MTL VQA+BUTD, B=6144, bf16, fused, c=12 bucket",
            caption=True, compute_dtype=jnp.bfloat16, B=6144, clen=12)
        run("MTL VQA+BUTD, B=4096, bf16, fused, c=9 bucket",
            caption=True, compute_dtype=jnp.bfloat16, B=4096, clen=9)
    if which in ("all", "vjp"):
        # custom-VJP decode scan (ops/decode_scan.py) vs nn.scan + remat
        run("MTL B=4096 c=20, nn.scan+remat (stock)",
            caption=True, compute_dtype=jnp.bfloat16, B=4096,
            fused_vjp=False)
        run("MTL B=4096 c=20, custom-VJP scan",
            caption=True, compute_dtype=jnp.bfloat16, B=4096)
        run("MTL B=4096 c=12 bucket, custom-VJP scan",
            caption=True, compute_dtype=jnp.bfloat16, B=4096, clen=12)
        run("MTL B=4096 c=9 bucket, custom-VJP scan",
            caption=True, compute_dtype=jnp.bfloat16, B=4096, clen=9)
    if which in ("all", "int8"):
        # int8 feed: factored decode scan + lazy predictor pooling — the
        # [B, objs, v_dim] dequantized features never enter the scan and
        # grad-of-v is a [B, objs] accumulate (decode_scan.py factored_v)
        run("MTL B=4096 c=20, int8 feed (factored scan)",
            caption=True, compute_dtype=jnp.bfloat16, B=4096, feed="int8")
        run("MTL B=4096 c=12 bucket, int8 feed",
            caption=True, compute_dtype=jnp.bfloat16, B=4096, clen=12,
            feed="int8")
        run("MTL B=4096 c=9 bucket, int8 feed",
            caption=True, compute_dtype=jnp.bfloat16, B=4096, clen=9,
            feed="int8")
        # B=8192 OOMs since the deferred-d_vp backward (decode_scan.py):
        # the emitted [T, B, objs, H] keep-mask residual is ~3.3 GB at that
        # shape. No loss: B=8192 measured *slower* than B=4096 before the
        # change (388.8 ms = 21.1k q/s vs 191.4 = 21.4k — batch scaling was
        # already exhausted, PERF.md "MTL train step").
    if which == "ab":
        # one-window A/B: dense+bernoulli (pre-uint8 layout) vs dense+u8
        # masks vs int8 factored scan, all at the dominant c=12 bucket
        run("MTL B=4096 c=12, dense, bernoulli masks",
            caption=True, compute_dtype=jnp.bfloat16, B=4096, clen=12,
            bits8=False)
        run("MTL B=4096 c=12, dense, uint8 masks",
            caption=True, compute_dtype=jnp.bfloat16, B=4096, clen=12)
        run("MTL B=4096 c=12, int8 feed (factored scan)",
            caption=True, compute_dtype=jnp.bfloat16, B=4096, clen=12,
            feed="int8")
        run("MTL B=4096 c=9, int8 feed",
            caption=True, compute_dtype=jnp.bfloat16, B=4096, clen=9,
            feed="int8")
        run("MTL B=4096 c=20, int8 feed",
            caption=True, compute_dtype=jnp.bfloat16, B=4096, feed="int8")
        run("MTL B=8192 c=12, int8 feed",
            caption=True, compute_dtype=jnp.bfloat16, B=8192, clen=12,
            feed="int8")
    if which == "regat":
        # ReGAT (RelationEncoder, spatial corr-conv, conv_layer=1) VQA
        # training — the one train path PERF.md had no row for; inference
        # rows live in scripts/bench_regat.py
        run("ReGAT corr-conv train, B=512, bf16 mixed",
            encoder="relation", compute_dtype=jnp.bfloat16)
        run("ReGAT corr-conv train, B=2048, bf16 mixed",
            encoder="relation", compute_dtype=jnp.bfloat16, B=2048)
        run("ReGAT corr-conv train, B=4096, bf16 mixed",
            encoder="relation", compute_dtype=jnp.bfloat16, B=4096)
    if which == "pa":
        # fused decode-attention kernels (ops/pallas/decode_att.py):
        # in-kernel PRNG, no mask HBM traffic, no mask residual
        run("MTL B=4096 c=12, int8 feed, pallas att",
            caption=True, compute_dtype=jnp.bfloat16, B=4096, clen=12,
            feed="int8", pallas_att=True)
        run("MTL B=4096 c=9, int8 feed, pallas att",
            caption=True, compute_dtype=jnp.bfloat16, B=4096, clen=9,
            feed="int8", pallas_att=True)
        run("MTL B=4096 c=20, int8 feed, pallas att",
            caption=True, compute_dtype=jnp.bfloat16, B=4096,
            feed="int8", pallas_att=True)
        run("MTL B=4096 c=12, int8 feed (XLA reference window)",
            caption=True, compute_dtype=jnp.bfloat16, B=4096, clen=12,
            feed="int8")
        # the mask residual is gone on this path: B=8192 fits again
        run("MTL B=8192 c=12, int8 feed, pallas att",
            caption=True, compute_dtype=jnp.bfloat16, B=8192, clen=12,
            feed="int8", pallas_att=True)
        run("MTL B=4096 c=12, dense, pallas att",
            caption=True, compute_dtype=jnp.bfloat16, B=4096, clen=12,
            pallas_att=True)


if __name__ == "__main__":
    main()
