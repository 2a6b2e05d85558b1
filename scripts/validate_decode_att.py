"""Real-TPU validation of the fused decode-attention kernels.

The CPU-interpret tests (tests/test_pallas.py) pin the non-RNG math of
ops/pallas/decode_att.py against pure-JAX references via explicit masks;
the hardware-PRNG path has no interpret lowering, so the mask-stream
contract — forward, backward, and the deferred grad-of-vp regenerate
IDENTICAL masks from (seed, tile) — is pinned here on the real chip:

1. K1 (emit_mask) twice with the same seed -> identical masks;
2. K1 outputs == fwd_reference evaluated with K1's emitted mask;
3. K2 outputs == bwd_reference with the same emitted mask (proves the
   backward's regenerated stream matches the forward's);
4. K3 == dvp_reference with the per-step masks emitted by K1 under each
   step's seed (proves the (t, tile) replay matches);
5. keep-rate ~ thresh/256;
6. model level: MTL train step with pallas_att at p_att=0 (mask-free
   kernels) == the stock fused-VJP path, and loss/grads finite under
   active dropout.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/validate_decode_att.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from vqa_tpu.ops.pallas import decode_att as da

B, objs, H, D, T = 128, 36, 1024, 2048, 3
THRESH = 205
SCALE = 256.0 / THRESH


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    vp = rng.standard_normal((B, objs, H)).astype(np.float32) * 0.1
    pool = rng.standard_normal((B, objs, D)).astype(np.float32)
    w = rng.standard_normal((B, objs)).astype(np.float32) * 0.1
    qp = np.abs(rng.standard_normal((B, H))).astype(np.float32) * 0.1
    k = rng.standard_normal((1, H)).astype(np.float32) * 0.05
    gav = rng.standard_normal((B, D)).astype(np.float32) * 0.1
    vp2 = jnp.asarray(vp.reshape(B, objs * H))
    pool2 = jnp.asarray(pool.reshape(B, objs * D))
    seed = jnp.asarray([12345], jnp.int32)
    tile = da.pick_tile(B, objs, H, D, 4, 4)
    print("tile_b:", tile)

    fwd = jax.jit(lambda s: da.decode_att_fwd(
        vp2, pool2, jnp.asarray(w), jnp.asarray(qp), jnp.asarray(k), s,
        objs=objs, att_scale=SCALE, thresh=THRESH, emit_mask=True,
        tile_b=tile))
    att1, av1, mask1 = map(np.asarray, fwd(seed))
    att2, av2, mask2 = map(np.asarray, fwd(seed))
    assert (mask1 == mask2).all(), "PRNG not repeatable"
    print("1. mask repeatable: OK")

    rate = mask1.mean()
    assert abs(rate - THRESH / 256.0) < 3e-3, rate
    print(f"5. keep rate {rate:.4f} ~ {THRESH/256:.4f}: OK")

    m3 = jnp.asarray(mask1.reshape(B, objs, H))
    att_r, av_r = da.fwd_reference(
        jnp.asarray(vp), jnp.asarray(pool), jnp.asarray(w),
        jnp.asarray(qp), jnp.asarray(k), m3, att_scale=SCALE)
    e_att = np.abs(att1 - np.asarray(att_r)).max()
    e_av = np.abs(av1 - np.asarray(av_r)).max()
    print(f"2. fwd vs reference-with-emitted-mask: att {e_att:.2e} "
          f"att_v {e_av:.2e}")
    assert e_att < 1e-5 and e_av < 1e-3

    bwd = jax.jit(lambda s: da.decode_att_bwd(
        vp2, pool2, jnp.asarray(w), jnp.asarray(att1), jnp.asarray(gav), s,
        objs=objs, thresh=THRESH, tile_b=tile))
    dq_k, m_k, dl_k = map(np.asarray, bwd(seed))
    dq_r, m_r, dl_r = map(np.asarray, da.bwd_reference(
        jnp.asarray(vp), jnp.asarray(pool), jnp.asarray(w),
        jnp.asarray(att1), jnp.asarray(gav), m3))
    errs = [np.abs(a - b).max() for a, b in
            ((dq_k, dq_r), (m_k, m_r), (dl_k, dl_r))]
    print(f"3. bwd stream replay vs reference: dqp {errs[0]:.2e} "
          f"m {errs[1]:.2e} dl {errs[2]:.2e}")
    assert max(errs) < 1e-3

    seeds = jnp.asarray([12345, 777, -31337], jnp.int32)
    masks = np.stack([np.asarray(fwd(seeds[t][None])[2])
                      for t in range(T)])              # [T, B, objs*H]
    dls = rng.standard_normal((T, B, objs)).astype(np.float32) * 0.1
    qps = rng.standard_normal((T, B, H)).astype(np.float32) * 0.1
    dv_k = np.asarray(jax.jit(lambda: da.decode_att_dvp(
        jnp.asarray(dls), jnp.asarray(qps), jnp.asarray(k), seeds,
        objs=objs, att_scale=SCALE, thresh=THRESH,
        out_dtype=jnp.float32, tile_b=tile))())
    dv_r = np.asarray(da.dvp_reference(
        jnp.asarray(dls), jnp.asarray(qps), jnp.asarray(k),
        jnp.asarray(masks.reshape(T, B, objs, H)), att_scale=SCALE,
        out_dtype=jnp.float32)).reshape(B, objs * H)
    e_dv = np.abs(dv_k - dv_r).max()
    print(f"4. dvp (t, tile) replay vs reference: {e_dv:.2e}")
    assert e_dv < 1e-3

    # 6. model level -------------------------------------------------
    from vqa_tpu.models.wrapper import set_model
    from vqa_tpu.training import optim as optim_lib
    from vqa_tpu.training.state import TrainState, make_train_step
    from vqa_tpu.data.shards import quantize_features

    def step_loss(use_pa, drop, Bm=128):
        model = set_model(encoder_type="base", predictor_type="base",
                          decoder_type="butd", ntoken=500, v_dim=D,
                          embed_dim=300, hidden_dim=H,
                          decoder_hidden_dim=H, ans_dim=10, c_len=8,
                          dropout=drop, att_dropout=drop if drop else 0.0,
                          att_type="new", use_mtl=True, use_pallas=use_pa)
        r2 = np.random.default_rng(1)
        img = r2.standard_normal((Bm, objs, D), dtype=np.float32)
        q8, scale = quantize_features(img)
        batch = {"img_q": jnp.asarray(q8), "img_scale": jnp.asarray(scale),
                 "q": jnp.asarray(r2.integers(0, 500, (Bm, 10)), jnp.int32),
                 "a": jnp.asarray((r2.random((Bm, 10)) < 0.1)
                                  .astype(np.float32)),
                 "c": jnp.asarray(r2.integers(0, 500, (Bm, 8)), jnp.int32),
                 "cap_len": jnp.asarray(
                     r2.integers(4, 9, (Bm,)).astype(np.int32))}
        tx = optim_lib.make_optimizer(lr=2e-3, max_norm=0.25)
        params = model.init(jax.random.PRNGKey(0),
                            {kk: vv[:8] for kk, vv in batch.items()}
                            )["params"]
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.int32(0),
                           rng=jax.random.key(0, impl="rbg"))
        step = make_train_step(model, tx, compute_dtype=jnp.bfloat16)
        _, metrics = jax.jit(step)(state, batch)
        return float(metrics["loss"])

    l_pa = step_loss(True, 0.0)
    l_xla = step_loss(False, 0.0)
    print(f"6a. deterministic MTL loss: pallas {l_pa:.6f} "
          f"xla {l_xla:.6f} (diff {abs(l_pa-l_xla):.2e})")
    assert abs(l_pa - l_xla) < 5e-3
    l_dp = step_loss(True, 0.3)
    print(f"6b. dropout MTL loss (pallas): {l_dp:.6f} finite:",
          np.isfinite(l_dp))
    assert np.isfinite(l_dp)
    print("ALL OK")


if __name__ == "__main__":
    main()
