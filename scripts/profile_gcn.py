"""Decompose the ReGAT GCN cost on the real chip (round-2 kernel work).

Measurement scheme: the harness relay adds a large, fluctuating fixed cost
(~28-38 ms) to every dispatched call, so sub-10 ms ops cannot be timed per
call. Each candidate op is therefore iterated REPS times inside ONE jit via
``lax.fori_loop`` with a data dependency (the output feeds the next
iteration), and the per-op time is (t(REPS) - t(1)) / (REPS - 1) — the
relay cost cancels. Results are fetched as a MAX reduction: sum() is unsafe
(XLA rewrites sum(dot(A, B)) into vector contractions), max() does not
distribute over dot.

Shapes: B=4096, N=36 objects, D=2048 (the PERF.md ReGAT row).
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _bench_util import chained_ms

from vqa_tpu.ops.gcn import GCN, label_bias_sum

B, N, D = 4096, 36, 2048
REPS = 8


def bench(step, carry, args, name=""):
    """step: (carry, *args) -> carry (same shape/dtype)."""
    ms = chained_ms(step, carry, args, reps=REPS, mode="cancel")
    print(f"{name:46s} {ms:8.2f} ms   ({B / (ms / 1e3):,.0f} img/s)",
          flush=True)
    return ms


def chain_from_alpha(out_self, proj, alpha_raw, graph, bias):
    """CorrelatedGraphConv graph-local chain (ops/gcn.py XLA path)."""
    adj = (graph != 0).astype(out_self.dtype)
    out = out_self + jnp.matmul(adj, proj,
                                preferred_element_type=out_self.dtype)
    out = out + label_bias_sum(graph, bias.astype(out.dtype), 12)
    a = jnp.matmul(adj, alpha_raw, preferred_element_type=alpha_raw.dtype)
    a = jax.nn.softmax(a, axis=1)
    return jnp.matmul(a, out, preferred_element_type=out.dtype)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    f_np = rng.standard_normal((B, N, D), dtype=np.float32) * 0.1
    g_np = rng.integers(0, 12, size=(B, N, N), dtype=np.int32)

    gcn = GCN(out_dim=D, num_labels=12, conv_layer=1, conv_type="corr")
    gcn_fused = GCN(out_dim=D, num_labels=12, conv_layer=1, conv_type="corr",
                    use_pallas=True)
    params = gcn.init(jax.random.PRNGKey(0), jnp.zeros((2, N, D)),
                      jnp.zeros((2, N, N), jnp.int32))

    from vqa_tpu.ops.pallas.gcn_chain import gcn_chain_fused

    for dtype in (jnp.bfloat16, jnp.float32):
        tag = dtype.__name__
        f = jax.device_put(f_np.astype(dtype))
        g = jax.device_put(g_np)
        p = jax.tree.map(lambda x: x.astype(dtype), params)

        # full layer, XLA vs fused-kernel module path
        bench(lambda c, g: gcn.apply(p, c, g, deterministic=True), f, (g,),
              name=f"full corr GCN, XLA [{tag}]")
        bench(lambda c, g: gcn_fused.apply(p, c, g, deterministic=True),
              f, (g,), name=f"full corr GCN, fused chain [{tag}]")

        # the 4 big projections alone (distinct weights; normalized carry
        # to keep values bounded across reps)
        ws = [jax.device_put((rng.standard_normal((D, D)) * 0.02)
                             .astype(dtype)) for _ in range(4)]
        f2 = f.reshape(B * N, D)

        def gemms4(c, w0, w1, w2, w3):
            o = (c @ w0 + c @ w1 + c @ w2 + c @ w3).astype(jnp.float32)
            return (o * jax.lax.rsqrt(jnp.mean(o * o) + 1e-6)).astype(c.dtype)
        bench(gemms4, f2, tuple(ws), name=f"4x [B*N,{D}]@[{D},{D}] GEMMs [{tag}]")

        # graph-local chain: XLA vs fused kernel, both consuming a
        # precomputed alpha_raw (the similarity_parts identity upstream
        # shrinks alpha's cost; an in-kernel qk variant measured ~3x
        # slower than XLA's batched einsum — see gcn_chain.py docstring)
        araw = jax.device_put(
            np.maximum(rng.standard_normal((B, N, N), dtype=np.float32), 0)
            .astype(dtype))
        bias = jax.device_put(
            (rng.standard_normal((12, D)) * 0.1).astype(np.float32)
            .astype(dtype))
        proj = jax.device_put((f_np * 0.5).astype(dtype))
        bench(lambda c, *a: chain_from_alpha(c, *a), f,
              (proj, araw, g, bias), name=f"chain, XLA [{tag}]")
        blocks = (4, 8) if dtype == jnp.bfloat16 else (4,)
        for bb in blocks:
            bench(lambda c, *a, _bb=bb: gcn_chain_fused(
                c, *a, num_labels=12, block_b=_bb),
                f, (proj, araw, g, bias),
                name=f"chain, fused bb={bb} [{tag}]")


if __name__ == "__main__":
    main()
