"""Decompose the ReGAT GCN cost on the real chip (round-2 kernel planning).

Times, at B=4096 / N=36 / D=2048 (the PERF.md ReGAT row shapes):
  - full 1-layer corr GCN forward, f32 and bf16
  - the four big [B*N, D] @ [D, D] GEMMs alone (W_self, W_fold, Wq, Wk)
  - the residual graph-local chain (adjacency agg + label bias + alpha
    softmax + alpha@out) alone, with GEMM outputs precomputed

Per-iteration host fetches (np.asarray) per the harness relay rules
(bench.py "Measurement notes").
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu.ops.gcn import GCN, label_bias_sum

B, N, D = 4096, 36, 2048
WARMUP, ITERS = 2, 5


def bench(fn, *args, name=""):
    # fetch a SCALAR each iteration: execution is provably complete but the
    # ~130 MB/s relay link doesn't dominate the timing (PERF.md quirks)
    red = jax.jit(lambda *a: jnp.float32(sum(
        jnp.sum(x.astype(jnp.float32)) for x in
        jax.tree_util.tree_leaves(fn(*a)))))
    for _ in range(WARMUP):
        np.asarray(red(*args))
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        np.asarray(red(*args))
        times.append(time.perf_counter() - t0)
    ms = 1e3 * min(times)
    print(f"{name:42s} {ms:8.1f} ms   ({B / (ms / 1e3):,.0f} img/s)", flush=True)
    return ms


def chain(out_self, proj, pq, pk, graph, bias):
    """Everything in CorrelatedGraphConv after the 4 big GEMMs."""
    adj = (graph != 0).astype(out_self.dtype)
    out = out_self + jnp.matmul(adj, proj, preferred_element_type=out_self.dtype)
    out = out + label_bias_sum(graph, bias.astype(out.dtype), 12)
    alpha = jnp.einsum("bid,bjd->bij", pq, pk,
                       preferred_element_type=pq.dtype)
    alpha = jnp.maximum(alpha, 0.0)
    alpha = jnp.matmul(adj, alpha, preferred_element_type=alpha.dtype)
    alpha = jax.nn.softmax(alpha, axis=1)
    out = jnp.matmul(alpha, out, preferred_element_type=out.dtype)
    # dropout(eval)=identity; relu epilogue
    return jax.nn.relu(out)


def gemms(f, w_self, w_fold, wq, wk):
    return (f @ w_self, f @ w_fold, f @ wq, f @ wk)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    f_np = rng.standard_normal((B, N, D), dtype=np.float32) * 0.1
    g_np = rng.integers(0, 12, size=(B, N, N), dtype=np.int32)

    gcn = GCN(out_dim=D, num_labels=12, conv_layer=1, conv_type="corr")
    params = gcn.init(jax.random.PRNGKey(0), jnp.zeros((2, N, D)),
                      jnp.zeros((2, N, N), jnp.int32))

    for dtype in (jnp.float32, jnp.bfloat16):
        tag = dtype.__name__
        f = jax.device_put(f_np.astype(dtype))
        g = jax.device_put(g_np)
        p = jax.tree.map(lambda x: x.astype(dtype), params)

        full = jax.jit(lambda p, f, g: gcn.apply(p, f, g, deterministic=True))
        bench(full, p, f, g, name=f"full corr GCN [{tag}]")

        # Direct GEMM timing with synthetic same-shape weights (init details
        # don't matter for speed):
        wmat = jax.device_put(
            rng.standard_normal((D, D), dtype=np.float32).astype(dtype) * 0.01)
        f2 = f.reshape(B * N, D)
        g4 = jax.jit(lambda f2, w: gemms(f2, w, w, w, w))
        bench(g4, f2, wmat, name=f"4x [B*N,{D}]@[{D},{D}] GEMMs [{tag}]")

        # graph-local chain with precomputed GEMM outputs
        pre = jax.device_put(np.asarray(f, np.float32).astype(dtype))
        bias = jax.device_put(
            rng.standard_normal((12, D), dtype=np.float32).astype(dtype))
        ch = jax.jit(chain)
        bench(ch, pre, pre, pre, pre, g, bias, name=f"graph-local chain [{tag}]")

        # fused Pallas chain kernel vs the same chain-from-alpha in XLA
        from vqa_tpu.ops.pallas.gcn_chain import gcn_chain_fused
        from vqa_tpu.ops.gcn import label_bias_sum
        araw = jax.device_put(
            np.maximum(rng.standard_normal((B, N, N), dtype=np.float32), 0)
            .astype(dtype))

        def chain_from_alpha(out_self, proj, alpha_raw, graph, bias):
            adj = (graph != 0).astype(out_self.dtype)
            out = out_self + jnp.matmul(adj, proj,
                                        preferred_element_type=out_self.dtype)
            out = out + label_bias_sum(graph, bias.astype(out.dtype), 12)
            a = jnp.matmul(adj, alpha_raw, preferred_element_type=alpha_raw.dtype)
            a = jax.nn.softmax(a, axis=1)
            return jnp.matmul(a, out, preferred_element_type=out.dtype)

        bench(jax.jit(chain_from_alpha), pre, pre, araw, g, bias,
              name=f"chain-from-alpha, XLA [{tag}]")
        for bb in (4, 8):
            bench(functools.partial(gcn_chain_fused, num_labels=12,
                                    block_b=bb),
                  pre, pre, araw, g, bias,
                  name=f"chain-from-alpha, fused bb={bb} [{tag}]")


if __name__ == "__main__":
    main()
