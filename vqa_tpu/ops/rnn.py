"""Recurrent layers as `jax.lax.scan` over fixed-length sequences.

TPU-native equivalent of the reference `SentenceEmbedding`
(/root/reference/modules/modules.py:98-163, a cuDNN GRU/LSTM) and of the
per-step ``nn.GRUCell``/``nn.LSTMCell`` used by the caption decoders
(/root/reference/modules/generator.py:164-165,234-236).

Design notes (TPU-first):

- The input-side projection ``x @ W_i`` for *all* timesteps is computed as one
  big [batch*T, in] x [in, 3H] matmul up front (MXU-friendly), so the scan body
  only carries the recurrent [batch, H] x [H, 3H] matmul.
- Sequences are fixed length (q_len=10 / c_len=20); there is no length sorting
  or shrinking batch. The reference's question encoder takes the output of the
  *last padded* step, not the last valid token (modules.py:156-159) — we
  replicate that exactly because accuracy parity depends on it
  (SURVEY.md section 7.3).
- Gate math matches torch exactly (r,z,n gate order for GRU; i,f,g,o for LSTM)
  so parity tests can copy torch weights verbatim.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def torch_rnn_uniform(hidden_dim: int):
    """torch RNN default init: U(-1/sqrt(hidden), 1/sqrt(hidden)) for all params."""
    bound = 1.0 / (hidden_dim ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def gru_step(h: jax.Array, xi: jax.Array, hi: jax.Array) -> jax.Array:
    """Combine precomputed input projection xi and hidden projection hi.

    xi, hi: [batch, 3H] in gate order (r, z, n); h: [batch, H].
    """
    hdim = h.shape[-1]
    xr, xz, xn = xi[..., :hdim], xi[..., hdim:2 * hdim], xi[..., 2 * hdim:]
    hr, hz, hn = hi[..., :hdim], hi[..., hdim:2 * hdim], hi[..., 2 * hdim:]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def lstm_step(c: jax.Array, h: jax.Array, xi: jax.Array, hi: jax.Array
              ) -> Tuple[jax.Array, jax.Array]:
    """torch LSTM cell update from precomputed projections (gate order i,f,g,o)."""
    hdim = h.shape[-1]
    gates = xi + hi
    i = jax.nn.sigmoid(gates[..., :hdim])
    f = jax.nn.sigmoid(gates[..., hdim:2 * hdim])
    g = jnp.tanh(gates[..., 2 * hdim:3 * hdim])
    o = jax.nn.sigmoid(gates[..., 3 * hdim:])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return c_new, h_new


class RNNCellBase(nn.Module):
    """Shared param layout for GRU/LSTM cells (torch weight layout transposed)."""

    hidden_dim: int
    rnn_type: str = "GRU"  # GRU | LSTM

    @property
    def num_gates(self) -> int:
        return 3 if self.rnn_type == "GRU" else 4

    @nn.compact
    def __call__(self, carry, x: jax.Array, *, full_in: int | None = None,
                 rows=None, extra_xi: jax.Array | None = None,
                 gates_only: bool = False):
        """One step. carry: h [batch, H] for GRU, (h, c) for LSTM.

        Partial-input mode (all optional, default = plain step): lets a
        caller hoist the input-gate GEMM of *time-invariant* input features
        out of a decode scan (e.g. BUTD's ``v_mean`` slice of the word-RNN
        input — 2048 of 3372 rows recomputed 19x3 times per train step
        otherwise, PERF.md "MTL train step"). Parameter layout is unchanged
        (one ``wi [full_in, nG*H]``), so checkpoints are unaffected.

        - ``full_in``: total input width ``wi`` covers when ``x`` is only a
          slice of the concatenated input.
        - ``rows``: (start, end) span — or list of spans — of ``wi`` rows
          that ``x`` provides, in order. Span concatenation of params is
          loop-invariant, so XLA hoists it out of scans.
        - ``extra_xi``: precomputed ``x_invariant @ wi[span]`` contribution
          added to the input-gate preactivation.
        - ``gates_only``: return ``x @ wi[rows]`` (no bias, no step) — the
          hoisting call.
        """
        init = torch_rnn_uniform(self.hidden_dim)
        ngates = self.num_gates
        in_dim = x.shape[-1] if full_in is None else full_in
        wi = self.param("wi", init, (in_dim, ngates * self.hidden_dim))
        bi = self.param("bi", init, (ngates * self.hidden_dim,))
        wh = self.param("wh", init, (self.hidden_dim, ngates * self.hidden_dim))
        bh = self.param("bh", init, (ngates * self.hidden_dim,))
        if rows is None:
            wi_x = wi
        else:
            spans = [rows] if isinstance(rows, tuple) else list(rows)
            parts = [wi[s:e] for s, e in spans]
            wi_x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        xi = jnp.matmul(x, wi_x.astype(x.dtype), preferred_element_type=x.dtype)
        if gates_only:
            return xi
        if extra_xi is not None:
            xi = xi + extra_xi
        xi = xi + bi.astype(x.dtype)
        if self.rnn_type == "GRU":
            h = carry
            hi = jnp.matmul(h, wh.astype(h.dtype), preferred_element_type=h.dtype) + bh.astype(h.dtype)
            h_new = gru_step(h, xi, hi)
            return h_new
        h, c = carry
        hi = jnp.matmul(h, wh.astype(h.dtype), preferred_element_type=h.dtype) + bh.astype(h.dtype)
        c_new, h_new = lstm_step(c, h, xi, hi)
        return (h_new, c_new)


def rnn_scan(params: dict, x: jax.Array, rnn_type: str = "GRU",
             h0: jax.Array | None = None, c0: jax.Array | None = None,
             reverse: bool = False) -> jax.Array:
    """Run a single-direction RNN layer over [batch, T, in] -> [batch, T, H].

    ``params`` holds wi [in, nG*H], bi, wh [H, nG*H], bh (the RNNCellBase
    layout). The x-side projection for all T steps is one batched matmul; the
    scan body only does the [batch, H] @ [H, nG*H] recurrent matmul — on TPU
    this keeps the MXU fed and the scan body tiny.
    """
    wi, bi, wh, bh = params["wi"], params["bi"], params["wh"], params["bh"]
    batch, t_len, _ = x.shape
    hdim = wh.shape[0]
    xi_all = jnp.matmul(x, wi.astype(x.dtype), preferred_element_type=x.dtype) + bi.astype(x.dtype)
    xi_all = jnp.swapaxes(xi_all, 0, 1)  # [T, batch, nG*H] scan-major

    if h0 is None:
        h0 = jnp.zeros((batch, hdim), x.dtype)

    if rnn_type == "GRU":
        def body(h, xi):
            hi = jnp.matmul(h, wh.astype(h.dtype), preferred_element_type=h.dtype) + bh.astype(h.dtype)
            h_new = gru_step(h, xi, hi)
            return h_new, h_new

        _, ys = jax.lax.scan(body, h0, xi_all, reverse=reverse)
    else:
        if c0 is None:
            c0 = jnp.zeros((batch, hdim), x.dtype)

        def body(carry, xi):
            h, c = carry
            hi = jnp.matmul(h, wh.astype(h.dtype), preferred_element_type=h.dtype) + bh.astype(h.dtype)
            c_new, h_new = lstm_step(c, h, xi, hi)
            return (h_new, c_new), h_new

        _, ys = jax.lax.scan(body, (h0, c0), xi_all, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)  # [batch, T, H]


class SentenceEmbedding(nn.Module):
    """Batch-first multi-layer (bi)RNN (reference modules.py:98-163).

    ``forward_all`` -> all step outputs [batch, T, H*ndir];
    ``__call__`` -> last-step output (last *padded* step, exactly like the
    reference's ``output[:, -1]`` at modules.py:156-159); for bidirectional,
    concat(forward last step, backward step-0 output) per modules.py:161-163.
    """

    hidden_dim: int
    rnn_layer: int = 1
    dropout: float = 0.0
    rnn_type: str = "GRU"
    bidirect: bool = False
    # opt-in fused Pallas sequence kernel for the last-state GRU path
    # (vqa_tpu/ops/pallas/gru.py); falls back to the XLA scan whenever the
    # configuration or batch shape doesn't fit the kernel
    use_pallas: bool = False
    pallas_tile: int = 256

    def _layer_params(self, layer: int, direction: int, in_dim: int):
        ngates = 3 if self.rnn_type == "GRU" else 4
        init = torch_rnn_uniform(self.hidden_dim)
        suffix = f"l{layer}" + ("_reverse" if direction else "")
        return {
            "wi": self.param(f"wi_{suffix}", init, (in_dim, ngates * self.hidden_dim)),
            "bi": self.param(f"bi_{suffix}", init, (ngates * self.hidden_dim,)),
            "wh": self.param(f"wh_{suffix}", init, (self.hidden_dim, ngates * self.hidden_dim)),
            "bh": self.param(f"bh_{suffix}", init, (ngates * self.hidden_dim,)),
        }

    @nn.compact
    def forward_all(self, x: jax.Array, *, deterministic: bool = True,
                    last_only: bool = False) -> jax.Array:
        assert self.rnn_type in ("LSTM", "GRU")
        # deterministic-only: the kernel defines no VJP, so training (incl.
        # bf16 mixed precision, which feeds bf16 activations here) always
        # differentiates through the XLA scan path below.
        if last_only and deterministic and self._pallas_eligible(x):
            # fused last-state path: hoisted input GEMM + streaming kernel
            # (v2: per-step double-buffered DMA, full-width batch tiles)
            from vqa_tpu.ops.pallas.gru_v2 import gru_last_state_v2
            params = self._layer_params(0, 0, x.shape[-1])
            xi_all = jnp.matmul(x, params["wi"].astype(x.dtype),
                                preferred_element_type=x.dtype) \
                + params["bi"].astype(x.dtype)
            interpret = jax.default_backend() != "tpu"
            tile = next(t for t in (256, 128, 64, 32, 16, 8)
                        if x.shape[0] % t == 0)
            out = gru_last_state_v2(xi_all, params["wh"].astype(x.dtype),
                                    params["bh"].astype(x.dtype),
                                    tile_b=tile, interpret=interpret)
            return out.astype(x.dtype)
        ndir = 2 if self.bidirect else 1
        out = x
        for layer in range(self.rnn_layer):
            in_dim = out.shape[-1]
            outs = []
            for direction in range(ndir):
                params = self._layer_params(layer, direction, in_dim)
                outs.append(rnn_scan(params, out, self.rnn_type, reverse=bool(direction)))
            out = jnp.concatenate(outs, axis=-1) if ndir == 2 else outs[0]
            # torch applies inter-layer dropout on all but the last layer.
            if layer < self.rnn_layer - 1 and self.dropout > 0:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        if last_only:
            if not self.bidirect:
                return out[:, -1]
            forward = out[:, -1, : self.hidden_dim]
            backward = out[:, 0, self.hidden_dim:]
            return jnp.concatenate([forward, backward], axis=1)
        return out

    def _pallas_eligible(self, x: jax.Array) -> bool:
        # bf16 only: the f32 recurrent weight (12.6 MB at H=1024) cannot be
        # VMEM-resident within the 16 MB budget; f32 runs use the XLA scan
        return (self.use_pallas and self.rnn_type == "GRU"
                and self.rnn_layer == 1 and not self.bidirect
                and x.dtype == jnp.bfloat16
                and x.shape[0] % 8 == 0)

    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        return self.forward_all(x, deterministic=deterministic, last_only=True)


class GRUCell(RNNCellBase):
    rnn_type: str = "GRU"


class LSTMCell(RNNCellBase):
    rnn_type: str = "LSTM"
