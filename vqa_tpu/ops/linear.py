"""Weight-normed fully-connected building blocks.

TPU-native equivalents of the reference layers in
`/root/reference/modules/modules.py`:

- ``WNDense`` — a Linear layer under weight normalization with a *scalar*
  gain, matching torch ``weight_norm(nn.Linear(...), dim=None)``
  (modules.py:38,43,49,54): ``W = g * V / ||V||_F`` with ``g`` initialized to
  ``||V||_F`` so the initial forward equals a plain Linear.
- ``FCNet`` — N-layer ReLU MLP of weight-normed Linears with dropout between
  hidden layers and a ReLU after the *last* layer (modules.py:13-60; note the
  trailing ``layers.append(nn.ReLU())`` at modules.py:55 — the reference's
  classifier therefore emits non-negative "logits"; we replicate that
  faithfully, see models/predictor.py).
- ``LReLUNet`` — bias-free Linear + LeakyReLU (modules.py:62-77).
- ``DotProduct`` — bilinear similarity ``(a Wa) (b Wb)^T`` (modules.py:80-95),
  used by the correlated graph conv.

All matmuls run on the MXU; keep inputs 2-D/3-D with the feature axis last so
XLA tiles them onto the 128x128 systolic array.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def torch_linear_uniform(fan_in: int):
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    (kaiming_uniform with a=sqrt(5) reduces to this bound for weights; torch
    uses the same bound for biases.) Matching the reference init matters for
    accuracy parity (SURVEY.md section 7.3).
    """
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class WNDense(nn.Module):
    """Linear layer with scalar weight normalization (torch dim=None).

    Parameters: direction ``v`` [in, out], scalar gain ``g`` (init ||v||_F),
    optional bias ``b`` [out]. Forward: ``x @ (g / ||v||_F) v + b``.

    Row-sliced calls: passing ``in_dim`` (the full input width the kernel is
    declared over) with a narrower ``x`` multiplies only kernel rows
    ``[row_start, row_start + x.shape[-1])`` — because a Linear over a
    concatenation splits exactly as ``[v;q] @ W == v @ W_v + q @ W_q``, this
    lets callers hoist the loop-invariant part of a fused projection out of
    a decode loop (see ops/attention.py). The weight-norm scale always uses
    the full ``||v||_F``.
    """

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, in_dim: Optional[int] = None,
                 row_start: int = 0, add_bias: bool = True,
                 x_scale: Optional[jax.Array] = None,
                 int8_pallas: bool = False,
                 fuse_relu: bool = False) -> jax.Array:
        full_dim = in_dim if in_dim is not None else x.shape[-1]
        v = self.param("v", torch_linear_uniform(full_dim),
                       (full_dim, self.features))
        # g initialized to the Frobenius norm of v => initial W == v.
        g = self.param("g", lambda _key: jnp.sqrt(jnp.sum(v * v)))
        scale = g * jax.lax.rsqrt(jnp.sum(v * v))
        rows = v if x.shape[-1] == full_dim else \
            v[row_start:row_start + x.shape[-1]]
        b = self.param("b", torch_linear_uniform(full_dim),
                       (self.features,)) if self.use_bias else None
        if x.dtype == jnp.int8:
            # int8 MXU fast path: x is a pre-quantized activation with
            # per-row scales (the int8 feature feed); the effective
            # weight-normed kernel is quantized per output channel and both
            # scales fold into the GEMM epilogue (ops/quant.py). Output
            # dtype follows the scale's dtype (the same convention as the
            # feed dequant in models/encoder.py — int8 carries no float
            # dtype of its own), unless self.dtype overrides.
            assert x_scale is not None, "int8 input requires x_scale"
            from vqa_tpu.ops.quant import int8_dot
            # the final dtype, bias, and (optional) ReLU all go INTO the
            # GEMM epilogue: on the Pallas route the only HBM write is
            # then the finished activation; the XLA route applies the
            # identical trailing ops (ops/quant.py int8_dot)
            return int8_dot(x, x_scale, scale * rows,
                            out_dtype=self.dtype or x_scale.dtype,
                            use_pallas=int8_pallas,
                            bias=b if add_bias else None,
                            relu=fuse_relu)
        kernel = (scale * rows).astype(self.dtype or x.dtype)
        y = jnp.matmul(x, kernel, preferred_element_type=x.dtype)
        if b is not None and add_bias:
            y = y + b.astype(y.dtype)
        if fuse_relu:
            y = nn.relu(y)
        return y

    @nn.compact
    def fold_vector(self, x: jax.Array) -> jax.Array:
        """``x * kernel[:, 0]`` for a features==1 layer: lets callers fold
        this projection into an elementwise factor instead of materializing
        the tensor it would be applied to (see MultiplyAttention — exact at
        inference because the scalar bias is shift-invariant under the
        softmax that follows). Declares the same parameters as ``__call__``.
        """
        assert self.features == 1, "fold_vector requires a [in, 1] kernel"
        full_dim = x.shape[-1]
        v = self.param("v", torch_linear_uniform(full_dim),
                       (full_dim, self.features))
        g = self.param("g", lambda _key: jnp.sqrt(jnp.sum(v * v)))
        if self.use_bias:  # declared for parameter-structure parity
            self.param("b", torch_linear_uniform(full_dim), (self.features,))
        scale = g * jax.lax.rsqrt(jnp.sum(v * v))
        return x * (scale * v)[:, 0].astype(x.dtype)


class FCNet(nn.Module):
    """Non-linear fully-connected network (reference modules.py:13-60).

    layer==1 or mid_dim==0:  WNDense(in->out), ReLU
    else:                    WNDense(in->mid), ReLU, Dropout,
                             [WNDense(mid->mid), ReLU, Dropout] * (layer-2),
                             WNDense(mid->out), ReLU
    """

    out_dim: int
    mid_dim: int = 0
    layer: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True,
                 x_scale: Optional[jax.Array] = None,
                 int8_pallas: bool = False) -> jax.Array:
        # x_scale: per-row dequant scales when x is an int8 activation
        # (consumed by the first layer's WNDense int8 path).
        # int8 inputs: the ReLU fuses into the GEMM epilogue (WNDense
        # fuse_relu -> ops/quant.py int8_dot) instead of costing a
        # separate full-tensor elementwise pass after a pallas_call
        fuse = x.dtype == jnp.int8
        if self.layer == 1 or self.mid_dim == 0:
            x = WNDense(self.out_dim, name="fc0")(x, x_scale=x_scale,
                                                  int8_pallas=int8_pallas,
                                                  fuse_relu=fuse)
            return x if fuse else nn.relu(x)
        x = WNDense(self.mid_dim, name="fc0")(x, x_scale=x_scale,
                                              int8_pallas=int8_pallas,
                                              fuse_relu=fuse)
        if not fuse:
            x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(self.layer - 2):
            x = nn.relu(WNDense(self.mid_dim, name=f"fc{i + 1}")(x))
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = WNDense(self.out_dim, name=f"fc{self.layer - 1}")(x)
        return nn.relu(x)


class LReLUNet(nn.Module):
    """Bias-free Linear + LeakyReLU (reference modules.py:62-77)."""

    out_dim: int
    neg_slope: float = 0.01

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        w = self.param("w", torch_linear_uniform(in_dim), (in_dim, self.out_dim))
        y = jnp.matmul(x, w.astype(x.dtype), preferred_element_type=x.dtype)
        return nn.leaky_relu(y, self.neg_slope)


class DotProduct(nn.Module):
    """Bilinear similarity (reference modules.py:80-95).

    a: [batch, a_len, a_dim], b: [batch, b_len, b_dim]
    -> [batch, a_len, b_len] = (a Wa + ba) @ (b Wb + bb)^T
    """

    out_dim: int

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        a_dim, b_dim = a.shape[-1], b.shape[-1]
        wa = self.param("wa", torch_linear_uniform(a_dim), (a_dim, self.out_dim))
        ba = self.param("ba", torch_linear_uniform(a_dim), (self.out_dim,))
        wb = self.param("wb", torch_linear_uniform(b_dim), (b_dim, self.out_dim))
        bb = self.param("bb", torch_linear_uniform(b_dim), (self.out_dim,))
        pa = jnp.matmul(a, wa.astype(a.dtype)) + ba.astype(a.dtype)
        pb = jnp.matmul(b, wb.astype(b.dtype)) + bb.astype(b.dtype)
        return jnp.einsum("bik,bjk->bij", pa, pb, preferred_element_type=a.dtype)

    @nn.compact
    def similarity_parts(self, a: jax.Array, aq=None,
                         use_pallas: bool = False):
        """Self-similarity decomposition: ``alpha = DotProduct(a, a)`` as

            alpha_ij = (a C) a^T |_ij + u_i + w_j
            C = Wa Wb^T,  u = a (Wa bb) + ba.bb,  w = a (Wb ba)

        (exact algebra). This needs ONE [*, in]@[in, in] GEMM (a C) instead
        of the two out_dim projections — the GCN inference fast path feeds
        (a C, a, u, w) to the fused chain kernel which finishes the tiny
        per-image contraction on-chip (ops/pallas/gcn_chain.py). C costs one
        [in, out]@[out, in] weight-side matmul per call (negligible next to
        the batch GEMMs). Declares the same parameters as ``__call__``.

        ``aq``: optional pre-quantized (a_q int8, a_scale) of ``a`` — the
        big ``a C`` GEMM then runs int8 on the MXU (ops/quant.py).
        Returns (ac [B, n, in], u [B, n], w [B, n]).
        """
        a_dim = a.shape[-1]
        wa = self.param("wa", torch_linear_uniform(a_dim), (a_dim, self.out_dim))
        ba = self.param("ba", torch_linear_uniform(a_dim), (self.out_dim,))
        wb = self.param("wb", torch_linear_uniform(a_dim), (a_dim, self.out_dim))
        bb = self.param("bb", torch_linear_uniform(a_dim), (self.out_dim,))
        c = jnp.matmul(wa, wb.T, preferred_element_type=jnp.float32)
        if aq is not None:
            from vqa_tpu.ops.quant import int8_dot
            ac = int8_dot(aq[0], aq[1], c, out_dtype=a.dtype,
                          use_pallas=use_pallas)
        else:
            ac = jnp.matmul(a, c.astype(a.dtype), preferred_element_type=a.dtype)
        u = jnp.matmul(a, (wa @ bb).astype(a.dtype)) + jnp.dot(ba, bb).astype(a.dtype)
        w = jnp.matmul(a, (wb @ ba).astype(a.dtype))
        return ac, u, w
