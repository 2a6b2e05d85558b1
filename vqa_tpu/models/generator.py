"""Caption decoders (teacher-forced training + per-step decode for search).

TPU-native equivalents of `/root/reference/modules/generator.py`:

- ``BaseDecoder`` (generator.py:123-190) — Show-Attend-Tell: one GRU/LSTM
  cell; each step attends over the 36 boxes with the current hidden state and
  feeds ``[prev_word_embed ; attended_v]`` to the cell.
- ``BUTDDecoder`` (generator.py:193-267) — Up-Down 2-cell decoder:
  word RNN -> attention -> language RNN.

TPU-first redesign of the training loop: the reference sorts by caption
length and shrinks the batch every step (generator.py:75-113), which defeats
batching and forces dynamic shapes. Here all ``c_len-1`` steps run for the
full batch with a validity mask; the caption loss masks padded positions
(packed-CE equivalence, see ``vqa_tpu.models.wrapper.ce_for_language_model``).
Masked extra steps are cheaper than dynamic shapes on XLA (SURVEY.md
section 5.7).

Weight init quirks replicated: BaseDecoder's output layer is U(-0.1, 0.1)
with zero bias (generator.py:173-175); BUTDDecoder defines the same
``_init_weights`` but never calls it (generator.py:243-247), so its output
layers keep torch's default Linear init.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import flax.linen as nn

from vqa_tpu.ops.attention import set_att
from vqa_tpu.ops.linear import torch_linear_uniform
from vqa_tpu.ops.rnn import RNNCellBase


def _uniform_pm(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class _Dense(nn.Module):
    """Plain Linear with configurable (torch-style) init, stored [in, out]."""

    features: int
    w_init: Any = None   # default: torch Linear default
    b_init: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        w_init = self.w_init or torch_linear_uniform(in_dim)
        b_init = self.b_init or torch_linear_uniform(in_dim)
        w = self.param("w", w_init, (in_dim, self.features))
        b = self.param("b", b_init, (self.features,))
        return jnp.matmul(x, w.astype(x.dtype),
                          preferred_element_type=x.dtype) + b.astype(x.dtype)


class DecoderBase(nn.Module):
    """Shared teacher-forcing driver (generator.py:40-120, masked rewrite)."""

    ntoken: int
    hidden_dim: int
    max_len: int
    dropout: float = 0.5
    rnn_type: str = "GRU"
    att_type: str = "base"
    att_dropout: float = 0.2   # MultiplyAttention default (attention.py:61)
    h_num: int = 1
    # True: teacher forcing as one nn.scan step traced once (compile time
    # O(1) in c_len); False: Python-unrolled steps (the round-1 layout,
    # kept as the parity reference — identical outputs, see
    # tests/test_models.py::test_scan_teacher_forcing_matches_unrolled)
    use_scan: bool = True
    # remat the teacher-forcing scan body: the backward recomputes each
    # step's cells + attention from the carried hidden states instead of
    # stacking every intermediate. With the vocab head hoisted out of the
    # scan the stacked intermediates are all [B, <=3H]-sized, so both
    # layouts are viable — measured on TPU in PERF.md "MTL train step".
    remat_scan: bool = True
    # hand-structured backward for the teacher-forcing scan
    # (ops/decode_scan.py): defers the [B, objs, v_dim] grad-of-v
    # accumulation to one post-scan einsum and rebuilds each step from the
    # carried hidden states. BUTD + GRU + MultiplyAttention only (falls
    # back to the nn.scan path otherwise). Dropout draws a different — but
    # equally valid — random stream than the nn.scan path (fold_in per
    # step vs split_rngs; same caveat as --prng_impl).
    fused_vjp: bool = True
    # route the fused-VJP scan's attention tail + pooling (and its
    # backward + deferred grad-of-vp) through the TPU Pallas kernels in
    # ops/pallas/decode_att.py: the attention-dropout mask is regenerated
    # from the hardware PRNG wherever needed and never touches HBM.
    # TPU-only, flagship decode shapes only (decode_att.supported);
    # falls back silently otherwise.
    pallas_att: bool = False

    def hoisted_gates(self, v_mean, prev_dim: int):
        """Loop-invariant input-gate cache (BUTD overrides; None = n/a)."""
        return None

    def _make_attention(self):
        kwargs = {"hidden_dim": self.hidden_dim, "name": "attention"}
        if self.att_type == "new":
            kwargs["dropout"] = self.att_dropout
        return set_att(self.att_type)(**kwargs)

    def init_hidden(self, batch_size: int, dtype=jnp.float32) -> List:
        """Zero states; LSTM carries (h, c) pairs (generator.py:45-49)."""
        init = jnp.zeros((batch_size, self.hidden_dim), dtype)
        if self.rnn_type == "LSTM":
            return [(init, init)] * self.h_num
        return [init] * self.h_num

    def decode(self, v, v_mean, prev, h, *, att_cache=None,
               deterministic: bool = True):
        raise NotImplementedError

    def project_v(self, v):
        """Loop-invariant attention v-projection; compute once per batch and
        pass to every ``decode`` as ``att_cache`` (the reference recomputes
        it per step, generator.py:177-190 — on TPU that is ~20x the FLOPs
        of the rest of the step)."""
        return self.attention.project_v(v, q_dim=self.hidden_dim)

    def __call__(self, batch: Dict[str, Any], *, deterministic: bool = True
                 ) -> Dict[str, jax.Array]:
        """Teacher-forced forward over all steps with a validity mask.

        batch needs: 'v' [B, objs, v_dim], 'c' [B, c_len, embed] (embedded
        caption), 'cap_len' [B], 'c_target' [B, c_len] int tokens.
        Returns {'predict': [B, c_len-1, ntoken], 'target': [B, c_len-1],
                 'mask': [B, c_len-1] float}.
        """
        v = batch["v"]
        caption = batch["c"]
        cap_len = batch["cap_len"]
        target = batch["c_target"]
        batch_size = v.shape[0]
        v_mean = jnp.mean(v, axis=1)
        steps = self.max_len - 1  # we don't decode at the <end> position

        h = self.init_hidden(batch_size, v.dtype)
        att_cache = self.project_v(v)   # hoisted out of the time loop
        if self.use_scan:
            # One traced decode step scanned over time: params broadcast,
            # per-step dropout keys split (matching the unrolled loop's
            # independent per-step dropout).
            def body(mdl, carry, prev):
                carry, word, _ = mdl.decode(v=v, v_mean=v_mean, prev=prev,
                                            h=carry, att_cache=att_cache,
                                            deterministic=deterministic)
                return carry, word
            scan = nn.scan(body, variable_broadcast="params",
                           split_rngs={"params": False, "dropout": True},
                           in_axes=1, out_axes=1)
            _, predict = scan(self, h, caption[:, :steps, :])
        else:
            outputs = []
            for t in range(steps):
                h, word, _ = self.decode(v=v, v_mean=v_mean,
                                         prev=caption[:, t, :],
                                         h=h, att_cache=att_cache,
                                         deterministic=deterministic)
                outputs.append(word)
            predict = jnp.stack(outputs, axis=1)      # [B, steps, ntoken]
        # Step t is valid iff t < cap_len - 1 (generator.py:93,100).
        mask = (jnp.arange(steps)[None, :] < (cap_len[:, None] - 1))
        return {
            "predict": predict,
            "target": target[:, 1:self.max_len],      # words after <start>
            "mask": mask.astype(predict.dtype),
        }


    def caption_loss(self, batch: Dict[str, Any], *,
                     deterministic: bool = False) -> Dict[str, jax.Array]:
        """Teacher-forced masked CE fused into the time scan.

        Mathematically identical to ``__call__`` +
        ``wrapper.ce_for_language_model`` (pinned by
        tests/test_models.py::test_fused_caption_loss_matches_unfused), but
        TPU-first for the training hot path (the dominant cost of the MTL
        step — reference hot loop at
        `/root/reference/modules/generator.py:66-120` + wrapper.py:32-36):

        - the scan body is cells + attention only, rematerialized
          (``nn.remat``): the backward recomputes each step from the small
          carried hidden states; the vocab head + CE run ONCE on the
          stacked [B, T, H] features after the scan (``_vocab_ce_sum``);
        - loop-invariant work is hoisted: attention's v projection
          (``project_v``) and the word-RNN's v_mean input-gate slice
          (``hoisted_gates``);
        - the time axis follows ``batch['c']``: a length-bucketing loader
          (data/loader.py) may hand a caption axis truncated below c_len,
          shrinking the number of scanned steps with identical loss (every
          dropped step is masked zero).

        Returns {'loss': scalar masked mean CE, 'mask_sum': scalar}.
        """
        v = batch["v"]
        caption = batch["c"]
        cap_len = batch["cap_len"]
        target = batch["c_target"]
        batch_size = v.shape[0]
        v_mean = jnp.mean(v, axis=1)
        steps = caption.shape[1] - 1

        h = self.init_hidden(batch_size, v.dtype)
        att_cache = self.project_v(v)
        v_gates = self.hoisted_gates(v_mean, caption.shape[-1])
        mask = (jnp.arange(steps)[None, :] < (cap_len[:, None] - 1))
        acc_dtype = jnp.promote_types(v.dtype, jnp.float32)
        mask = mask.astype(acc_dtype)

        if self._fused_vjp_ok(v_gates):
            # int8 feed: hand the scan the FACTORED visual input (int8
            # payload + [B, objs] weights) — per-step pooling reads half
            # the bytes and grad-of-v collapses to a [B, objs] accumulate
            # (ops/decode_scan.py "factored_v")
            v_factored = (None if "v_q8" not in batch else
                          (batch["v_q8"], batch["v_w"].astype(v.dtype)))
            feats = self._fused_vjp_feats(v, att_cache, v_gates,
                                          caption[:, :steps, :], h,
                                          deterministic,
                                          v_factored=v_factored)
        else:
            def body(mdl, h, prev):
                # vocab head deliberately NOT applied here: the scan emits
                # the pre-logit features and ONE batched [B*steps, H] x
                # [H, ntoken] GEMM + CE runs after the scan. Per-step
                # [B, ntoken] GEMMs ran at ~50% MXU and their CE epilogues
                # + remat recompute dominated the step (PERF.md "MTL train
                # step", round 3); batching the head also shrinks the
                # remat'd body to cells + attention.
                h, feat, _ = mdl.decode(v=v, v_mean=v_mean, prev=prev, h=h,
                                        att_cache=att_cache,
                                        deterministic=deterministic,
                                        return_features=True,
                                        v_gate_cache=v_gates)
                return h, feat

            if self.remat_scan:
                body = nn.remat(body, prevent_cse=False)
            scan = nn.scan(body, variable_broadcast="params",
                           split_rngs={"params": False, "dropout": True},
                           in_axes=1, out_axes=1)
            _, feats = scan(self, h, caption[:, :steps, :])  # [B, steps, H]
        tgt = target[:, 1:steps + 1]                      # [B, steps]
        nll_sum = self._vocab_ce_sum(feats, tgt, mask, acc_dtype)
        mask_sum = jnp.sum(mask)
        return {"loss": nll_sum / jnp.maximum(mask_sum, 1.0),
                "mask_sum": mask_sum}

    def _fused_vjp_ok(self, v_gates) -> bool:
        """The hand-structured backward covers the flagship decode shape
        only: BUTD (two GRU cells, signalled by a hoisted gate cache) with
        MultiplyAttention. Initialization must run the stock path so the
        flax submodules declare their params."""
        return (self.fused_vjp and self.h_num == 2
                and self.rnn_type == "GRU" and self.att_type == "new"
                and v_gates is not None and not self.is_initializing())

    def _fused_vjp_feats(self, v, att_cache, v_gates, prev_seq, h,
                         deterministic: bool, v_factored=None) -> jax.Array:
        """Run the teacher-forcing scan through the custom-VJP
        implementation (ops/decode_scan.py) -> [B, steps, H] features.
        ``v_factored``: optional ``(q8, w)`` int8-feed factorization of
        ``v`` (then ``v`` is only used for its shape/dtype)."""
        from vqa_tpu.ops.decode_scan import make_butd_caption_scan
        use_pa = False
        if self.pallas_att and jax.default_backend() == "tpu":
            from vqa_tpu.ops.pallas.decode_att import pick_tile, supported
            pool = v_factored[0] if v_factored is not None else v
            use_pa = (supported(v.shape[0], v.shape[1], self.hidden_dim,
                                pool.shape[-1])
                      and pick_tile(v.shape[0], v.shape[1], self.hidden_dim,
                                    pool.shape[-1], v.dtype.itemsize,
                                    pool.dtype.itemsize) > 0)
        scan_fn, _ = make_butd_caption_scan(
            hidden_dim=self.hidden_dim, v_dim=v.shape[-1],
            dropout=self.dropout, att_dropout=self.att_dropout,
            deterministic=deterministic,
            factored_v=v_factored is not None,
            pallas_att=use_pa)
        params = self.variables["params"]
        P = {"word_rnn": params["word_rnn"],
             "h1_fcnet": params["h1_fcnet"],
             "language_rnn": params["language_rnn"],
             "attention": {"W_q": params["attention"]["W_q"],
                           "linear": params["attention"]["linear"]}}
        key = (self.make_rng("dropout") if not deterministic
               else jax.random.key(0))
        if v_factored is not None:
            q8, w = v_factored
            feats_tm = scan_fn(P, q8, w, att_cache, v_gates, prev_seq,
                               h[0], h[1], key)
        else:
            feats_tm = scan_fn(P, v, att_cache, v_gates, prev_seq,
                               h[0], h[1], key)
        return jnp.swapaxes(feats_tm, 0, 1)

    def _ce_rows(self, feats: jax.Array, target: jax.Array,
                 mask: jax.Array, acc_dtype) -> jax.Array:
        """sum over rows of mask * (lse(head(feat)) - logit[target]).

        One batched vocab GEMM for all rows; nll = lse - logits[target]
        (reductions + one gather in >=f32) — the [rows, ntoken] log_softmax
        array never materializes. Hand-rolled shifted logsumexp: each upcast
        chain has a single consumer so XLA fuses cast+sub+exp into the
        reduce — a two-consumer logits.astype(f32) materializes a [rows, V]
        f32 copy (6.2 GB at B=4096, OOM on a 16 GB chip). max of bf16 is an
        exact value pick, and f32-subtracting exactly-representable bf16
        values is exact, so this equals logsumexp(logits.astype(f32)).
        """
        logits = self.vocab_head()(feats)                    # [rows, V]
        m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
        lse = (m[..., 0].astype(acc_dtype)
               + jnp.log(jnp.sum(jnp.exp(logits.astype(acc_dtype)
                                         - m.astype(acc_dtype)), axis=-1)))
        tgt = jnp.take_along_axis(logits, target[..., None],
                                  axis=-1)[..., 0].astype(acc_dtype)
        return jnp.sum((lse - tgt) * mask)

    # keep one chunk's logits under ~1 GB: bigger chunks don't speed the
    # GEMM further and two [rows, V] transients (logits + cotangent) have
    # to coexist in the backward
    _CE_CHUNK_BYTES = 1 << 30

    def _vocab_ce_sum(self, feats: jax.Array, target: jax.Array,
                      mask: jax.Array, acc_dtype) -> jax.Array:
        """Masked CE sum over [B, T] with the logits working set bounded.

        Flattens to [B*T] rows and, when one batched GEMM's logits would
        exceed ``_CE_CHUNK_BYTES``, processes row chunks in an ``nn.scan``
        with a remat'd body: chunks run sequentially (XLA reuses the chunk
        buffers across loop iterations) and the backward recomputes each
        chunk's logits from the saved [rows, H] features, so peak HBM holds
        one chunk's logits + cotangent instead of the full [B*T, V] pair.
        """
        B, T, H = feats.shape
        rows = B * T
        feats = feats.reshape(rows, H)
        target = target.reshape(rows)
        mask = mask.reshape(rows)
        n = max(1, -(-(rows * self.ntoken * feats.dtype.itemsize)
                     // self._CE_CHUNK_BYTES))
        if n == 1:
            return self._ce_rows(feats, target, mask, acc_dtype)
        rc = -(-rows // n)
        pad = n * rc - rows
        if pad:
            feats = jnp.pad(feats, ((0, pad), (0, 0)))
            target = jnp.pad(target, (0, pad))
            mask = jnp.pad(mask, (0, pad))  # padded rows: mask 0 => nll 0

        # unrolled chunk loop (NOT nn.scan: its xs/carry stacking added
        # ~20 ms/step of dynamic-update-slice traffic at B=4096); each
        # chunk is remat'd so the backward recomputes that chunk's logits
        # and the serial add chain keeps the chunks' buffers from
        # coexisting
        def chunk(mdl, f_c, t_c, m_c):
            return mdl._ce_rows(f_c, t_c, m_c, acc_dtype)

        chunk = nn.remat(chunk, prevent_cse=False)
        nll_sum = jnp.zeros((), acc_dtype)
        for i in range(n):
            sl = slice(i * rc, (i + 1) * rc)
            nll_sum = nll_sum + chunk(self, feats[sl], target[sl], mask[sl])
        return nll_sum


class BaseDecoder(DecoderBase):
    """Show-Attend-Tell single-cell decoder (generator.py:123-190)."""

    h_num: int = 1

    def vocab_head(self):
        return self.fcnet

    def setup(self):
        self.rnn = RNNCellBase(self.hidden_dim, self.rnn_type, name="rnn")
        self.attention = self._make_attention()
        self.fcnet = _Dense(self.ntoken, w_init=_uniform_pm(0.1),
                            b_init=nn.initializers.zeros, name="fcnet")
        self.drop = nn.Dropout(self.dropout)

    def decode(self, v, v_mean, prev, h, *, att_cache=None, beam: int = 1,
               deterministic: bool = True, return_features: bool = False,
               v_gate_cache=None):
        """One step: attend with h, feed [prev; att_v] to the cell
        (generator.py:177-190).

        ``beam > 1``: v/att_cache are per-image [B, ...] while prev/h are
        flat [B*beam, ...] — the attention reads each image's boxes once
        for all its beams.

        ``return_features``: skip the vocab projection and return the
        pre-logit features instead — the fused vocab-head kernel
        (ops/pallas/vocab_topk.py) consumes them together with the fcnet
        weights (``output = feat @ w + b`` exactly).
        """
        assert v_gate_cache is None, "BaseDecoder has no invariant cell input"
        state = h[0]
        h0 = state[0] if self.rnn_type == "LSTM" else state
        if beam > 1:
            B = v.shape[0]
            att = self.attention(v, h0.reshape(B, beam, -1),
                                 deterministic=deterministic,
                                 v_cache=att_cache)       # [B, beam, n, 1]
            att_v = jnp.einsum("bkn,bnd->bkd", att[..., 0], v)
            att_v = att_v.reshape(B * beam, -1)
            att = att.reshape(B * beam, -1, 1)
        else:
            att = self.attention(v, h0, deterministic=deterministic,
                                 v_cache=att_cache)
            att_v = jnp.sum(att * v, axis=1)
        state = self.rnn(state, jnp.concatenate([prev, att_v], axis=1))
        h0 = state[0] if self.rnn_type == "LSTM" else state
        feat = self.drop(h0, deterministic=deterministic)
        if return_features:
            return [state], feat, att
        return [state], self.fcnet(feat), att


class BUTDDecoder(DecoderBase):
    """Up-Down two-cell decoder (generator.py:193-267)."""

    h_num: int = 2

    def vocab_head(self):
        return self.h2_fcnet

    def setup(self):
        self.word_rnn = RNNCellBase(self.hidden_dim, self.rnn_type,
                                    name="word_rnn")
        self.language_rnn = RNNCellBase(self.hidden_dim, self.rnn_type,
                                        name="language_rnn")
        self.attention = self._make_attention()
        self.h1_fcnet = _Dense(self.hidden_dim, name="h1_fcnet")
        self.h2_fcnet = _Dense(self.ntoken, name="h2_fcnet")
        self.drop = nn.Dropout(self.dropout)

    def hoisted_gates(self, v_mean, prev_dim: int):
        """Loop-invariant slice of the word-RNN input-gate preactivation.

        ``v_mean`` is constant across decode steps, but the reference feeds
        it through the word-RNN input GEMM every step
        (generator.py:249-254). Hoisting its 2048 of 3372 input rows out of
        the 19-step scan (x fwd + remat + bwd) removes ~3 TFLOP per MTL
        train step at B=4096. Exact same math: the input GEMM distributes
        over the concat's row blocks.
        """
        hd = self.hidden_dim
        vd = v_mean.shape[-1]
        return self.word_rnn(None, v_mean, full_in=hd + vd + prev_dim,
                             rows=(hd, hd + vd), gates_only=True)

    def decode(self, v, v_mean, prev, h, *, att_cache=None, beam: int = 1,
               deterministic: bool = True, return_features: bool = False,
               v_gate_cache=None):
        """word RNN -> h1 FC -> attention -> language RNN -> vocab logits
        (generator.py:249-267). ``beam``/``return_features``: see
        BaseDecoder.decode. ``v_gate_cache``: precomputed ``hoisted_gates``.
        """
        h1, h2 = h
        h2_out = h2[0] if self.rnn_type == "LSTM" else h2
        if v_gate_cache is not None:
            hd, vd, pd = self.hidden_dim, v_mean.shape[-1], prev.shape[-1]
            h1 = self.word_rnn(h1, jnp.concatenate([h2_out, prev], axis=1),
                               full_in=hd + vd + pd,
                               rows=[(0, hd), (hd + vd, hd + vd + pd)],
                               extra_xi=v_gate_cache)
        else:
            h1 = self.word_rnn(
                h1, jnp.concatenate([h2_out, v_mean, prev], axis=1))
        h1_out = h1[0] if self.rnn_type == "LSTM" else h1
        hq = self.h1_fcnet(self.drop(h1_out, deterministic=deterministic))
        if beam > 1:
            B = v.shape[0]
            att = self.attention(v, hq.reshape(B, beam, -1),
                                 deterministic=deterministic,
                                 v_cache=att_cache)       # [B, beam, n, 1]
            att_v = jnp.einsum("bkn,bnd->bkd", att[..., 0], v)
            att_v = att_v.reshape(B * beam, -1)
            att = att.reshape(B * beam, -1, 1)
        else:
            att = self.attention(v, hq, deterministic=deterministic,
                                 v_cache=att_cache)
            att_v = jnp.sum(att * v, axis=1)
        h2 = self.language_rnn(h2, jnp.concatenate([att_v, hq], axis=1))
        h2_out = h2[0] if self.rnn_type == "LSTM" else h2
        feat = self.drop(h2_out, deterministic=deterministic)
        if return_features:
            return [h1, h2], feat, att
        return [h1, h2], self.h2_fcnet(feat), att


def set_decoder(decoder_type: str,
                ntoken: int,
                hidden_dim: int,
                max_len: int,
                dropout: float = 0.5,
                rnn_type: str = "GRU",
                att_type: str = "base",
                att_dropout: float = 0.2,
                pallas_att: bool = False):
    """String-keyed decoder factory mirroring generator.py:12-37."""
    if decoder_type == "none":
        return None
    cls = {"base": BaseDecoder, "butd": BUTDDecoder}[decoder_type]
    return cls(ntoken=ntoken, hidden_dim=hidden_dim, max_len=max_len,
               dropout=dropout, rnn_type=rnn_type, att_type=att_type,
               att_dropout=att_dropout, pallas_att=pallas_att)
