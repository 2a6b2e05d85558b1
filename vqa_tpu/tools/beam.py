"""Batched beam-search caption decoding, fully on device.

TPU-native replacement for the reference's per-image host-side priority
queue (`/root/reference/tools/caption.py:40-224`): a fixed-width beam search
over the whole batch as one jitted ``lax.scan`` — every step expands all
``batch x k`` beams with one decoder call (MXU-batched), top-k re-ranks, and
hidden states are gathered by beam index on device. No host round-trips, no
queue, no shrinking batch.

Scoring fixes two reference defects deliberately (divergences documented):
- candidate expansion uses ``log_softmax`` probabilities — the reference
  accumulates raw logits as if they were log-probs (caption.py:96-107,
  SURVEY.md section 2.1 defect 4). Pass ``legacy_logit_scores=True`` to
  reproduce the reference's raw-logit accumulation for comparison runs.
- final ranking is *descending* normalized log-probability
  ``logp / (length - 1 + 1e-6)`` (the reference's ``sorted(..., key=-score)``
  with score = -normalized-logp actually prefers the worst candidate,
  caption.py:121,213-220).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


def make_beam_search(model, k: int, c_len: int, start_id: int, end_id: int,
                     legacy_logit_scores: bool = False,
                     fused_vocab: bool = False,
                     streams: int = 1,
                     approx_topk: bool = False):
    """Build a jitted ``(params, batch) -> (tokens, scores)`` beam search.

    tokens: [B, k, c_len] int32 (beams sorted best-first);
    scores: [B, k] length-normalized log-probs.
    The model must have a generator; the encoder embeds previous tokens
    (mirrors tools/caption.py:93 using ``encoder.embedding``).

    ``fused_vocab``: route the per-step vocab head through the fused Pallas
    kernel (GEMM + running top-k + online logsumexp, never materializing the
    [B*k, ntoken] logits — ops/pallas/vocab_topk.py). Same results as the
    XLA path (pinned by tests/test_tools.py); TPU-only fast path.

    ``streams``: software-pipeline S independent sub-batches inside one
    scan step. A beam step is a serial chain GEMMs (MXU) -> top_k/logsumexp
    (VPU) -> gathers; with S >= 2 the streams have no data dependencies on
    each other, so the TPU scheduler can run stream B's MXU work under
    stream A's VPU tail. Results are bit-identical to streams=1 (pinned by
    tests/test_tools.py); requires B % streams == 0 (falls back to 1
    otherwise).

    ``approx_topk``: replace the per-step vocab ``lax.top_k`` with the
    TPU PartialReduce custom call ``lax.approx_max_k`` (recall_target
    0.99). APPROXIMATE: ~1% of per-row top-k entries may be swapped for
    near-rank neighbors, so decoded captions can differ from the exact
    path on a small fraction of images — an opt-in serving trade
    (measured at the serving shape: the top-k line drops 8.6 -> 6.9 ms
    bf16, scripts/profile_topk.py 2026-08-19). Ignored when
    ``fused_vocab`` is set (that kernel keeps its exact running top-k).
    """
    generator = model.generator
    assert generator is not None, "model has no caption generator"

    def _project_v(params, v):
        def fn(mdl, v):
            return mdl.generator.project_v(v)
        return model.apply({"params": params}, v, method=fn)

    def _decode_step(params, v, v_mean, prev_tokens, h, att_cache,
                     return_features=False):
        def fn(mdl, v, v_mean, prev_tokens, h, att_cache):
            prev = mdl.encoder.embed(prev_tokens)
            return mdl.generator.decode(v=v, v_mean=v_mean, prev=prev, h=h,
                                        att_cache=att_cache, beam=k,
                                        deterministic=True,
                                        return_features=return_features)
        return model.apply({"params": params}, v, v_mean, prev_tokens, h,
                           att_cache, method=fn)

    def _vocab_params(params):
        """(w [H, V], b [V]) of the generator's vocab projection.

        The fused kernel computes ``feat @ w + b`` with no activation, which
        is exactly both stock decoders' ``_Dense`` vocab heads
        (models/generator.py fcnet / h2_fcnet). A future weight-normed or
        activated head must not silently take this path — validate the
        layout and fail loudly.
        """
        gp = params["generator"]
        head = gp["h2_fcnet"] if "h2_fcnet" in gp else gp["fcnet"]
        if set(head.keys()) != {"w", "b"}:
            raise ValueError(
                "fused_vocab requires a plain {w, b} _Dense vocab head; "
                f"generator head has params {sorted(head.keys())} — "
                "run with fused_vocab=False")
        return head["w"], head["b"]

    @jax.jit
    def beam_search(params, batch) -> Tuple[jax.Array, jax.Array]:
        def enc(mdl, b):
            return mdl.encoder(b, deterministic=True)
        embed = model.apply({"params": params}, batch, method=enc)
        v_full = embed["v"]                          # [B, objs, v_dim]
        B_full = v_full.shape[0]
        S = streams if streams > 1 and B_full % streams == 0 else 1

        def consts_of(v):
            # v stays per-image: beam-mode attention (generator.decode
            # beam=k) reads each image's boxes once for all k beams; only
            # the mean (a cell input) is tiled to [B*k, v_dim]
            v_mean_b = jnp.repeat(jnp.mean(v, axis=1), k, axis=0)
            # the attention v-projection never changes across steps or beam
            # reorderings (it has no hidden-state input): one GEMM here
            # replaces c_len-1 GEMMs inside the scan
            return v, v_mean_b, _project_v(params, v)

        def init_of(v):
            B = v.shape[0]
            tokens0 = jnp.full((B, k, c_len), end_id, jnp.int32)
            tokens0 = tokens0.at[:, :, 0].set(start_id)
            # only beam 0 is live initially (avoids k duplicate beams)
            logp0 = jnp.where(jnp.arange(k)[None, :] == 0, 0.0, NEG_INF
                              ) * jnp.ones((B, 1))
            length0 = jnp.ones((B, k), jnp.int32)
            finished0 = jnp.zeros((B, k), bool)
            h0 = generator.init_hidden(B * k, v.dtype)
            return tokens0, logp0, length0, finished0, h0

        def step(consts, carry, t):
            v, v_mean_b, att_cache = consts
            B = v.shape[0]
            tokens, logp, length, finished, h = carry
            prev = tokens[:, :, t].reshape(B * k)
            # Candidate shrink: the global top-k over k*V candidates lies in
            # the union of each beam's top-k, and per-beam top-k of
            # log_softmax == top-k of raw logits (a monotone per-row shift
            # by logsumexp) — so one [B*k, V] top_k + one logsumexp replace
            # materializing and ranking the full [B, k*V] normalized array.
            if fused_vocab:
                # fused GEMM + top-k + logsumexp; [B*k, V] never materializes
                from vqa_tpu.ops.pallas.vocab_topk import vocab_topk_lse
                h, feat, _ = _decode_step(params, v, v_mean_b, prev, h,
                                          att_cache, return_features=True)
                vw, vb = _vocab_params(params)
                R = feat.shape[0]
                tile_r = next(t_ for t_ in (1024, 512, 256, 128, 64, 32,
                                            16, 8, 4, 2, 1) if R % t_ == 0)
                top_val, top_word, lse = vocab_topk_lse(
                    feat, vw.astype(feat.dtype), vb, k=k, tile_r=tile_r,
                    interpret=jax.default_backend() != "tpu")
                step_scores = top_val if legacy_logit_scores else top_val - lse
            else:
                h, logits, _ = _decode_step(params, v, v_mean_b, prev, h,
                                            att_cache)
                # lax.top_k measured fastest among EXACT variants: the
                # two-stage group-max and argmax+mask alternatives
                # (ops/topk.py) both lose on TPU — see that docstring
                if approx_topk:
                    top_val, top_word = jax.lax.approx_max_k(
                        logits, k, recall_target=0.99)         # [B*k, k]
                else:
                    top_val, top_word = jax.lax.top_k(logits, k)
                if legacy_logit_scores:
                    step_scores = top_val
                else:
                    lse = jax.scipy.special.logsumexp(logits, axis=-1,
                                                      keepdims=True)
                    step_scores = top_val - lse
            step_scores = step_scores.reshape(B, k, k)
            top_word = top_word.reshape(B, k, k)
            # finished beams: continue only via <end> with zero added score
            # (candidate 0 becomes <end>, the rest are masked out)
            step_scores = jnp.where(
                finished[:, :, None],
                jnp.where(jnp.arange(k)[None, None, :] == 0, 0.0, NEG_INF),
                step_scores)
            top_word = jnp.where(finished[:, :, None], end_id, top_word)
            cand = logp[:, :, None] + step_scores          # [B, k, k]
            top_logp, top_idx = jax.lax.top_k(cand.reshape(B, k * k), k)
            beam_idx = top_idx // k                        # [B, k]
            word = jnp.take_along_axis(
                top_word.reshape(B, k * k), top_idx, axis=1).astype(jnp.int32)

            gather = lambda arr: jnp.take_along_axis(
                arr, beam_idx[..., None] if arr.ndim == 3 else beam_idx,
                axis=1)
            tokens = jnp.take_along_axis(
                tokens, beam_idx[:, :, None], axis=1)
            tokens = tokens.at[:, :, t + 1].set(word)
            length_g = gather(length)
            finished_g = gather(finished)
            length = length_g + (~finished_g).astype(jnp.int32)
            finished = finished_g | (word == end_id)

            # reorder hidden states: flat index = b * k + beam_idx
            flat_idx = (jnp.arange(B)[:, None] * k + beam_idx).reshape(-1)
            h = jax.tree_util.tree_map(lambda s: s[flat_idx], h)
            return tokens, top_logp, length, finished, h

        sub = B_full // S
        consts = [consts_of(v_full[i * sub:(i + 1) * sub]) for i in range(S)]

        def body(carries, t):
            return tuple(step(consts[i], carries[i], t)
                         for i in range(S)), None

        carries = tuple(init_of(c[0]) for c in consts)
        carries, _ = jax.lax.scan(body, carries, jnp.arange(c_len - 1))
        tokens, logp, length, finished = (
            jnp.concatenate([c[i] for c in carries], axis=0)
            for i in range(4))

        # length-normalized score (caption.py:24-26), finished beams first
        norm = logp / (length.astype(logp.dtype) - 1 + 1e-6)
        ranked = jnp.where(finished, norm, norm + 2 * NEG_INF)
        order = jnp.argsort(-ranked, axis=1)
        tokens = jnp.take_along_axis(tokens, order[:, :, None], axis=1)
        norm = jnp.take_along_axis(norm, order, axis=1)
        return tokens, norm

    return beam_search


def tokens_to_captions(tokens: np.ndarray, vocab, end_id: int,
                       drop_specials: bool = True) -> List[str]:
    """[B, T] token rows -> caption strings (stop at <end>)."""
    out = []
    for row in np.asarray(tokens):
        words = []
        for tok in row:
            word = vocab.words[int(tok)]
            if int(tok) == end_id and words:
                if not drop_specials:
                    words.append(word)
                break
            if drop_specials and word in ("<start>", "<end>", "<pad>"):
                continue
            words.append(word)
        out.append(" ".join(words))
    return out


def decode_batch(model, params, batch: Dict, vocab, k: int = 3,
                 c_len: int = 20, beam_search=None) -> List[str]:
    """Beam-decode one batch to caption strings (best beam per image)."""
    if beam_search is None:
        beam_search = make_beam_search(model, k, c_len, vocab.start, vocab.end)
    tokens, _ = beam_search(params, batch)
    return tokens_to_captions(np.asarray(tokens)[:, 0, :], vocab, vocab.end)
