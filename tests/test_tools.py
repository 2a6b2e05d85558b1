"""Beam-search decoding and caption-metric tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqa_tpu.data.tokenizer import Vocab
from vqa_tpu.models.wrapper import set_model
from vqa_tpu.tools.beam import make_beam_search, tokens_to_captions, decode_batch
from vqa_tpu.tools import metrics

NTOKEN = 30
C_LEN = 7
B = 3


def _vocab():
    words = [f"w{i}" for i in range(NTOKEN - 4)] + \
        ["<oov>", "<start>", "<end>", "<pad>"]
    return Vocab(words)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    model = set_model(encoder_type="base", predictor_type="none",
                      decoder_type="base", ntoken=NTOKEN, v_dim=16,
                      embed_dim=8, hidden_dim=12, decoder_hidden_dim=10,
                      ans_dim=5, c_len=C_LEN, dropout=0.0)
    batch = {
        "img": jnp.asarray(rng.standard_normal((B, 4, 16)).astype(np.float32)),
        "q": jnp.asarray(rng.integers(0, NTOKEN, (B, 5))),
        "c": jnp.asarray(rng.integers(0, NTOKEN, (B, C_LEN))),
        "cap_len": jnp.asarray(np.full(B, C_LEN)),
    }
    params = model.init(jax.random.key(0), batch)["params"]
    return model, params, batch


def test_beam_search_shapes_and_ranking(setup):
    model, params, batch = setup
    vocab = _vocab()
    bs = make_beam_search(model, k=3, c_len=C_LEN, start_id=vocab.start,
                          end_id=vocab.end)
    tokens, scores = bs(params, batch)
    assert tokens.shape == (B, 3, C_LEN)
    assert scores.shape == (B, 3)
    s = np.asarray(scores)
    assert np.all(np.diff(s, axis=1) <= 1e-5)  # sorted best-first
    assert np.all(np.asarray(tokens)[:, :, 0] == vocab.start)


def test_beam_streams_match_single_stream(setup):
    """streams=2 (software-pipelined sub-batches) is bit-identical to the
    plain search; a non-dividing stream count falls back to 1."""
    model, params, batch = setup
    vocab = _vocab()
    kw = dict(k=3, c_len=C_LEN, start_id=vocab.start, end_id=vocab.end)
    tokens1, scores1 = make_beam_search(model, **kw)(params, batch)
    tokens2, scores2 = make_beam_search(model, streams=3, **kw)(params, batch)
    np.testing.assert_array_equal(np.asarray(tokens1), np.asarray(tokens2))
    np.testing.assert_array_equal(np.asarray(scores1), np.asarray(scores2))
    # B=3 % 2 != 0 -> falls back to a single stream
    tokens3, _ = make_beam_search(model, streams=2, **kw)(params, batch)
    np.testing.assert_array_equal(np.asarray(tokens1), np.asarray(tokens3))


def test_beam_k1_matches_greedy(setup):
    """k=1 beam == greedy argmax rollout of the decoder."""
    model, params, batch = setup
    vocab = _vocab()
    bs = make_beam_search(model, k=1, c_len=C_LEN, start_id=vocab.start,
                          end_id=vocab.end)
    tokens, _ = bs(params, batch)
    tokens = np.asarray(tokens)[:, 0, :]

    # manual greedy rollout via decode_step
    def fn(mdl, v, v_mean, prev_tokens, h):
        prev = mdl.encoder.embed(prev_tokens)
        return mdl.generator.decode(v=v, v_mean=v_mean, prev=prev, h=h,
                                    deterministic=True)

    def enc(mdl, b):
        return mdl.encoder(b, deterministic=True)

    embed = model.apply({"params": params}, batch, method=enc)
    v = embed["v"]
    v_mean = jnp.mean(v, axis=1)
    h = model.generator.init_hidden(B, v.dtype)
    cur = jnp.full((B,), vocab.start, jnp.int32)
    got = [np.asarray(cur)]
    done = np.zeros(B, bool)
    # accumulate scores exactly like the beam (top_k of raw logits, then
    # shift by logsumexp — argmax-equivalent, see beam.py candidate shrink)
    # so float tie-breaking matches
    logp = np.zeros((B,), np.float32)
    for t in range(C_LEN - 1):
        h, logits, _ = model.apply({"params": params}, v, v_mean, cur, h,
                                   method=fn)
        top_val, top_idx = jax.lax.top_k(logits, 1)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        step = np.asarray(top_idx)[:, 0].astype(np.int32)
        logp = logp + np.asarray(top_val)[:, 0] - np.asarray(lse)
        step[done] = vocab.end  # finished beams stay at <end>
        got.append(step.copy())
        done |= step == vocab.end
        cur = jnp.asarray(step)
    want = np.stack(got, axis=1)
    np.testing.assert_array_equal(tokens, want)


def test_legacy_logit_scores_runs(setup):
    model, params, batch = setup
    vocab = _vocab()
    bs = make_beam_search(model, k=2, c_len=C_LEN, start_id=vocab.start,
                          end_id=vocab.end, legacy_logit_scores=True)
    tokens, scores = bs(params, batch)
    assert tokens.shape == (B, 2, C_LEN)


def test_decode_batch_strings(setup):
    model, params, batch = setup
    vocab = _vocab()
    caps = decode_batch(model, params, batch, vocab, k=2, c_len=C_LEN)
    assert len(caps) == B
    for c in caps:
        assert "<start>" not in c and "<end>" not in c


def test_tokens_to_captions():
    vocab = _vocab()
    toks = np.array([[vocab.start, 0, 1, vocab.end, vocab.pad]])
    assert tokens_to_captions(toks, vocab, vocab.end) == ["w0 w1"]


# -------------------------------------------------------------- metrics

REFS = {
    0: ["a brown dog runs in the park", "the dog is running outside"],
    1: ["two people ride bikes", "a pair of cyclists on a road"],
}


def test_metrics_perfect_match():
    hyps = {k: [REFS[k][0]] for k in REFS}
    out = metrics.score(REFS, hyps)
    assert out["Bleu_1"] == pytest.approx(1.0)
    assert out["Bleu_4"] == pytest.approx(1.0)
    assert out["ROUGE_L"] == pytest.approx(1.0)
    assert out["CIDEr"] > 5.0          # tf-idf cosine == 1 on matched ngrams
    assert out["METEOR"] > 0.9


def test_metrics_ranking():
    good = {0: ["a brown dog runs in the park"], 1: ["two people ride bikes"]}
    bad = {0: ["purple elephants fly high"], 1: ["quantum cheese melts"]}
    sg = metrics.score(REFS, good)
    sb = metrics.score(REFS, bad)
    for m in ("Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr", "METEOR"):
        assert sg[m] > sb[m], m


def test_bleu_brevity_penalty():
    refs = {0: ["a b c d e f"]}
    short = {0: ["a b c"]}
    full = {0: ["a b c d e f"]}
    assert metrics.bleu(refs, short)[0] < metrics.bleu(refs, full)[0]


def test_beam_scores_match_recomputed_sequence_logp(setup):
    """The returned normalized score of each beam equals the independently
    recomputed sum of per-step log-probs of its token sequence — validates
    all beam bookkeeping (gathering, lengths, finished handling)."""
    model, params, batch = setup
    vocab = _vocab()
    k = 3
    bs = make_beam_search(model, k=k, c_len=C_LEN, start_id=vocab.start,
                          end_id=vocab.end)
    tokens, scores = bs(params, batch)
    tokens = np.asarray(tokens)
    scores = np.asarray(scores)

    def fn(mdl, v, v_mean, prev_tokens, h):
        prev = mdl.encoder.embed(prev_tokens)
        return mdl.generator.decode(v=v, v_mean=v_mean, prev=prev, h=h,
                                    deterministic=True)

    def enc(mdl, b):
        return mdl.encoder(b, deterministic=True)

    embed = model.apply({"params": params}, batch, method=enc)
    v = embed["v"]
    v_mean = jnp.mean(v, axis=1)

    for b in range(B):
        for beam in range(k):
            seq = tokens[b, beam]
            h = model.generator.init_hidden(1, v.dtype)
            logp = 0.0
            length = 1
            for t in range(C_LEN - 1):
                cur = jnp.asarray([seq[t]], jnp.int32)
                h, logits, _ = model.apply({"params": params}, v[b:b + 1],
                                           v_mean[b:b + 1], cur, h, method=fn)
                ls = np.asarray(jax.nn.log_softmax(logits, axis=-1))[0]
                logp += ls[seq[t + 1]]
                length += 1
                if seq[t + 1] == vocab.end:
                    break
            want = logp / (length - 1 + 1e-6)
            np.testing.assert_allclose(scores[b, beam], want, rtol=1e-3,
                                       atol=1e-4)


def test_porter_stemmer_golden():
    """Porter (1980) published examples, original-algorithm semantics."""
    from vqa_tpu.tools.porter import porter_stem
    cases = {
        "caresses": "caress", "ponies": "poni", "caress": "caress",
        "cats": "cat", "feed": "feed", "agreed": "agre",
        "plastered": "plaster", "motoring": "motor", "sing": "sing",
        "conflated": "conflat", "hopping": "hop", "sized": "size",
        "filing": "file", "happy": "happi", "sky": "sky",
        "relational": "relat", "conditional": "condit",
        "rational": "ration", "digitizer": "digit",
        "vietnamization": "vietnam", "operator": "oper",
        "decisiveness": "decis", "triplicate": "triplic",
        "formative": "form", "electriciti": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "adjustable": "adjust",
        "replacement": "replac", "adoption": "adopt",
        "activate": "activ", "effective": "effect", "rate": "rate",
        "controll": "control", "roll": "roll",
        "dogs": "dog", "plays": "plai", "played": "plai",
        "playing": "plai",
    }
    for word, want in cases.items():
        assert porter_stem(word) == want, word


def test_meteor_stem_stage_matches_morphological_variants():
    """Module-2 stem matching (METEOR 1.5) credits inflection variants the
    exact-only variant misses (VERDICT r1 item 7)."""
    from vqa_tpu.tools.metrics import meteor
    refs = {0: ["a dog plays with the red ball"]}
    hyps = {0: ["the dogs played with a red ball"]}
    exact = meteor(refs, hyps, use_stem=False)
    stemmed = meteor(refs, hyps, use_stem=True)
    assert stemmed > exact, (exact, stemmed)
    # identical sentences are unaffected by the stem stage
    same = {0: ["a dog plays with the red ball"]}
    assert meteor(refs, same, use_stem=True) == \
        meteor(refs, same, use_stem=False)


def test_meteor_beam_alignment_minimizes_chunks():
    """The jar-style beam aligner finds the contiguous alignment the greedy
    left-to-right stage misses (VERDICT r2 item 7): hyp 'a b c' aligns to
    ref[1:4] of 'b a b c' as ONE chunk (greedy matches hyp 'a'->ref[1],
    'b'->ref[0], 'c'->ref[3]: three chunks)."""
    from vqa_tpu.tools.metrics import _beam_align, _meteor_single
    hyp = "a b c".split()
    ref = "b a b c".split()
    m_h, m_r, w_h, w_r, chunks = _beam_align(hyp, ref, use_stem=False,
                                             stem_weight=0.6)
    assert (m_h, m_r, w_h, w_r, chunks) == (3, 3, 3.0, 3.0, 1)
    beam = _meteor_single(hyp, ref, use_stem=False, alignment="beam")
    greedy = _meteor_single(hyp, ref, use_stem=False, alignment="greedy")
    assert beam > greedy, (beam, greedy)
    # hand-computed: p=1, r=3/4, fmean=.75/(.9+.075), penalty=.5*(1/3)^3
    want = (0.75 / 0.975) * (1 - 0.5 * (1 / 3) ** 3)
    assert abs(beam - want) < 1e-12, (beam, want)
    # identical sentences: perfect single-chunk alignment either way
    perfect = _meteor_single(hyp, hyp, use_stem=False, alignment="beam")
    assert perfect == _meteor_single(hyp, hyp, use_stem=False,
                                     alignment="greedy")
    # coverage dominates: beam prefers exact over stem matches at equal
    # coverage (module weight is the second key)
    m2, _, w2, _, _ = _beam_align("dog".split(), "dog dogs".split(),
                                  use_stem=True, stem_weight=0.6)
    assert (m2, w2) == (1, 1.0)


def test_meteor_stem_vs_exact_ranking_agreement():
    """The stem stage shifts absolute values but must preserve quality
    ordering on a graded-corruption corpus (quantified: Kendall tau)."""
    from vqa_tpu.tools.metrics import meteor
    ref_sent = "a man riding a wave on top of a surfboard in the ocean"
    # hypotheses from best to worst
    graded = [
        "a man riding a wave on top of a surfboard in the ocean",
        "a man rides waves on top of his surfboard in the ocean",
        "a man riding waves in the sea",
        "a person on a board in water",
        "two dogs running through a grassy field",
    ]
    scores_exact, scores_stem = [], []
    for hyp in graded:
        refs = {0: [ref_sent]}
        hyps = {0: [hyp]}
        scores_exact.append(meteor(refs, hyps, use_stem=False))
        scores_stem.append(meteor(refs, hyps, use_stem=True))

    def kendall_tau(a, b):
        n = len(a)
        concordant = discordant = 0
        for i in range(n):
            for j in range(i + 1, n):
                s = (a[i] - a[j]) * (b[i] - b[j])
                concordant += s > 0
                discordant += s < 0
        return (concordant - discordant) / (n * (n - 1) / 2)

    tau = kendall_tau(scores_exact, scores_stem)
    assert tau >= 0.8, (tau, scores_exact, scores_stem)
    # both variants must rank the graded corpus monotonically
    assert scores_stem == sorted(scores_stem, reverse=True), scores_stem
    assert scores_exact == sorted(scores_exact, reverse=True), scores_exact


def test_meteor_synonym_module(tmp_path):
    """Module-3 synonym matching (METEOR 1.5, weight 0.8) credits synset
    neighbours when a table is supplied; precedence exact > synonym > stem."""
    from vqa_tpu.tools.metrics import (SynsetTable, _beam_align,
                                       load_synsets, meteor)
    path = tmp_path / "english.synsets"
    path.write_text("# comment line\n"
                    "dog canine domestic_dog\n"
                    "ocean sea\n"
                    "dog hotdog  # a second group sharing 'dog'\n")
    table = load_synsets(str(path))
    assert table.synonyms("dog", "canine")
    assert table.synonyms("sea", "ocean")
    assert table.synonyms("hotdog", "dog")      # via the second group
    assert not table.synonyms("canine", "hotdog")  # no shared group
    assert not table.synonyms("dog", "ball")

    refs = {0: ["a dog swims in the ocean"]}
    hyps = {0: ["a canine swims in the sea"]}
    without = meteor(refs, hyps)
    with_syn = meteor(refs, hyps, synsets=table)
    assert with_syn > without, (without, with_syn)

    # weights: exact 1.0 > synonym 0.8 > stem 0.6, per candidate pair
    m, _, w, _, _ = _beam_align(["dog"], ["dog"], use_stem=True,
                                stem_weight=0.6, synsets=table)
    assert (m, w) == (1, 1.0)
    m, _, w, _, _ = _beam_align(["canine"], ["dog"], use_stem=True,
                                stem_weight=0.6, synsets=table)
    assert (m, w) == (1, 0.8)
    m, _, w, _, _ = _beam_align(["dogs"], ["dog"], use_stem=True,
                                stem_weight=0.6, synsets=SynsetTable([]))
    assert (m, w) == (1, 0.6)
    # no table => identical to the exact+stem variant
    assert meteor(refs, hyps, synsets=None) == without


def test_meteor_paraphrase_module(tmp_path):
    """Module-4 paraphrase matching (METEOR 1.5, weight 0.6) credits
    phrase-table spans when a table is supplied; spans cover every word of
    both sides and may differ in length."""
    from vqa_tpu.tools.metrics import (ParaphraseTable, _beam_align,
                                       _meteor_single, load_paraphrases,
                                       meteor)
    path = tmp_path / "paraphrase-en"
    path.write_text("# mined phrase pairs\n"
                    "riding a bike ||| on a bicycle\n"
                    "photo ||| picture\n")
    table = load_paraphrases(str(path))
    assert table.paraphrases(("riding", "a", "bike")) == {
        ("on", "a", "bicycle")}
    assert table.paraphrases(("picture",)) == {("photo",)}  # symmetric
    assert table.max_len == 3

    refs = {0: ["a man riding a bike down the street"]}
    hyps = {0: ["a man on a bicycle down the street"]}
    without = meteor(refs, hyps)
    with_para = meteor(refs, hyps, paraphrases=table)
    assert with_para > without, (without, with_para)

    # span coverage: 'riding a bike' (3 words) vs 'on a bicycle' (3 words)
    # at weight 0.6; the stray exact 'a' inside the span must NOT be
    # double-used by the unigram module
    m_h, m_r, w_h, w_r, chunks = _beam_align(
        "on a bicycle".split(), "riding a bike".split(),
        use_stem=False, stem_weight=0.6, paraphrases=table)
    assert (m_h, m_r, chunks) == (3, 3, 1)
    assert abs(w_h - 1.8) < 1e-12 and abs(w_r - 1.8) < 1e-12
    # unequal-length spans: covered word counts differ per side
    t2 = ParaphraseTable([(["sofa"], ["couch"]),
                          (["right", "now"], ["immediately"])])
    m_h, m_r, w_h, w_r, _ = _beam_align(
        "right now".split(), "immediately".split(),
        use_stem=False, stem_weight=0.6, paraphrases=t2)
    assert (m_h, m_r) == (2, 1)
    assert abs(w_h - 1.2) < 1e-12 and abs(w_r - 0.6) < 1e-12
    s = _meteor_single("right now".split(), "immediately".split(),
                       use_stem=False, paraphrases=t2)
    # p = 1.2/2, r = 0.6/1, fmean, penalty over mean matched words 1.5
    p, r = 0.6, 0.6
    want = (p * r / (0.9 * p + 0.1 * r)) * (1 - 0.5 * (1 / 1.5) ** 3)
    assert abs(s - want) < 1e-12, (s, want)
    # exact matching still wins where both apply; no table => unchanged
    assert meteor(refs, hyps, paraphrases=None) == without
    same = {0: hyps[0]}
    assert meteor(same, hyps, paraphrases=table) == meteor(same, hyps)


def test_topk_wide_matches_lax_topk():
    """Two-stage exact top-k == lax.top_k on wide rows (values and, absent
    ties, indices), including non-multiple-of-group widths and the
    narrow-width fallback."""
    from vqa_tpu.ops.topk import topk_wide
    import jax
    rng = np.random.default_rng(3)
    for R, V in ((64, 20000), (7, 8191), (16, 4096)):
        x = jnp.asarray(rng.standard_normal((R, V)).astype(np.float32))
        vals, idx = topk_wide(x, 3)
        wv, wi = jax.lax.top_k(x, 3)
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(wv))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(wi))


def test_topk_maskloop_matches_lax_topk():
    """k sequential argmax+mask sweeps == lax.top_k bit-for-bit, INCLUDING
    tie order (planted duplicate values spanning rows) and bf16 inputs."""
    from vqa_tpu.ops.topk import topk_maskloop
    import jax
    rng = np.random.default_rng(7)
    for dtype in (np.float32, jnp.bfloat16):
        x = jnp.asarray(rng.standard_normal((64, 8192)).astype(np.float32)
                        ).astype(dtype)
        # plant exact ties: same max value at three indices in some rows
        x = x.at[5, [17, 4000, 8000]].set(jnp.asarray(50.0, dtype))
        x = x.at[9, [0, 1]].set(jnp.asarray(50.0, dtype))
        vals, idx = topk_maskloop(x, 3)
        wv, wi = jax.lax.top_k(x, 3)
        np.testing.assert_array_equal(np.asarray(vals.astype(jnp.float32)),
                                      np.asarray(wv.astype(jnp.float32)))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(wi))


def test_beam_approx_topk(setup):
    """approx_topk=True (TPU PartialReduce vocab top-k, recall 0.99) is an
    opt-in serving trade: outputs must be near-identical to the exact path
    (on CPU the fallback lowering is exact, so agreement is 100%; the
    tolerant bound keeps the test valid on TPU where ~1% of per-row
    candidates may swap)."""
    model, params, batch = setup
    vocab = _vocab()
    kw = dict(k=3, c_len=C_LEN, start_id=vocab.start, end_id=vocab.end)
    tokens, scores = make_beam_search(model, **kw)(params, batch)
    tokens_a, scores_a = make_beam_search(
        model, approx_topk=True, **kw)(params, batch)
    assert tokens_a.shape == tokens.shape and scores_a.shape == scores.shape
    agree = (np.asarray(tokens_a) == np.asarray(tokens)).mean()
    assert agree > 0.9, f"approx beams diverged: {agree:.3f} agreement"


def test_beam_fused_vocab_matches_default(setup):
    """fused_vocab=True (Pallas vocab-head kernel: GEMM + running top-k +
    online logsumexp) returns the same beams and scores as the XLA path."""
    model, params, batch = setup
    vocab = _vocab()
    bs = make_beam_search(model, k=3, c_len=C_LEN, start_id=vocab.start,
                          end_id=vocab.end)
    bs_f = make_beam_search(model, k=3, c_len=C_LEN, start_id=vocab.start,
                            end_id=vocab.end, fused_vocab=True)
    tokens, scores = bs(params, batch)
    tokens_f, scores_f = bs_f(params, batch)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(tokens_f))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(scores_f),
                               rtol=1e-4, atol=1e-5)


def test_vocab_topk_kernel_parity():
    """vocab_topk_lse == lax.top_k + logsumexp on the same logits,
    including a ragged last vocab chunk (V % tile_v != 0)."""
    from vqa_tpu.ops.pallas.vocab_topk import vocab_topk_lse
    rng = np.random.default_rng(1)
    R, H, V, k = 64, 32, 1000, 3
    h = jnp.asarray(rng.standard_normal((R, H)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((H, V)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(V).astype(np.float32) * 0.1)
    vals, idx, lse = vocab_topk_lse(h, w, b, k=k, tile_r=32, tile_v=256,
                                    interpret=True)
    logits = h @ w + b
    wv, wi = jax.lax.top_k(logits, k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(wv),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(wi))
    want = jax.scipy.special.logsumexp(logits, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_make_meteor_tables_wordnet(tmp_path):
    """scripts/make_meteor_tables.py synonyms: WNdb data.* files -> the
    one-group-per-line format load_synsets reads (multi-word lemmas
    dropped, (p)-style adjective markers stripped, singleton groups
    omitted)."""
    import sys
    sys.path.insert(0, "scripts")
    try:
        import make_meteor_tables as mmt
    finally:
        sys.path.pop(0)
    wn = tmp_path / "dict"
    wn.mkdir()
    (wn / "data.noun").write_text(
        "  1 This is a WNdb license header line\n"
        "  2 more header\n"
        "02084071 05 n 02 dog 0 domestic_dog 0 001 @ 02083346 n 0000 "
        "| a member of the genus Canis\n"
        "09217230 17 n 03 beach 0 strand 1 shore 0 000 | sandy margin\n"
        "04105893 06 n 01 sofa 0 000 | singleton group, dropped\n")
    (wn / "data.adj").write_text(
        "00001740 00 a 02 able 0 capable(p) 0 000 | marker stripped\n")
    groups = mmt.parse_wordnet_synsets(str(wn))
    assert ["beach", "strand", "shore"] in groups
    assert ["able", "capable"] in groups
    # 'domestic_dog' is multi-word -> the dog synset has 1 word, dropped
    assert not any("dog" in g for g in groups)

    out = tmp_path / "english.synsets"
    rc = mmt.main(["synonyms", "--wordnet_dir", str(wn), "-o", str(out)])
    assert rc == 0
    from vqa_tpu.tools.metrics import load_synsets
    table = load_synsets(str(out))
    assert table.synonyms("beach", "shore")
    assert table.synonyms("able", "capable")
    assert not table.synonyms("beach", "able")


def test_make_meteor_tables_paraphrases(tmp_path):
    """scripts/make_meteor_tables.py paraphrases: the |||-separated
    paraphrase-en(.gz) rows (weighted or not, or tab-separated) -> the
    'a ||| b' format load_paraphrases reads, with min-weight filtering."""
    import gzip
    import sys
    sys.path.insert(0, "scripts")
    try:
        import make_meteor_tables as mmt
    finally:
        sys.path.pop(0)
    src = tmp_path / "paraphrase-en.gz"
    with gzip.open(src, "wt", encoding="utf-8") as f:
        f.write("0.92 ||| riding a bike ||| cycling\n"       # weight first
                "photo ||| picture ||| 0.88\n"                # weight last
                "a couple of ||| two\n"                       # unweighted
                "shore\tcoast\n"                              # tab pair
                "0.01 ||| junk match ||| noise\n"             # filtered
                "same ||| same\n"                             # degenerate
                "# comment\n\n")
    pairs = mmt.parse_paraphrase_table(str(src), min_weight=0.5)
    assert ("riding a bike", "cycling") in pairs
    assert ("photo", "picture") in pairs
    assert ("a couple of", "two") in pairs
    assert ("shore", "coast") in pairs
    assert ("junk match", "noise") not in pairs
    assert ("same", "same") not in pairs

    out = tmp_path / "paraphrase-en.txt"
    rc = mmt.main(["paraphrases", "--paraphrase_file", str(src),
                   "--min_weight", "0.5", "-o", str(out)])
    assert rc == 0
    from vqa_tpu.tools.metrics import load_paraphrases
    table = load_paraphrases(str(out))
    assert table.paraphrases(("cycling",)) == {("riding", "a", "bike")}
    assert table.paraphrases(("coast",)) == {("shore",)}


def test_cap_eval_bundled_tables_all_four_modules(tmp_path, monkeypatch):
    """Out-of-box cap_eval runs all four METEOR 1.5 modules: the bundled
    mini synonym/paraphrase tables load by default ('auto') and move the
    score on captions whose only extra matches are a synset hit
    (man~guy, module 3) and a phrase-table hit (riding a bike~cycling,
    module 4); 'none' disables both, reproducing the exact+stem score.
    Reference counterpart: the jar's bundled corpora,
    /root/reference/cap_eval.py:28."""
    import json
    import cap_eval

    exp = tmp_path / "checkpoint" / "caps"
    exp.mkdir(parents=True)
    (exp / "decode.txt").write_text(
        "<start> a guy is cycling down the street\n"
        "<start> a dog jumps over the fence\n")
    refs = {"data": [
        {"c_word": ["a man is riding a bike down the street"]},
        {"c_word": ["a dog jumping over the fence"]},   # stem-only hit
    ]}
    ref_path = tmp_path / "val2014_captions.json"
    ref_path.write_text(json.dumps(refs))

    monkeypatch.chdir(tmp_path)
    base = ["--load_path", "caps", "--load_ref", str(ref_path)]
    with_tables = cap_eval.main(base)
    plain = cap_eval.main(base + ["--synonym_path", "none",
                                  "--paraphrase_path", "none"])
    assert with_tables["METEOR"] > plain["METEOR"], (with_tables, plain)
    # the bundled tables change METEOR only — n-gram metrics unaffected
    for k in ("Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr"):
        assert with_tables[k] == plain[k]
    # explicit paths still win over 'auto'
    from vqa_tpu.tools.metrics import bundled_table
    assert bundled_table("meteor_synonyms_mini.txt").endswith(
        "meteor_synonyms_mini.txt")
    assert bundled_table("missing_table.txt") == ""
