"""Data-layer tests: tokenizer parity, relation graphs, datasets, loader, shards."""

import os

import numpy as np
import pytest

from vqa_tpu.data.tokenizer import Vocab, get_tokens, padding, soft_answer_scores
from vqa_tpu.data.relation import (
    spatial_relation, relation_graph, relation_graphs_batched,
)
from vqa_tpu.data.dataset import set_dataset
from vqa_tpu.data.loader import Loader
from vqa_tpu.data.shards import pack_feature_dir
from vqa_tpu.data.synthetic import make_synthetic_root
import jax.numpy as jnp


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    path = tmp_path_factory.mktemp("synth")
    return make_synthetic_root(str(path))


# ---------------------------------------------------------------- tokenizer

def _vocab():
    return Vocab(["what", "is", "the", "dog", "'s", "color", "a", "red",
                  "<oov>", "<start>", "<end>", "<pad>"])


def test_tokenizer_matches_reference_rules():
    v = _vocab()
    # lowercase, strip .,? , split 's  (preprocessing.py:102-120)
    words, toks = get_tokens("What is the Dog's color?", v)
    assert words == "what is the dog 's color"
    assert toks == [0, 1, 2, 3, 4, 5]
    # oov mapping
    _, toks = get_tokens("what banana", v)
    assert toks == [0, v.oov]
    # captions get <start>/<end> inserted
    words, toks = get_tokens("a red dog.", v, is_cap=True)
    assert words == "<start> a red dog <end>"
    assert toks == [v.start, 6, 7, 3, v.end]
    # quote handling: " a'" -> boundary quotes stripped
    words, _ = get_tokens('he said "red dog" loudly', v)
    assert '"' not in words


def test_padding_semantics():
    v = _vocab()
    toks, l = padding([1, 2, 3], 5, v.pad)
    assert toks == [1, 2, 3, v.pad, v.pad] and l == 3
    toks, l = padding([1, 2, 3, 4, 5, 6], 5, v.pad)
    assert toks == [1, 2, 3, 4, 5] and l == 5


def test_soft_answer_scores():
    out = soft_answer_scores({"2": 5, "0": 1}, 4)
    np.testing.assert_allclose(out, [1 / 3, 0, 1.0, 0])  # min(count,3)/3


# ---------------------------------------------------------------- relations

def test_spatial_relation_golden():
    w, h = 100, 100
    big = [0, 0, 50, 50]
    small = [10, 10, 20, 20]
    assert spatial_relation(big, small, w, h) == (1, 2)   # contains
    assert spatial_relation(small, big, w, h) == (2, 1)   # covered
    a, b = [0, 0, 10, 10], [1, 1, 11, 11]                 # IoU ~0.68
    assert spatial_relation(a, b, w, h) == (3, 3)
    # pure +x displacement: d=(dx,0), delta = atan2(dx,0)-90 = 0 -> bucket 3+ceil(0)=3
    a, b = [0, 0, 10, 10], [30, 0, 40, 10]
    lab = spatial_relation(a, b, w, h)
    assert lab[0] >= 3 and lab[1] >= 3
    # far apart -> no relation
    assert spatial_relation([0, 0, 5, 5], [90, 90, 99, 99], w, h) == (0, 0)


def test_relation_graph_antisymmetric_pairs():
    rng = np.random.default_rng(0)
    xy = rng.random((8, 2)) * 200
    wh = rng.random((8, 2)) * 80 + 5
    bbox = np.concatenate([xy, xy + wh], axis=1)
    g = relation_graph(bbox, 320, 240)
    assert g.shape == (8, 8)
    assert np.all(np.diag(g) == 0)
    # angle buckets are antisymmetric: labels >=4 pair as (k, ((k-4+4)%8)+4)
    for i in range(8):
        for j in range(i + 1, 8):
            a, b = g[i, j], g[j, i]
            if a >= 4:
                assert b == ((a - 4 + 4) % 8) + 4


def test_batched_graphs_match_scalar_port():
    rng = np.random.default_rng(1)
    B, N = 4, 7
    xy = rng.random((B, N, 2)) * 300
    wh = rng.random((B, N, 2)) * 120 + 5
    bbox = np.concatenate([xy, xy + wh], axis=2)
    w = np.full(B, 640.0)
    h = np.full(B, 480.0)
    got = relation_graphs_batched(bbox, w, h)
    for b in range(B):
        want = relation_graph(bbox[b], w[b], h[b])
        np.testing.assert_array_equal(got[b], want.astype(np.int8))


def test_build_graphs_uses_real_image_sizes(tmp_path):
    """build_graphs with a COCO-sizes map reproduces relation_graph at the
    TRUE image w/h (the dist <= 0.5*diag threshold depends on them,
    reference util/relation.py:36-38) — and differs from the bbox-extent
    proxy when boxes cover only part of the image."""
    import json
    from preprocessing import build_graphs, load_image_sizes

    rng = np.random.default_rng(7)
    N = 9
    xy = rng.random((N, 2)) * 150            # boxes only span ~150px
    wh = rng.random((N, 2)) * 40 + 5
    bbox = np.concatenate([xy, xy + wh], axis=1)
    feat = tmp_path / "feat"
    feat.mkdir()
    np.savez(feat / "COCO_train2014_000000000042.npz",
             x=np.zeros((N, 4), np.float32), bbox=bbox)
    coco = {"images": [{"id": 42, "width": 640, "height": 480}]}
    coco_json = tmp_path / "captions_train2014.json"
    coco_json.write_text(json.dumps(coco))

    out = tmp_path / "graphs"
    build_graphs(str(feat), str(out),
                 image_sizes=load_image_sizes(str(coco_json)))
    got = np.load(out / "COCO_train2014_000000000042.npz")["graph"]
    want = relation_graph(bbox, 640.0, 480.0)
    np.testing.assert_array_equal(got, want.astype(np.float64))
    # the proxy (bbox extent ~150x190) would produce a different graph here
    proxy = relation_graph(bbox, bbox[:, 2].max(), bbox[:, 3].max())
    assert not np.array_equal(want, proxy)


# ---------------------------------------------------------------- datasets

def _ds(root, dataset_type, graph=False):
    return set_dataset(
        load_path=root["annot"],
        feature_path=root["feature_root"],
        ans_dim=root["ans_dim"],
        caption_id_path=root["select_path"],
        graph_path=root["graph_root"] if graph else "",
        is_train=True,
        dataset_type=dataset_type,
    )


def test_vqa_dataset_batch(root):
    ds = _ds(root, "vqa")
    batch = ds.get_batch([0, 1, 2])
    assert batch["img"].shape == (3, root["num_objs"], root["v_dim"])
    assert batch["q"].shape == (3, root["q_len"])
    assert batch["a"].shape == (3, root["ans_dim"])
    assert batch["a"].max() <= 1.0


def test_vqa_dataset_with_graph(root):
    ds = _ds(root, "vqa", graph=True)
    batch = ds.get_batch([0, 1])
    assert batch["graph"].shape == (2, root["num_objs"], root["num_objs"])


def test_vqae_dataset(root):
    ds = _ds(root, "vqa-e")
    batch = ds.get_batch([0, 5])
    assert batch["c"].shape == (2, root["c_len"])
    assert np.all(batch["cap_len"] >= 2)


def test_all_captions_dataset_index_arithmetic(root):
    ds = _ds(root, "all")
    n = len(ds.questions)
    assert len(ds) == 5 * n
    # index n+3 -> question 3, caption 1 (dataset.py:159)
    b1 = ds.get_batch([n + 3])
    b2 = ds.get_batch([3])
    np.testing.assert_array_equal(b1["q"], b2["q"])


def test_select_dataset(root):
    ds = _ds(root, "select")
    assert len(ds) == len(ds.questions)
    batch = ds.get_batch([0, 1])
    assert batch["c"].shape == (2, root["c_len"])


# ---------------------------------------------------------------- loader

def test_loader_fixed_shapes_and_tail(root):
    ds = _ds(root, "vqa")
    loader = Loader(ds, batch_size=5, shuffle=True, seed=7)
    batches = list(loader)
    assert len(batches) == (len(ds) + 4) // 5
    for b in batches:
        assert b["img"].shape[0] == 5  # fixed shape incl. tail
    assert batches[-1]["nvalid"] == len(ds) - 5 * (len(batches) - 1)
    total = sum(int(b["nvalid"]) for b in batches)
    assert total == len(ds)


def test_loader_abandoned_prefetch_iterator_stops_producer(root):
    """Breaking out of (or GC-ing) a prefetching iterator must shut the
    producer thread down — otherwise every abandoned iterator leaks a
    thread blocked on q.put pinning prefetch+1 assembled batches."""
    import threading
    import time

    ds = _ds(root, "vqa")
    before = threading.active_count()
    it = iter(Loader(ds, 4, shuffle=True, seed=7, prefetch=2))
    next(it)                       # producer running, queue filling
    assert threading.active_count() > before
    it.close()                     # GeneratorExit -> finally -> stop flag
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() == before, "producer thread leaked"
    # and a fully-consumed iterator still terminates cleanly
    assert sum(int(b["nvalid"])
               for b in Loader(ds, 4, prefetch=2)) == len(ds)


def test_loader_shuffle_determinism(root):
    ds = _ds(root, "vqa")
    ids1 = [b["id"].tolist() for b in Loader(ds, 4, shuffle=True, seed=3)]
    ids2 = [b["id"].tolist() for b in Loader(ds, 4, shuffle=True, seed=3)]
    ids3 = [b["id"].tolist() for b in Loader(ds, 4, shuffle=True, seed=4)]
    assert ids1 == ids2
    assert ids1 != ids3


# ---------------------------------------------------------------- shards

def test_packed_shards_match_npz(root, tmp_path):
    feat_dir = os.path.join(root["feature_root"], root["split"])
    graph_dir = os.path.join(root["graph_root"], root["split"])
    prefix = str(tmp_path / root["split"])
    packed = pack_feature_dir(feat_dir, prefix, graph_dir=graph_dir,
                              feature_dtype=np.float32)
    name = sorted(os.listdir(feat_dir))[0]
    want = np.load(os.path.join(feat_dir, name))["x"]
    got = packed.gather(np.asarray([packed.row(name)]))[0]
    np.testing.assert_allclose(got, want, rtol=1e-6)
    want_g = np.load(os.path.join(graph_dir, name))["graph"]
    got_g = packed.gather_graphs(np.asarray([packed.row(name)]))[0]
    np.testing.assert_array_equal(got_g, want_g.astype(np.int8))


def test_dataset_uses_packed_backend(root, tmp_path):
    feat_dir = os.path.join(root["feature_root"], root["split"])
    prefix = str(tmp_path / root["split"])
    pack_feature_dir(feat_dir, prefix, feature_dtype=np.float32)
    ds_npz = _ds(root, "vqa")
    ds_packed = set_dataset(
        load_path=root["annot"], feature_path=str(tmp_path),
        ans_dim=root["ans_dim"], is_train=True, dataset_type="vqa")
    b1 = ds_npz.get_batch([0, 3])
    b2 = ds_packed.get_batch([0, 3])
    np.testing.assert_allclose(b1["img"], b2["img"], rtol=1e-6)
    np.testing.assert_array_equal(b1["q"], b2["q"])


def test_grain_loader_adapter(root):
    pytest.importorskip("grain")
    from vqa_tpu.data.grain_loader import make_grain_loader
    ds = _ds(root, "vqa")
    loader = make_grain_loader(ds, batch_size=8, shuffle=True, seed=3,
                               drop_remainder=True)
    batches = list(loader)
    assert len(batches) == len(ds) // 8
    b = batches[0]
    assert b["img"].shape == (8, root["num_objs"], root["v_dim"])
    assert b["a"].shape == (8, root["ans_dim"])
    assert int(b["nvalid"]) == 8


def test_grain_loader_pads_tail_like_loader(root):
    """Loader protocol parity: the tail batch is padded to batch_size by
    repeating row 0 and carries nvalid (loader.py _batches semantics), so
    the Grain adapter is drop-in for the jitted fixed-shape steps."""
    pytest.importorskip("grain")
    from vqa_tpu.data.grain_loader import make_grain_loader
    ds = _ds(root, "vqa")
    bs = 7
    assert len(ds) % bs != 0, "fixture must leave a tail batch"
    batches = list(make_grain_loader(ds, batch_size=bs, shuffle=False))
    assert len(batches) == -(-len(ds) // bs)
    full, tail = batches[0], batches[-1]
    n_tail = len(ds) % bs
    for b in batches:
        assert b["img"].shape == (bs, root["num_objs"], root["v_dim"])
    assert int(full["nvalid"]) == bs
    assert int(tail["nvalid"]) == n_tail
    # padded rows repeat row 0 of the tail
    for k in ("img", "q", "a"):
        pad = np.asarray(tail[k][n_tail:])
        np.testing.assert_array_equal(
            pad, np.repeat(np.asarray(tail[k][:1]), bs - n_tail, axis=0))


def test_int8_quantized_shards(root, tmp_path):
    feat_dir = os.path.join(root["feature_root"], root["split"])
    prefix = str(tmp_path / "q8")
    packed = pack_feature_dir(feat_dir, prefix, feature_dtype=np.int8)
    name = sorted(os.listdir(feat_dir))[0]
    want = np.load(os.path.join(feat_dir, name))["x"]
    row = np.asarray([packed.row(name)])
    # dequantized gather approximates the original within quant error
    got = packed.gather(row)[0]
    scale = np.abs(want).max(axis=1) / 127.0
    assert np.abs(got - want).max() <= scale.max() * 0.51 + 1e-6
    # raw payload path
    q, s = packed.gather_quantized(row)
    assert q.dtype == np.int8 and s.shape == (1, want.shape[0])
    np.testing.assert_allclose(q[0].astype(np.float32) * s[0][:, None], got,
                               rtol=1e-6)


def test_int8_feed_end_to_end(root):
    """--feature_dtype int8 path: the loader emits quantized img_q/img_scale
    batches (no host-side dequant) and the model's on-device dequant forward
    matches the f32 feed within quantization error (VERDICT r1 item 4)."""
    import jax
    from vqa_tpu.models.wrapper import set_model

    ds32 = _ds(root, "vqa")
    ds8 = set_dataset(
        load_path=root["annot"], feature_path=root["feature_root"],
        ans_dim=root["ans_dim"], caption_id_path=root["select_path"],
        is_train=True, dataset_type="vqa", feature_mode="int8")

    b32 = next(iter(Loader(ds32, 4, shuffle=False)))
    b8 = next(iter(Loader(ds8, 4, shuffle=False)))
    assert "img" not in b8 and b8["img_q"].dtype == np.int8
    assert b8["img_scale"].shape == b8["img_q"].shape[:2]
    # the quantized feed moves ~4x fewer feature bytes than f32
    assert b8["img_q"].nbytes + b8["img_scale"].nbytes < b32["img"].nbytes / 3

    model = set_model(encoder_type="base", predictor_type="base",
                      decoder_type="none", ntoken=40, v_dim=root["v_dim"],
                      embed_dim=8, hidden_dim=12, decoder_hidden_dim=8,
                      ans_dim=root["ans_dim"], c_len=8, dropout=0.0)
    feed32 = {"img": jnp.asarray(b32["img"]), "q": jnp.asarray(b32["q"])}
    feed8 = {"img_q": jnp.asarray(b8["img_q"]),
             "img_scale": jnp.asarray(b8["img_scale"]),
             "q": jnp.asarray(b8["q"])}
    params = model.init(jax.random.key(0), feed32)
    out32, _ = model.apply(params, feed32)
    out8, _ = model.apply(params, feed8)
    # int8 symmetric quant error on the features propagates mildly
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out32),
                               rtol=0.1, atol=0.05)


def test_int8_feed_from_packed_shards(root, tmp_path):
    """feature_mode='int8' over an int8-packed store gathers the stored
    payload directly (no host quantization work)."""
    feat_dir = os.path.join(root["feature_root"], root["split"])
    prefix = str(tmp_path / "pk" / root["split"])
    os.makedirs(tmp_path / "pk")
    pack_feature_dir(feat_dir, prefix, feature_dtype=np.int8)
    ds = set_dataset(
        load_path=root["annot"], feature_path=str(tmp_path / "pk"),
        ans_dim=root["ans_dim"], caption_id_path=root["select_path"],
        is_train=True, dataset_type="vqa", feature_mode="int8")
    batch = ds.get_batch([0, 1, 2])
    assert batch["img_q"].dtype == np.int8
    assert batch["img_scale"].dtype == np.float32


# ------------------------------------------------------- length bucketing

def test_loader_length_bucketing(root):
    """--length_bucket: full coverage, per-batch caption axis truncated to
    its bucket bound, every sample's cap_len <= the batch's bound."""
    ds = _ds(root, "vqa-e")
    bounds = (4, 6, root["c_len"])
    loader = Loader(ds, batch_size=4, shuffle=True, seed=7,
                    length_bucket=True, bucket_bounds=bounds)
    batches = list(loader)
    assert len(batches) == len(loader)
    seen = []
    for b in batches:
        t = b["c"].shape[1]
        # bound + 1: one padded position survives (max-pool zero sentinel)
        assert t in [min(bd + 1, root["c_len"]) for bd in bounds]
        n = int(b["nvalid"])
        assert np.all(b["cap_len"][:n]
                      <= (t if t == root["c_len"] else t - 1))
        seen.extend(b["id"][:n].tolist())
    assert sorted(seen) == list(range(len(ds)))


def test_loader_bucketing_covers_longest_caption(root):
    """Bounds that don't reach the longest caption must be extended, not
    silently truncate real tokens into the last bucket (the CLI appends
    c_len as a guard; the library enforces it for direct users)."""
    ds = _ds(root, "vqa-e")
    max_len = int(np.max(np.asarray(ds.cap_lens)))
    assert max_len > 4  # the synthetic split has captions beyond the bound
    loader = Loader(ds, batch_size=4, shuffle=False,
                    length_bucket=True, bucket_bounds=(4,))
    assert loader.bucket_bounds[-1] >= max_len
    for b in loader:
        n = int(b["nvalid"])
        t = b["c"].shape[1]
        # no real token lost: every row's cap_len fits its batch's axis
        assert np.all(b["cap_len"][:n]
                      <= (t if t == root["c_len"] else t - 1))


def test_split_microbatches_passes_scalar_bookkeeping():
    """Raw Loader batches (with the scalar nvalid) split directly —
    scalars replicate into every microbatch."""
    from vqa_tpu.parallel.pipeline import split_microbatches

    batch = {"img": np.arange(8 * 3).reshape(8, 3),
             "nvalid": np.int32(7)}
    micro = split_microbatches(batch, 4)
    assert len(micro) == 4
    for i, m in enumerate(micro):
        assert m["img"].shape == (2, 3)
        assert int(m["nvalid"]) == 7
    np.testing.assert_array_equal(
        np.concatenate([m["img"] for m in micro]), batch["img"])


def test_loader_bucketing_deterministic(root):
    ds = _ds(root, "vqa-e")
    kw = dict(batch_size=4, shuffle=True, length_bucket=True,
              bucket_bounds=(4, 6, root["c_len"]))
    a = [b["id"].tolist() for b in Loader(ds, seed=3, **kw)]
    b = [b["id"].tolist() for b in Loader(ds, seed=3, **kw)]
    assert a == b
