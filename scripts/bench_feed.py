"""Host-feed benchmark: what questions/s can the PRODUCTION data path feed?

VERDICT r4 missing #4. bench.py measures chip compute with on-device
synthetic staging (correctly — the harness relay tunnel is ~130 MB/s and
would benchmark itself), so nothing on record said what the *host side*
of the production feed can actually sustain. This script measures it, on
this container's CPU, end to end through the shipping path:

  packed shards (data/shards.py memmap stores)
    -> native gather_rows (native/vqa_native.cpp threaded gather/widen)
    -> dataset batch assembly (questions, native answer densify)
    -> Loader (data/loader.py, fixed shapes, background prefetch)

at PRODUCTION dims (36 objs x 2048 features, 3129 answers, q_len 10) over
a synthetic corpus, for the three feed economies the CLI ships:

  int8   int8 store -> img_q int8 payload + f32 scales  (~74 KB/question)
  f16    f16 store, raw f16 gather (the bf16-compute feed: bf16 and f16
         are the same bytes/question; the device casts)  (~148 KB/q)
  f32    f16 store widened to f32 by the native gather   (~295 KB/q)

Replaces the reference's per-item npz reads from DataLoader workers
(`/root/reference/dataset.py:93-104` — ~113 KB random file reads per
question). Page cache is warmed first (a production host's store is
resident after the first epoch; val2014 int8 is ~3 GB).

Results + the feed-vs-compute economics table live in PERF.md
"Feed economics". Pure host benchmark: no JAX, no device, no relay.

Usage:
  PYTHONPATH=/root/repo python scripts/bench_feed.py \
      [--images 512] [--questions 16384] [--batches 512 16384] [--secs 6]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np

from vqa_tpu.data.dataset import set_dataset
from vqa_tpu.data.loader import Loader
from vqa_tpu.data.shards import pack_feature_dir
from vqa_tpu.data.synthetic import make_synthetic_root

NUM_OBJS, V_DIM, ANS_DIM, Q_LEN = 36, 2048, 3129, 10


def bytes_per_question(feed: str) -> int:
    """Host bytes assembled per question for each feed economy."""
    feat = NUM_OBJS * V_DIM
    per = {"int8": feat * 1 + NUM_OBJS * 4,   # int8 payload + f32 scales
           "f16": feat * 2,
           "f32": feat * 4}[feed]
    return per + Q_LEN * 4 + ANS_DIM * 4      # + q tokens + dense answers


def time_loader(loader, feed: str, secs: float, min_batches: int = 5
                ) -> dict:
    """Per-batch timings for ~secs (>= min_batches); report the MEDIAN
    rate — this container suffers multi-second CPU-steal stalls (observed
    6-7 s freezes on a 0.35 s memcpy), so a mean would benchmark the
    hypervisor. p90 is reported alongside for honesty."""
    times = []
    it = iter(loader)
    start = time.perf_counter()
    while time.perf_counter() - start < secs or len(times) < min_batches:
        t0 = time.perf_counter()
        try:
            next(it)
        except StopIteration:
            it = iter(loader)
            continue
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    p90 = float(np.percentile(times, 90))
    qps = loader.batch_size / med
    return {"feed": feed, "batch": loader.batch_size,
            "prefetch": loader.prefetch, "batches": len(times),
            "questions_per_s": round(qps),
            "questions_per_s_p90": round(loader.batch_size / p90),
            "feed_GBps": round(qps * bytes_per_question(feed) / 1e9, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--questions", type=int, default=16384)
    ap.add_argument("--batches", type=int, nargs="+", default=[512, 16384])
    ap.add_argument("--secs", type=float, default=6.0,
                    help="wall clock per (feed, batch, prefetch) cell")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as root:
        print(f"generating synthetic corpus: {args.images} images x "
              f"[{NUM_OBJS}, {V_DIM}], {args.questions} questions, "
              f"{ANS_DIM} answers ...", flush=True)
        paths = make_synthetic_root(
            root, num_images=args.images, num_questions=args.questions,
            num_objs=NUM_OBJS, v_dim=V_DIM, num_answers=ANS_DIM,
            q_len=Q_LEN, seed=11)
        feat_dir = os.path.join(paths["feature_root"], "train2014")
        # pack once per store dtype (the one-time preprocessing step)
        t0 = time.perf_counter()
        pack_feature_dir(feat_dir, feat_dir + "_i8", feature_dtype=np.int8)
        t_i8 = time.perf_counter() - t0
        t0 = time.perf_counter()
        pack_feature_dir(feat_dir, feat_dir + "_f16",
                         feature_dtype=np.float16)
        t_f16 = time.perf_counter() - t0
        print(f"packed stores: int8 {t_i8:.1f}s, f16 {t_f16:.1f}s "
              f"({args.images} images)", flush=True)

        def dataset(feed):
            prefix, mode = {"int8": ("_i8", "int8"),
                            "f16": ("_f16", "f16"),
                            "f32": ("_f16", "float32")}[feed]
            ds = set_dataset(load_path=paths["annot"],
                             feature_path=paths["feature_root"],
                             ans_dim=ANS_DIM, dataset_type="vqa",
                             is_train=True, feature_mode=mode)
            # point the packed backend at the right store
            from vqa_tpu.data.dataset import _PackedBackend
            ds.backend = _PackedBackend(feat_dir + prefix)
            if feed == "f16":
                # raw f16 gather (no widen): bf16-compute feed economics
                gather = ds.backend.packed.gather
                ds.backend.packed.gather = (
                    lambda rows, dtype=np.float16: gather(rows, np.float16))
            return ds

        results = []
        for feed in ("int8", "f16", "f32"):
            ds = dataset(feed)
            for batch in args.batches:
                for prefetch in (0, 2):
                    loader = Loader(ds, batch, shuffle=True, seed=3,
                                    prefetch=prefetch)
                    for b in loader:   # warm page cache + code paths
                        break
                    r = time_loader(loader, feed, args.secs)
                    results.append(r)
                    print(json.dumps(r), flush=True)

    best = {}
    for r in results:
        key = r["feed"]
        if key not in best or r["questions_per_s"] > best[key][
                "questions_per_s"]:
            best[key] = r
    print(json.dumps({"best_per_feed": best}, indent=2))


if __name__ == "__main__":
    main()
