"""Packed-shard storage for visual features and relation graphs.

The reference reads one tiny ``.npz`` per image per item from inside
DataLoader workers (`/root/reference/dataset.py:93-104`) — ~113 KB random
reads x batch 128, the data-feed hot path (SURVEY.md section 3.1). For TPU
feeding we convert that directory once into contiguous memory-mapped arrays:

- ``<prefix>_features.npy``  [N, num_objs, v_dim]   (float16 by default, or
  int8 with per-box scales in ``<prefix>_scales.npy`` [N, num_objs] float32
  when packed with ``feature_dtype=np.int8`` — on-device dequantization
  halves the host->HBM bytes again vs f16)
- ``<prefix>_bbox.npy``      [N, num_objs, 4]        float32
- ``<prefix>_graphs.npy``    [N, num_objs, num_objs] int8 (optional)
- ``<prefix>_index.json``    {img_file: row}

Batch assembly is then a single vectorized gather from the memmap (the OS
page cache keeps hot shards resident), which sustains device feed without
per-item file opens. ``PackedFeatures.gather`` is the API the loader uses.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, Optional

import numpy as np


def quantize_features(x: np.ndarray):
    """Symmetric per-box int8 quantization: [N, num_objs, v_dim] float ->
    (int8 payload, [N, num_objs] float32 scales). The inverse is the
    device-side ``img_q * img_scale`` dequant in models/encoder.py."""
    x = np.asarray(x, np.float32)
    scales = np.maximum(np.abs(x).max(axis=-1) / 127.0, 1e-8)
    q = np.clip(np.rint(x / scales[..., None]), -127, 127).astype(np.int8)
    return q, scales.astype(np.float32)


class PackedFeatures:
    """Memory-mapped packed feature store with O(1) per-image row lookup."""

    def __init__(self, prefix: str):
        with open(prefix + "_index.json") as f:
            self.index: Dict[str, int] = json.load(f)
        self.features = np.load(prefix + "_features.npy", mmap_mode="r")
        bbox_path = prefix + "_bbox.npy"
        self.bbox = np.load(bbox_path, mmap_mode="r") if os.path.exists(bbox_path) else None
        graph_path = prefix + "_graphs.npy"
        self.graphs = np.load(graph_path, mmap_mode="r") if os.path.exists(graph_path) else None
        scales_path = prefix + "_scales.npy"
        self.scales = np.load(scales_path, mmap_mode="r") if os.path.exists(scales_path) else None

    def row(self, img_file: str) -> int:
        return self.index[img_file]

    def gather(self, rows: np.ndarray, dtype=np.float32) -> np.ndarray:
        """[batch] row ids -> [batch, num_objs, v_dim] features.

        Uses the threaded native gather (+f16 widening) when the C++ library
        is available (vqa_tpu/native.py), numpy fancy-indexing otherwise.
        int8-packed stores dequantize here unless the caller asks for the
        raw quantized payload via ``gather_quantized``.
        """
        from vqa_tpu import native
        if self.features.dtype == np.int8:
            q, scales = self.gather_quantized(rows)
            return (q.astype(np.float32)
                    * scales[..., None].astype(np.float32)).astype(dtype)
        out = native.gather_rows(self.features, np.asarray(rows),
                                 widen_f16=(dtype == np.float32))
        return out if out.dtype == dtype else out.astype(dtype)

    def gather_quantized(self, rows: np.ndarray):
        """int8 payload + per-box scales (device-side dequant path).

        int8-packed stores gather the stored payload directly; f16/f32
        stores quantize the gathered batch on the host (still saves 2-4x
        host->HBM bytes — the win the --feature_dtype int8 feed buys)."""
        from vqa_tpu import native
        rows = np.asarray(rows)
        if self.features.dtype == np.int8:
            assert self.scales is not None, "int8 store missing scales"
            q = native.gather_rows(self.features, rows, widen_f16=False)
            return q, np.asarray(self.scales[rows], np.float32)
        out = native.gather_rows(self.features, rows, widen_f16=True)
        return quantize_features(out)

    def gather_graphs(self, rows: np.ndarray) -> np.ndarray:
        assert self.graphs is not None, "no packed graphs at this prefix"
        from vqa_tpu import native
        return native.gather_rows(self.graphs, np.asarray(rows),
                                  widen_f16=False)


def pack_feature_dir(feature_dir: str, out_prefix: str,
                     files: Optional[Iterable[str]] = None,
                     feature_dtype=np.float16,
                     graph_dir: Optional[str] = None) -> PackedFeatures:
    """Convert a directory of per-image ``.npz`` (keys ``x`` [N, v_dim],
    ``bbox`` [N, 4] — the reference contract, dataset.py:94-98) into packed
    shards. Optionally packs matching relation-graph npz (key ``graph``)."""
    names = sorted(files) if files is not None else sorted(
        f for f in os.listdir(feature_dir) if f.endswith(".npz"))
    assert names, f"no npz files in {feature_dir}"
    first = np.load(os.path.join(feature_dir, names[0]))
    num_objs, v_dim = first["x"].shape
    has_bbox = "bbox" in first

    quantize = np.dtype(feature_dtype) == np.int8
    feats = np.lib.format.open_memmap(
        out_prefix + "_features.npy", mode="w+", dtype=feature_dtype,
        shape=(len(names), num_objs, v_dim))
    scales = np.lib.format.open_memmap(
        out_prefix + "_scales.npy", mode="w+", dtype=np.float32,
        shape=(len(names), num_objs)) if quantize else None
    bbox = np.lib.format.open_memmap(
        out_prefix + "_bbox.npy", mode="w+", dtype=np.float32,
        shape=(len(names), num_objs, 4)) if has_bbox else None
    graphs = np.lib.format.open_memmap(
        out_prefix + "_graphs.npy", mode="w+", dtype=np.int8,
        shape=(len(names), num_objs, num_objs)) if graph_dir else None

    index = {}
    for i, name in enumerate(names):
        z = np.load(os.path.join(feature_dir, name))
        if quantize:
            feats[i], scales[i] = quantize_features(z["x"])
        else:
            feats[i] = z["x"].astype(feature_dtype)
        if bbox is not None:
            bbox[i] = z["bbox"]
        if graphs is not None:
            graphs[i] = np.load(os.path.join(graph_dir, name))["graph"]
        index[name] = i
    feats.flush()
    if scales is not None:
        scales.flush()
    if bbox is not None:
        bbox.flush()
    if graphs is not None:
        graphs.flush()
    with open(out_prefix + "_index.json", "w") as f:
        json.dump(index, f)
    return PackedFeatures(out_prefix)
