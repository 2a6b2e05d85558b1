"""Dataset variants over the preprocessed VQA v2 + COCO Captions artifacts.

TPU-native equivalent of `/root/reference/dataset.py`. Same on-disk JSON
contracts (``{split}_questions.json`` / ``_answers.json`` / ``_captions.json``
/ ``_all_captions.json``; per-image ``.npz`` features with key ``x`` and
graphs with key ``graph``) plus an optional packed-shard fast path
(vqa_tpu/data/shards.py) that replaces per-item npz reads with vectorized
memmap gathers.

Four variants, keyed exactly like the reference (dataset.py:34-39):
- ``vqa``    VQADataset          (q, a, img[, graph])
- ``vqa-e``  VQAEDataset         (+ 1 explanation caption per QA)
- ``all``    VQACaptionAllDataset (5x size: every COCO caption)
- ``select`` VQACaptionDataset   (1 caption per QA via a selection pickle)

Unlike torch Datasets, these expose *batched* fetch: ``get_batch(indices)``
returns a dict of stacked fixed-shape numpy arrays ready for device_put —
batch assembly is vectorized instead of per-item ``__getitem__`` + collate.
A per-item ``__getitem__`` is kept for parity/debugging.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, Sequence

import numpy as np

from vqa_tpu.data.shards import PackedFeatures


def _load_json_data(path: str):
    with open(path) as f:
        return json.load(f)["data"]


class _NpzFeatures:
    """Per-image npz backend (the reference's layout, dataset.py:93-104)."""

    def __init__(self, feature_dir: str, graph_dir: str = ""):
        self.feature_dir = feature_dir
        self.graph_dir = graph_dir

    def batch(self, img_files: Sequence[str], want_graph: bool,
              quantized: bool = False):
        feats, graphs = [], []
        for name in img_files:
            feats.append(np.load(os.path.join(self.feature_dir, name))["x"])
            if want_graph:
                graphs.append(np.load(os.path.join(self.graph_dir, name))["graph"])
        stacked = np.asarray(np.stack(feats), dtype=np.float32)
        if quantized:
            from vqa_tpu.data.shards import quantize_features
            q, scales = quantize_features(stacked)
            out = {"img_q": q, "img_scale": scales}
        else:
            out = {"img": stacked}
        if want_graph:
            out["graph"] = np.stack(graphs).astype(np.int32)
        return out


class _PackedBackend:
    """Packed-shard backend: one vectorized gather per batch."""

    def __init__(self, prefix: str):
        self.packed = PackedFeatures(prefix)

    def batch(self, img_files: Sequence[str], want_graph: bool,
              quantized: bool = False):
        rows = np.asarray([self.packed.row(f) for f in img_files])
        if quantized:
            q, scales = self.packed.gather_quantized(rows)
            out = {"img_q": q, "img_scale": scales}
        else:
            out = {"img": self.packed.gather(rows)}
        if want_graph:
            out["graph"] = self.packed.gather_graphs(rows).astype(np.int32)
        return out


def _make_backend(feature_path: str, graph_path: str):
    if os.path.exists(feature_path + "_index.json"):
        return _PackedBackend(feature_path)
    return _NpzFeatures(feature_path, graph_path)


class VQADataset:
    """VQA questions + soft-score answers + image features (dataset.py:50-107)."""

    def __init__(self,
                 load_path: str,
                 feature_path: str,
                 dataset_name: str,
                 ans_dim: int,
                 graph_path: str = "",
                 caption_id_path: str = "",
                 feature_mode: str = "float32"):
        self.questions = _load_json_data(f"{load_path}_questions.json")
        self.answers = _load_json_data(f"{load_path}_answers.json")
        self.ans_dim = ans_dim
        self.use_graph = graph_path != ""
        self.backend = _make_backend(feature_path, graph_path)
        self.dataset_name = dataset_name
        # 'int8' feeds quantized img_q/img_scale batches for the on-device
        # dequant path (models/encoder.py _visual_input) — 4x fewer
        # host->HBM feature bytes than f32
        self.feature_mode = feature_mode
        # cache question tokens as one dense array (vectorized batching)
        self.q_tokens = np.asarray([q["q"] for q in self.questions], np.int32)
        self.img_files = [q["img_file"] for q in self.questions]

    def __len__(self) -> int:
        return len(self.questions)

    # -- answers ----------------------------------------------------------
    def load_answers(self, indices: Sequence[int]) -> np.ndarray:
        """Dense soft scores min(count,3)/3 (dataset.py:85-90), batched.

        Scatter runs in the native library when available."""
        from vqa_tpu import native
        dicts = [self.answers[i] for i in indices]
        out = native.densify_answers_native(dicts, self.ans_dim)
        if out is not None:
            return out
        from vqa_tpu.data.tokenizer import soft_answer_scores
        return np.asarray([soft_answer_scores(d, self.ans_dim)
                           for d in dicts], np.float32)

    # -- batched fetch -----------------------------------------------------
    def _vqa_batch(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        files = [self.img_files[i] for i in indices]
        out = self.backend.batch(files, self.use_graph,
                                 quantized=self.feature_mode == "int8")
        out["id"] = np.asarray(indices, np.int32)
        out["q"] = self.q_tokens[np.asarray(indices)]
        out["a"] = self.load_answers(indices)
        return out

    def get_batch(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        return self._vqa_batch(indices)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        return {k: v[0] for k, v in self.get_batch([index]).items()}


class VQAEDataset(VQADataset):
    """VQA-E: one explanation caption per QA pair (dataset.py:110-128)."""

    def __init__(self, load_path, feature_path, dataset_name, ans_dim,
                 graph_path="", caption_id_path="", feature_mode="float32"):
        super().__init__(load_path, feature_path, dataset_name, ans_dim,
                         graph_path, feature_mode=feature_mode)
        caps = _load_json_data(f"{load_path}_captions.json")
        self.c_tokens = np.asarray([c["c"] for c in caps], np.int32)
        self.cap_lens = np.asarray([c["cap_len"] for c in caps], np.int32)

    def get_batch(self, indices):
        out = self._vqa_batch(indices)
        idx = np.asarray(indices)
        out["c"] = self.c_tokens[idx]
        out["cap_len"] = self.cap_lens[idx]
        return out


class VQACaptionAllDataset(VQADataset):
    """All 5 COCO captions per question: 5x dataset size (dataset.py:130-164).

    Index arithmetic matches the reference exactly:
    ``vqa_index = i % len(questions)``, ``cap_index = i // len(questions)``.
    """

    def __init__(self, load_path, feature_path, dataset_name, ans_dim,
                 graph_path="", caption_id_path="", feature_mode="float32"):
        super().__init__(load_path, feature_path, dataset_name, ans_dim,
                         graph_path, feature_mode=feature_mode)
        with open(f"{load_path}_all_captions.json") as f:
            self.captions = json.load(f)
        self.img_ids = [str(int(f[-16:-4])) for f in self.img_files]

    def __len__(self):
        return 5 * len(self.questions)

    def _caption_for(self, vqa_index: int, cap_index: int):
        entry = self.captions[self.img_ids[vqa_index]]
        return entry["c"][cap_index], entry["cap_len"][cap_index]

    def get_batch(self, indices):
        n = len(self.questions)
        vqa_idx = [i % n for i in indices]
        cap_idx = [i // n for i in indices]
        out = self._vqa_batch(vqa_idx)
        caps = [self._caption_for(v, c) for v, c in zip(vqa_idx, cap_idx)]
        out["c"] = np.asarray([c[0] for c in caps], np.int32)
        out["cap_len"] = np.asarray([c[1] for c in caps], np.int32)
        return out

    @property
    def cap_lens(self) -> np.ndarray:
        """Per-index caption lengths (index arithmetic is deterministic, so
        the length bucketing loader can plan an epoch without batch I/O)."""
        if getattr(self, "_cap_lens", None) is None:
            n = len(self.questions)
            self._cap_lens = np.asarray(
                [self._caption_for(i % n, i // n)[1]
                 for i in range(len(self))], np.int32)
        return self._cap_lens

    def get_batch_all(self, indices):
        """All candidate captions per question: c_all [B, n_cap, c_len],
        cap_len_all [B, n_cap] — the max-relevance training feed
        (vqa_tpu/training/select.py). ``indices`` are question indices."""
        out = self._vqa_batch(indices)
        c_all, len_all = [], []
        for i in indices:
            entry = self.captions[self.img_ids[i]]
            c_all.append(entry["c"])
            len_all.append(entry["cap_len"])
        out["c_all"] = np.asarray(c_all, np.int32)
        out["cap_len_all"] = np.asarray(len_all, np.int32)
        return out


class VQACaptionDataset(VQACaptionAllDataset):
    """One selected caption per QA pair via pickle index (dataset.py:167-199)."""

    def __init__(self, load_path, feature_path, dataset_name, ans_dim,
                 graph_path="", caption_id_path="", feature_mode="float32"):
        super().__init__(load_path, feature_path, dataset_name, ans_dim,
                         graph_path, feature_mode=feature_mode)
        with open(caption_id_path, "rb") as f:
            self.caption_id = pickle.load(f)

    def __len__(self):
        return len(self.questions)

    @property
    def cap_lens(self) -> np.ndarray:
        if getattr(self, "_cap_lens", None) is None:
            self._cap_lens = np.asarray(
                [self._caption_for(i, self.caption_id[i])[1]
                 for i in range(len(self))], np.int32)
        return self._cap_lens

    def get_batch(self, indices):
        out = self._vqa_batch(indices)
        caps = [self._caption_for(i, self.caption_id[i]) for i in indices]
        out["c"] = np.asarray([c[0] for c in caps], np.int32)
        out["cap_len"] = np.asarray([c[1] for c in caps], np.int32)
        return out


def set_dataset(load_path: str,
                feature_path: str,
                ans_dim: int,
                caption_id_path: str = "",
                graph_path: str = "",
                is_train: bool = False,
                is_val: bool = False,
                dataset_type: str = "select",
                feature_mode: str = "float32"):
    """Factory mirroring the reference CLI surface (dataset.py:15-47)."""
    if is_train:
        dataset_name = "train2014"
    elif is_val:
        dataset_name = "val2014"
    else:
        raise ValueError("set is_train or is_val")
    load_path = os.path.join(load_path, dataset_name)
    feature_path = os.path.join(feature_path, dataset_name)
    graph_path = os.path.join(graph_path, dataset_name) if graph_path else ""
    cls = {
        "vqa": VQADataset,
        "select": VQACaptionDataset,
        "all": VQACaptionAllDataset,
        "vqa-e": VQAEDataset,
    }[dataset_type]
    return cls(load_path=load_path, feature_path=feature_path,
               dataset_name=dataset_name, ans_dim=ans_dim,
               graph_path=graph_path, caption_id_path=caption_id_path,
               feature_mode=feature_mode)
