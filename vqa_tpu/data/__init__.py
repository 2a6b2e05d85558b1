"""Data layer: tokenization, answer targets, relation graphs, datasets, feed."""

from vqa_tpu.data.tokenizer import get_tokens, padding, Vocab
from vqa_tpu.data.relation import spatial_relation, relation_graph, relation_graphs_batched
from vqa_tpu.data.dataset import (
    VQADataset, VQAEDataset, VQACaptionAllDataset, VQACaptionDataset, set_dataset,
)
from vqa_tpu.data.loader import Loader

__all__ = [
    "get_tokens", "padding", "Vocab",
    "spatial_relation", "relation_graph", "relation_graphs_batched",
    "VQADataset", "VQAEDataset", "VQACaptionAllDataset", "VQACaptionDataset",
    "set_dataset", "Loader",
]
