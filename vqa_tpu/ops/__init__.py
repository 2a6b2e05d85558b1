"""Op / layer library: the shared building blocks of the model zoo.

TPU-native equivalents of the reference's `modules/modules.py` and
`modules/attention.py` units (weight-normed MLPs, RNN sentence embedding,
GloVe embedding, caption attention/embedding, concat & multiplicative
attention).
"""

from vqa_tpu.ops.linear import FCNet, LReLUNet, DotProduct, WNDense
from vqa_tpu.ops.rnn import GRUCell, LSTMCell, SentenceEmbedding, rnn_scan
from vqa_tpu.ops.attention import ConcatAttention, MultiplyAttention, set_att
from vqa_tpu.ops.embedding import WordEmbedding, load_glove_table
from vqa_tpu.ops.caption import CaptionAttention, CaptionEmbedding

__all__ = [
    "FCNet", "LReLUNet", "DotProduct", "WNDense",
    "GRUCell", "LSTMCell", "SentenceEmbedding", "rnn_scan",
    "ConcatAttention", "MultiplyAttention", "set_att",
    "WordEmbedding", "load_glove_table",
    "CaptionAttention", "CaptionEmbedding",
]
