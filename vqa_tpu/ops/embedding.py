"""Word embedding layers.

TPU-native equivalents of the reference embedding paths:

- ``WordEmbedding`` — learned table, N(0,1) init with a zeroed extra pad row,
  matching ``nn.Embedding(ntoken+1, embed_dim, padding_idx=ntoken)``
  (/root/reference/modules/encoder.py:128). Note the reference's actual
  ``<pad>`` token id is ``ntoken-1`` (last vocab entry), not the padding_idx
  row, so only the extra row at index ntoken is hard-zeroed — replicated.
- ``load_glove_table`` — parses a GloVe text file into a frozen
  [vocab+4, 300] table with zero rows for ``<oov> <start> <end> <pad>``
  (/root/reference/modules/modules.py:166-199). The reference gathers rows in
  a per-sample Python loop on the host; here the frozen table is a device
  constant and lookup is a single XLA gather.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn


class WordEmbedding(nn.Module):
    """Learned token embedding (rows: ntoken vocab entries + 1 zero pad row)."""

    ntoken: int
    embed_dim: int
    frozen_table: np.ndarray | None = None  # if set, use this table, no params

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens: int [...] -> [..., embed_dim]."""
        if self.frozen_table is not None:
            table = jnp.asarray(self.frozen_table)
            return jnp.take(table, tokens, axis=0)

        def init(key, shape, dtype=jnp.float32):
            table = jax.random.normal(key, shape, dtype)
            # padding_idx=ntoken row starts (and with no grad flow, stays) zero.
            return table.at[self.ntoken].set(0.0)

        table = self.param("table", init, (self.ntoken + 1, self.embed_dim))
        return jnp.take(table, tokens, axis=0)


def load_glove_table(vocab_path: str) -> np.ndarray:
    """Parse GloVe-format text into a [len(lines)+4, dim] float32 table.

    Rows follow file order; the trailing 4 zero rows are the specials
    ``<oov> <start> <end> <pad>`` (modules.py:181-184). Frozen: callers pass
    the result as ``WordEmbedding(frozen_table=...)`` so it is excluded from
    params/checkpoints, matching the reference (a plain tensor attribute,
    never optimized; modules.py:185).
    """
    with open(vocab_path) as f:
        lines = f.readlines()
    dim = len(lines[0].split()) - 1
    table = np.zeros((len(lines) + 4, dim), dtype=np.float32)
    for i, line in enumerate(lines):
        table[i, :] = np.asarray(line.split()[1:], dtype=np.float32)
    return table
