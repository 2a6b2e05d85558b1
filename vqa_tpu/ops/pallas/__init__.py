"""Fused Pallas TPU kernels for the hot ops.

Each kernel ships with a pure-XLA reference implementation and a parity test
(SURVEY.md section 7.1): Pallas is an optimization, never a correctness
dependency. Kernels:

- ``fused_attention``: top-down MultiplyAttention fusion + attention-weighted
  pooling in one VMEM-resident pass (reference attention.py:55-86 +
  predictor.py:85 ``v.sum(1)``).
- ``gru``: question-GRU sequence kernel with the recurrent weight matrix
  resident in VMEM across all time steps (reference modules.py:98-163).
"""

from vqa_tpu.ops.pallas.fused_attention import (
    fused_multiply_attention_pool, multiply_attention_pool_reference,
)
from vqa_tpu.ops.pallas.gru import gru_last_state, gru_last_state_reference

__all__ = [
    "fused_multiply_attention_pool", "multiply_attention_pool_reference",
    "gru_last_state", "gru_last_state_reference",
]
