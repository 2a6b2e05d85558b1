"""Parallelism: device mesh, shardings, and sharded step construction.

The reference has no distributed backend at all (SURVEY.md sections 2 rows
31-34, 5.8): its only multi-device feature is static 2-device placement of
the caption decoder. Here parallelism is first-class and TPU-native: one
``jax.sharding.Mesh``, batch-sharded data parallelism plus tensor-sharded
classifier/vocab projections, XLA-emitted collectives over ICI.
"""

from vqa_tpu.parallel.mesh import (
    make_mesh, batch_shardings, param_shardings, shard_batch, replicate,
)

__all__ = ["make_mesh", "batch_shardings", "param_shardings", "shard_batch",
           "replicate"]
