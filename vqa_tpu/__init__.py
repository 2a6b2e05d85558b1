"""vqa_tpu — a TPU-native (JAX / XLA / Pallas / pjit) VQA + captioning framework.

A ground-up rebuild of the capabilities of the `Jayie/vqa-collection` reference
(Up-Down VQA / captioning, VQA-E multi-task, question-relevant captioning,
ReGAT spatial-relation graph attention), designed TPU-first:

- functional flax modules + explicit PRNG keys (no stateful nn.Module graph),
- one jitted train/eval step per model family; multi-task variants share a
  single compiled graph with masked per-task losses,
- RNNs as `jax.lax.scan` over fixed-length masked sequences (no shrinking
  batches / length sorting),
- hot fusion ops (top-down attention, GCN relation conv, decoder step)
  available as fused Pallas kernels with pure-XLA reference implementations,
- data parallelism via `jax.sharding.Mesh` + NamedSharding from day one.

See SURVEY.md at the repo root for the full structural analysis of the
reference and the mapping of every component.
"""

__version__ = "0.1.0"
