"""Two-stage pipeline execution: encoder stage and decoder stage on
different devices, microbatches overlapped.

The reference's only model-parallel feature is static placement of the
caption decoder on a second device with synchronous `.to()` transfers per
batch (`/root/reference/main.py:88`, `wrapper.py:148-150`,
`generator.py:69-72`) — stage 1 idles while stage 0 runs and vice versa.
This module implements the same 2-stage split as an actual pipeline: the
encoder (stage 0, device A) and the caption generator (stage 1, device B)
are separately jitted with their parameter shards resident on their own
devices, and microbatches are software-pipelined — JAX's async dispatch
overlaps stage 0 of microbatch i+1 with stage 1 of microbatch i, and the
inter-stage activation transfer is an async device-to-device copy.

This is the pp counterpart to the dp/tp shardings in mesh.py. For pod-scale
runs the mesh path is preferred (one jit graph, XLA collectives); the
pipeline is the explicit-placement alternative the reference gestured at.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np


class TwoStagePipeline:
    """Encoder/generator pipeline over two devices."""

    def __init__(self, model, params: Dict[str, Any],
                 device0=None, device1=None):
        assert model.generator is not None, "pipeline needs a generator stage"
        devices = jax.devices()
        self.d0 = device0 if device0 is not None else devices[0]
        self.d1 = device1 if device1 is not None else devices[-1]
        self.model = model

        # Stage parameter residency: encoder weights on d0, generator on d1.
        self.enc_params = jax.device_put({"encoder": params["encoder"]},
                                         self.d0)
        self.gen_params = jax.device_put({"generator": params["generator"]},
                                         self.d1)

        def enc_fn(p, batch):
            def run(mdl, b):
                return mdl.encoder(b, deterministic=True)
            return model.apply({"params": p}, batch, method=run)

        def gen_fn(p, embed):
            def run(mdl, e):
                return mdl.generator(e, deterministic=True)
            return model.apply({"params": p}, embed, method=run)

        self._enc = jax.jit(enc_fn)
        self._gen = jax.jit(gen_fn)

    def _encode(self, batch):
        batch = jax.device_put(batch, self.d0)
        return self._enc(self.enc_params, batch)

    def _generate(self, embed):
        # stage boundary: async device-to-device copy of the activations
        needed = {k: embed[k] for k in ("v", "c", "c_target", "cap_len")}
        moved = jax.device_put(needed, self.d1)
        return self._gen(self.gen_params, moved)

    def run(self, microbatches: Sequence[Dict[str, Any]]) -> List[Dict]:
        """Pipelined teacher-forced caption forward over microbatches.

        Dispatch order interleaves stages so stage 0 of microbatch i+1 is
        enqueued before blocking on stage 1 of microbatch i.
        """
        outputs: List[Optional[Dict]] = [None] * len(microbatches)
        embed_prev = None
        for i, mb in enumerate(microbatches):
            embed = self._encode(mb)        # enqueue stage 0 for i
            if embed_prev is not None:
                outputs[i - 1] = self._generate(embed_prev)
            embed_prev = embed
        if embed_prev is not None:
            outputs[-1] = self._generate(embed_prev)
        return outputs


def split_microbatches(batch: Dict[str, np.ndarray], n_micro: int
                       ) -> List[Dict[str, np.ndarray]]:
    """Split a host batch into n_micro equal microbatches along axis 0."""
    size = next(iter(batch.values())).shape[0]
    assert size % n_micro == 0, f"batch {size} not divisible by {n_micro}"
    step = size // n_micro
    return [{k: v[i * step:(i + 1) * step] for k, v in batch.items()}
            for i in range(n_micro)]
