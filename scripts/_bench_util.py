"""Shared measurement harness for the on-device benchmark scripts.

The harness relay adds a large, fluctuating fixed cost (~20-38 ms) to every
dispatched call, and its ready-events resolve early (only host fetches prove
completion). Two sound measurement schemes, used across bench.py and
scripts/bench_* / profile_*:

- ``timed``: best-of-N wall clock of one jitted call including the fetch.
- ``chained_ms``: REPS iterations of ``step`` chained inside ONE jit with a
  data dependency (the carry feeds the next iteration), fetched once.
  ``mode='amortize'`` reports t(REPS)/REPS (relay residue ~1/REPS, common
  mode across configs compared in one session); ``mode='cancel'`` also
  times t(1) and reports (t(REPS)-t(1))/(REPS-1) (relay cost cancels
  exactly — 2x the compiles, use for sub-10 ms ops).

Pass device buffers as jit ARGUMENTS, never closures — closed-over arrays
are baked into the lowered graph as constants and stall the relay compile.
"""

from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

WARMUP, ITERS = 1, 3


def timed(jitted, *args, warmup: int = WARMUP, iters: int = ITERS) -> float:
    """Best-of-iters seconds for one call + host fetch."""
    for _ in range(warmup):
        np.asarray(jitted(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jitted(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def chained_ms(step, carry, args, reps: int = 8, mode: str = "amortize",
               reduce=jnp.max, jit_kwargs=None) -> float:
    """ms per ``step`` call; step: (carry, *args) -> carry (same shape/dtype).

    The fetched value is ``reduce`` of the final carry — data-dependent on
    every chained step, so completion is provable. Use max (not sum) as the
    reduce when the carry is a dot product: XLA rewrites sum(dot(A, B))
    algebraically; max does not distribute over dot.

    ``jit_kwargs`` forwards to ``jax.jit`` (e.g. ``in_shardings`` Formats to
    pin input layouts — scripts/bench_int8_layout.py).
    """
    def build(n):
        @functools.partial(jax.jit, **(jit_kwargs or {}))
        def fn(c, *a):
            c = jax.lax.fori_loop(0, n, lambda i, c: step(c, *a), c)
            return reduce(c.astype(jnp.float32))
        return fn

    tn = timed(build(reps), carry, *args)
    if mode == "cancel":
        t1 = timed(build(1), carry, *args)
        return 1e3 * (tn - t1) / (reps - 1)
    return 1e3 * tn / reps
