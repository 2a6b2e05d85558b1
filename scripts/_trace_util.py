"""Shared trace-summary helper for the scripts/trace_* tools.

Aggregates leaf-op durations from a jax.profiler trace's device 'XLA Ops'
track (the Perfetto JSON exported under plugins/profile/...).
"""

import glob
import gzip
import json
import os
from collections import defaultdict


def top_ops(trace_dir, n=22):
    """Aggregate leaf op durations on the device 'XLA Ops' track.

    Skips container events (the jit module, while loops, bare step ids) so
    the listing sums to real op time; prints count so per-scan-iteration
    cost is readable (x38 = 19 decode steps x 2 captured train steps)."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    device_pids = {e["pid"] for e in events
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and ("TPU" in str(e["args"].get("name", ""))
                        or "Device" in str(e["args"].get("name", "")))}
    op_tids = {(e["pid"], e["tid"]) for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["pid"] in device_pids
               and e["args"].get("name") == "XLA Ops"}
    total = defaultdict(float)
    count = defaultdict(int)
    module_us = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if (e.get("pid"), e.get("tid")) in op_tids:
            name = e["name"]
            if name.startswith(("while", "jit_", "condition", "body")) \
                    or name.isdigit():
                continue  # containers, not leaf ops
            total[name] += e.get("dur", 0.0)
            count[name] += 1
        elif e.get("pid") in device_pids and e["name"].startswith("jit_"):
            module_us += e.get("dur", 0.0)
    ranked = sorted(total.items(), key=lambda kv: -kv[1])
    print(f"\ntop leaf device ops (ms total over captured steps), {paths[-1]}:")
    for name, us in ranked[:n]:
        print(f"  {us / 1e3:9.2f} ms  x{count[name]:5d}  {name[:90]}")
    print(f"  leaf total: {sum(total.values()) / 1e3:.1f} ms | "
          f"module total: {module_us / 1e3:.1f} ms")
