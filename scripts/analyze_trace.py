"""Summarize a jax.profiler trace: top device ops by total duration.

Usage: python scripts/analyze_trace.py /tmp/prof
Reads the newest plugins/profile/*/....trace.json.gz under the given
directory (the perfetto trace jax.profiler writes) and prints the top-N
device-lane events aggregated by name — enough to rank kernels without
TensorBoard in the loop.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof"
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    traces = sorted(
        glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not traces:
        sys.exit(f"no *.trace.json.gz under {root}")
    path = traces[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # pid -> process name; keep device lanes (TPU/accelerator), drop host
    pname = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, n in pname.items()
        if any(k in n.lower() for k in ("tpu", "device", "xla", "accel"))
        and "host" not in n.lower()
    }
    # Module/step events (jit_* launches, bare numeric queue markers)
    # CONTAIN the op events on an overlapping lane — aggregate them
    # separately so op time isn't double-counted against step time.
    def is_module(name: str) -> bool:
        return name.startswith("jit_") or name.isdigit()

    durs = collections.Counter()
    counts = collections.Counter()
    op_total = 0.0
    module_total = 0.0
    modules = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if is_module(name):
            modules[name] += e["dur"]
            module_total += e["dur"]
            continue
        durs[name] += e["dur"]
        counts[name] += 1
        op_total += e["dur"]
    print(f"trace: {path}\nlanes: "
          f"{[pname.get(p, p) for p in (device_pids or set(pname))][:6]}\n"
          f"module/step events: {module_total/1e3:.1f} ms "
          f"{[f'{n}={d/1e3:.1f}ms' for n, d in modules.most_common(4)]}\n"
          f"device op time: {op_total/1e3:.1f} ms")
    for name, d in durs.most_common(topn):
        print(f"{d/1e3:9.2f} ms  x{counts[name]:<5d} {name[:100]}")


if __name__ == "__main__":
    main()
