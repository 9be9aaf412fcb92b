"""Device-op attribution for one profiled component (real chip).

Runs the chosen component from tools/profile_step.py under
``jax.profiler.trace`` and groups the resulting device ops by the repo
source frame carried in each XLA fusion's metadata (PERF.md round-3
methodology). Prints one JSON line per source family plus a total.

KNOWN-BROKEN since the round-4 axon runtime: the tunnel profiler's
trace.json.gz now carries only host-side init events — the fori_loop's
device ops never appear (round-3 captured them fine). Until the runtime
profiler recovers, drive perf work with tools/profile_step.py component
timings plus the standalone kernel sweeps (tools/sweep_*.py); see the
PERF.md round-4 note.

Usage: python tools/trace_component.py guided_update [n_iters]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize(trace_dir: str):
    # The profiler writes <dir>/plugins/profile/<ts>/*.trace.json.gz
    paths = glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")
    )
    if not paths:
        print(json.dumps({"error": "no trace.json.gz found"}))
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Device-lane pids: find thread/process names that look like the TPU
    # XLA op lanes ("/device:TPU:0" pid with "XLA Ops" tid).
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    op_lanes = {
        key for key, name in tid_names.items()
        if "XLA Ops" in name or "Steps" == name
    }
    fam = collections.defaultdict(float)
    total = 0.0
    n_ops = 0
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if key not in op_lanes or "XLA Ops" not in tid_names.get(key, ""):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        args = e.get("args", {})
        src = args.get("source_info") or args.get("source") or ""
        if not src:
            # fall back to the op name's fusion kind
            src = re.sub(r"[.\d]+$", "", e.get("name", "unknown"))
        # keep only the repo-relative frame if present
        m = re.search(r"lvd_tpu/[\w/]+\.py:\d+", src)
        if m:
            src = m.group(0)
        fam[src] += dur
        total += dur
        n_ops += 1
    rows = sorted(fam.items(), key=lambda kv: -kv[1])
    for src, ms in rows[:25]:
        print(json.dumps({"src": src, "ms": round(ms, 2)}), flush=True)
    rest = sum(ms for _, ms in rows[25:])
    print(json.dumps({"src": "(rest)", "ms": round(rest, 2)}))
    print(json.dumps({"total_ms": round(total, 2), "n_ops": n_ops,
                      "file": os.path.basename(path)}))


def main():
    comp = sys.argv[1] if len(sys.argv) > 1 else "guided_update"
    iters = sys.argv[2] if len(sys.argv) > 2 else "4"
    trace_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/lvd_trace"

    if comp == "summarize":
        summarize(trace_dir)
        return

    import subprocess

    # Run the component once (warm compile via persistent cache), then again
    # under the profiler, in ONE process so the compile is reused.
    import jax

    os.environ.setdefault("LVD_TRACE_DIR", trace_dir)
    import tools.profile_step as ps

    real_main = ps.main

    sys.argv = ["profile_step.py", iters, comp]
    # First pass compiles + warms; second pass traces.
    real_main()
    with jax.profiler.trace(trace_dir):
        real_main()
    summarize(trace_dir)


if __name__ == "__main__":
    main()
