"""Summarize a jax.profiler trace (trace.json.gz) without TensorBoard.

Aggregates complete events on device tracks by name; prints top-N by total
duration.  Device pids are detected by track names containing 'TPU' / 'Chip'
/ 'device' (falls back to all non-python tracks).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os


def _load_trace(trace_dir: str) -> dict:
    hits = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(hits[-1], "rt") as f:
        return json.load(f)


def summarize(trace_dir: str, top: int = 40, n_steps: int = 1):
    data = _load_trace(trace_dir)
    events = data.get("traceEvents", [])

    # map pid -> process name
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    def is_device(pid, tid):
        pn = pid_names.get(pid, "")
        tn = tid_names.get((pid, tid), "")
        s = (pn + " " + tn).lower()
        return ("tpu" in s or "chip" in s or "device" in s or "xla" in s) and "python" not in s

    durs = collections.defaultdict(float)
    counts = collections.defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if not is_device(e.get("pid"), e.get("tid")):
            continue
        name = e["name"]
        durs[name] += e["dur"]
        counts[name] += 1
        total += e["dur"]

    print(f"\ndevice tracks: "
          f"{sorted({pid_names.get(p, '') + '/' + tid_names.get((p, t), '') for (p, t) in {(e.get('pid'), e.get('tid')) for e in events if e.get('ph') == 'X'} if is_device(p, t)})[:6]}")
    print(f"total device event time: {total/1000:.2f} ms over {n_steps} steps "
          f"= {total/1000/max(1,n_steps):.2f} ms/step\n")
    print(f"{'total ms':>10} {'ms/step':>9} {'count':>7}  name")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{d/1000:10.2f} {d/1000/max(1,n_steps):9.3f} {counts[name]:7d}  {name[:110]}")


if __name__ == "__main__":
    import sys

    summarize(sys.argv[1], top=int(sys.argv[2]) if len(sys.argv) > 2 else 40,
              n_steps=int(sys.argv[3]) if len(sys.argv) > 3 else 1)
