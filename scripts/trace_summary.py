#!/usr/bin/env python
"""Summarize a jax.profiler trace: device-time attribution by XLA op.

The TPU analog of the reference's hand-rolled rate telemetry
(reference scripts/train_pql.py:78-86) at op granularity: run training
with ``profile_dir=/tmp/prof profile_iters=N`` (scripts/train.py's
_ProfilerHook), then

    python scripts/trace_summary.py /tmp/prof [--iters N] [--top 30]

finds the newest ``*.trace.json.gz`` under the dir, sums the complete
("X") events on device tracks, groups them by normalized op name
(``fusion.2481`` → ``fusion``, keeping the 5 largest individual fusions
un-merged so the big ones stay identifiable), and prints a table of
device-ms (and ms/iter with --iters). Host-side tracks are excluded —
dispatch gaps show up as the difference between wall-clock/iter and
device-ms/iter.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(root: str) -> str:
    paths = glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        sys.exit(f"no *.trace.json.gz under {root}")
    return max(paths, key=os.path.getmtime)


def load_events(path: str):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", data)


_TRAIL = re.compile(r"\.\d+$")


def summarize(events, top: int, iters: int | None):
    # pid → process name from metadata events
    pnames: dict[int, str] = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e.get("args", {}).get("name", "")

    def is_device(pid: int) -> bool:
        n = pnames.get(pid, "").lower()
        return ("tpu" in n or "device" in n or "xla" in n) and "host" not in n

    if not any(is_device(p) for p in pnames):
        # CPU backend: everything lives on the single '/host:CPU' track.
        # Nested TraceMe annotations double-count there, so percentages
        # are indicative only — the tool's precise mode is the TPU track.
        print("# no device track — falling back to host track (CPU backend)")
        is_device = lambda pid: True  # noqa: E731

    per_op = collections.Counter()
    per_exact = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or not is_device(e.get("pid", -1)):
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "?")
        total += dur
        per_exact[name] += dur
        per_op[_TRAIL.sub("", name)] += dur

    # un-merge the largest individual ops so e.g. one dominant fusion is
    # visible on its own line
    for name, dur in per_exact.most_common(5):
        base = _TRAIL.sub("", name)
        if name != base and base in per_op:
            per_op[base] -= dur
            per_op[name] = dur
            if per_op[base] <= 0:
                del per_op[base]

    div = iters if iters else 1
    unit = "ms/iter" if iters else "ms total"
    print(f"{'op':<48} {unit:>12}  {'%':>6}")
    for name, dur in per_op.most_common(top):
        print(f"{name:<48} {dur / 1e3 / div:>12.3f}  {100 * dur / max(total, 1e-9):>5.1f}%")
    print(f"{'TOTAL device':<48} {total / 1e3 / div:>12.3f}  100.0%")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--iters", type=int, default=None, help="iterations captured (ms/iter)")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    path = find_trace(args.profile_dir)
    print(f"# {path}")
    summarize(load_events(path), args.top, args.iters)


if __name__ == "__main__":
    main()
