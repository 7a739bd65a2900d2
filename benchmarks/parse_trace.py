"""Aggregate a jax.profiler trace into per-op device-time buckets.

Usage: python benchmarks/parse_trace.py TRACEDIR [--top 40]

Finds the newest *.trace.json.gz under TRACEDIR, sums event durations on
the device lanes, and prints (a) the top ops by total time and (b) a
category rollup (fusion / copy / pool-bwd compare / cond / other) — the
same accounting PROFILE.md's 512px roofline used, so large-shape runs
(VERDICT r4 weak #4: the 25.8% -> 20.0% MFU decay from 512 to 2048px)
can be decomposed with identical methodology.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(tracedir: str):
    paths = sorted(
        glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        sys.exit(f"no *.trace.json.gz under {tracedir}")
    with gzip.open(paths[-1], "rt") as fh:
        data = json.load(fh)
    return data.get("traceEvents", [])


def device_pids(events) -> set:
    pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name.lower() or "XLA Op" in name:
                pids.add(ev["pid"])
    return pids


CATEGORIES = (
    ("copy", re.compile(r"^copy|copy[.\d]*$|transpose")),
    ("conv-fusion", re.compile(r"convolution|conv[\d.]")),
    ("pool-bwd", re.compile(r"select-and-scatter|reduce-window")),
    ("cond/branch", re.compile(r"conditional|while")),
    ("fusion", re.compile(r"^(loop_)?fusion")),
    ("dot", re.compile(r"dot|einsum")),
)


def categorize(name: str) -> str:
    for cat, rx in CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tracedir")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    events = load_events(args.tracedir)
    pids = device_pids(events)
    per_op = collections.Counter()
    per_op_n = collections.Counter()
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in pids:
            continue
        name = ev.get("name", "?")
        per_op[name] += ev.get("dur", 0)
        per_op_n[name] += 1

    total = sum(per_op.values())
    if not total:
        # fallback: no metadata-tagged device pids; take the busiest pid
        busiest = collections.Counter()
        for ev in events:
            if ev.get("ph") == "X":
                busiest[ev["pid"]] += ev.get("dur", 0)
        if not busiest:
            sys.exit("no complete events in trace")
        pid = busiest.most_common(1)[0][0]
        for ev in events:
            if ev.get("ph") == "X" and ev["pid"] == pid:
                per_op[ev.get("name", "?")] += ev.get("dur", 0)
                per_op_n[ev.get("name", "?")] += 1
        total = sum(per_op.values())

    print(f"device events total: {total / 1e6:.3f} s")
    cats = collections.Counter()
    for name, dur in per_op.items():
        cats[categorize(name)] += dur
    print("\n-- category rollup --")
    for cat, dur in cats.most_common():
        print(f"{cat:14s} {dur / 1e6:9.3f} s  {100.0 * dur / total:5.1f}%")
    print(f"\n-- top {args.top} ops --")
    for name, dur in per_op.most_common(args.top):
        print(
            f"{dur / 1e6:9.3f} s {100.0 * dur / total:5.1f}% "
            f"x{per_op_n[name]:<6d} {name[:90]}"
        )


if __name__ == "__main__":
    main()
