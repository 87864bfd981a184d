"""Summarize a saved jax.profiler trace: device busy time + top ops.

Usage: python benchmarks/trace_report.py <trace_dir> [--div N]
``--div N`` divides all times by N (e.g. the number of steps traced).
"""

import argparse
import collections
import glob
import gzip
import json


def load_device_ops(trace_dir):
    p = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(p, "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [pid for pid, n in pids.items() if "TPU" in n]
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    tot = collections.Counter()
    spans = []
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev and e.get("dur"):
            # "XLA Ops" is the per-instruction track; "Steps"/"XLA Modules"
            # are whole-program spans that would double-count.
            if tids.get((e["pid"], e["tid"])) != "XLA Ops":
                continue
            if e["name"].startswith("jit_"):
                continue
            tot[e["name"]] += e["dur"]
            spans.append((e["ts"], e["ts"] + e["dur"]))
    return tot, spans


def merged_busy_us(spans):
    spans = sorted(spans)
    total, cur_s, cur_e = 0.0, None, None
    for s, e in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--div", type=float, default=1.0)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    tot, spans = load_device_ops(args.trace_dir)
    d = args.div
    print(f"device op-time sum: {sum(tot.values())/1000/d:.2f} ms")
    print(f"device busy (merged): {merged_busy_us(spans)/1000/d:.2f} ms")
    print(f"\n{'ms':>9}  op")
    for name, us in tot.most_common(args.top):
        print(f"{us/1000/d:9.3f}  {name}")


if __name__ == "__main__":
    main()
