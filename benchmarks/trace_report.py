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


def parse_hlo_lines(hlo_text):
    """Map HLO instruction name -> its definition line (shape + operands)."""
    import re

    hlo_lines = {}
    for line in hlo_text.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (.*)", line)
        if m:
            hlo_lines[m.group(1)] = m.group(2)
    return hlo_lines


def print_attribution(tot, hlo_lines, reps, module_regex=r'UNetVideoModel/([^/"]+(?:/[^/"]+)?)',
                      top_ops=25, dir_marker=None):
    """Shared per-category / per-module / top-op report for analyze_hlo.py
    and analyze_train_hlo.py — one implementation so regex or
    fusion-renaming fixes apply to both.

    ``dir_marker(line) -> str`` optionally labels each op's direction
    (e.g. fwd/bwd from the autodiff metadata marker).
    """
    import collections
    import re

    total_ms = sum(tot.values()) / reps / 1000
    unit = "ms/step" if dir_marker else "ms/fwd"
    print(f"total device time: {total_ms:.2f} {unit} across {len(tot)} ops")

    cats = collections.Counter()
    for name, us in tot.items():
        cats[re.sub(r"[.\d]+$", "", name)] += us
    print(f"\n{unit:>8}  {'%':>5}  category")
    for base, us in cats.most_common(20):
        print(f"{us/reps/1000:8.2f}  {us/reps/1000/total_ms*100:5.1f}  {base}")

    mods = collections.Counter()
    for name, us in tot.items():
        line = hlo_lines.get(name, "")
        m = re.search(module_regex, line)
        key = m.group(1) if m else "(unattributed)"
        if dir_marker:
            key = (key, dir_marker(line))
        mods[key] += us
    print(f"\n{unit:>8}  {'%':>5}  module")
    for key, us in mods.most_common(50):
        label = "  ".join(key) if isinstance(key, tuple) else key
        print(f"{us/reps/1000:8.2f}  {us/reps/1000/total_ms*100:5.1f}  {label}")

    print(f"\n{unit:>8}  op  ::  hlo")
    for name, us in tot.most_common(top_ops):
        line = hlo_lines.get(name, "?")
        print(f"{us/reps/1000:8.2f}  {name}\n          {line[:240]}")


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
