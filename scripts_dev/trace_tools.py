"""Shared trace-analysis helpers: parse a jax.profiler trace.json.gz
into per-op SELF (exclusive) device time and categorized budgets.

The raw event stream nests (jit wrapper > while > fusions), so a flat
sum double-counts; self-time subtracts child durations with a stack
sweep per device lane.
"""
import glob
import gzip
import json
import os
import re
from collections import defaultdict


def load_trace(trace_dir):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True))
    assert paths, f"no trace written under {trace_dir}"
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def device_self_times(trace):
    """{op_name: self_time_us} over device lanes (exclusive time)."""
    events = trace.get("traceEvents", [])
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {pid for pid, n in proc_names.items()
                if "TPU" in n or "/device" in n.lower() or "Chip" in n}

    lanes = defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            # program-level wrapper events (whole-jit spans) live on
            # their own lane and would double the total
            if e.get("name", "").startswith("jit_"):
                continue
            lanes[(e["pid"], e.get("tid"))].append(e)

    # stack sweep per lane: events sorted by (ts, -dur) nest properly;
    # when an event closes, credit its self time (dur - children)
    self_us = defaultdict(float)
    for lane in lanes.values():
        evs = sorted(lane, key=lambda e: (e["ts"], -e.get("dur", 0.0)))
        stack = []  # entries: [end_ts, name, child_dur_sum, dur]
        for e in evs:
            ts, dur = e["ts"], float(e.get("dur", 0.0))
            while stack and ts >= stack[-1][0] - 1e-9:
                fin = stack.pop()
                self_us[fin[1]] += max(0.0, fin[3] - fin[2])
                if stack:
                    stack[-1][2] += fin[3]
            stack.append([ts + dur, e.get("name", "?"), 0.0, dur])
        while stack:
            fin = stack.pop()
            self_us[fin[1]] += max(0.0, fin[3] - fin[2])
            if stack:
                stack[-1][2] += fin[3]
    return dict(self_us)


CATEGORIES = [
    ("cross-attn kernel", re.compile(r"cross_attn")),
    ("self-attn kernel", re.compile(r"_attn\._attention_core|attention_core")),
    ("conv (stage-1)", re.compile(r"convolution")),
    ("copy/transpose", re.compile(r"copy|transpose", re.I)),
    ("dense matmul", re.compile(r"\bdot\b|matmul|gemm", re.I)),
    ("sort/top-k", re.compile(r"sort|top-k|topk", re.I)),
    ("convert/reduce fusion", re.compile(r"convert.*fusion|reduce")),
    ("elementwise fusion", re.compile(r"fusion")),
    ("control/misc", re.compile(r".")),
]


def categorize(self_us):
    cats = defaultdict(float)
    examples = defaultdict(list)
    for name, us in self_us.items():
        for cat, pat in CATEGORIES:
            if pat.search(name):
                cats[cat] += us
                examples[cat].append((us, name))
                break
    for v in examples.values():
        v.sort(reverse=True)
    return dict(cats), {k: v[:6] for k, v in examples.items()}


def report(trace_dir, top=40):
    trace = load_trace(trace_dir)
    self_us = device_self_times(trace)
    total = sum(self_us.values())
    print(f"total device SELF time: {total/1e3:.1f} ms over "
          f"{len(self_us)} op names")
    for name, us in sorted(self_us.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{us/1e3:10.2f} ms  {100*us/total:5.1f}%  {name[:110]}")
    print("\n--- categorized ---")
    cats, examples = categorize(self_us)
    for cat, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{us/1e3:10.2f} ms  {100*us/total:5.1f}%  {cat}")
        for eus, en in examples[cat][:3]:
            print(f"             {eus/1e3:8.2f} ms   {en[:95]}")
    return self_us


if __name__ == "__main__":
    import sys
    report(sys.argv[1] if len(sys.argv) > 1 else "/tmp/gen_trace")
