"""Capture a jax.profiler trace of the serving-batch generate call and
print the top self-time ops from the trace. Run on the real TPU:

  python scripts_dev/profile_generate.py [batch] [quant]
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bevgen_tpu.core.config import argoverse_muse_7cam_config
from bevgen_tpu.data.fake import fake_batch
from bevgen_tpu.pipelines.generate import BEVGenPipeline

batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 2
quant = len(sys.argv) > 2 and sys.argv[2] == "1"

cfg = argoverse_muse_7cam_config()
pipe = BEVGenPipeline.create(cfg, dtype=jnp.bfloat16)
params = pipe.init_params(jax.random.PRNGKey(0))
if quant:
    pipe, params = pipe.quantized(params)

batch = fake_batch(cfg, batch_size=batch_size)
seg = jnp.asarray(batch["segmentation"])
ii = jnp.asarray(batch["intrinsics_inv"])
ei = jnp.asarray(batch["extrinsics_inv"])

run = jax.jit(lambda p, s, a, b, r: pipe.generate_fn(p, s, a, b, r))

def sync(o):
    np.asarray(o[1][0, 0, 0, 0])

sync(run(params, seg, ii, ei, jax.random.PRNGKey(1)))
sync(run(params, seg, ii, ei, jax.random.PRNGKey(2)))

trace_dir = "/tmp/gen_trace"
with jax.profiler.trace(trace_dir):
    sync(run(params, seg, ii, ei, jax.random.PRNGKey(3)))

# parse the trace.json.gz: sum device-lane event durations by op name
paths = sorted(glob.glob(os.path.join(
    trace_dir, "**", "*.trace.json.gz"), recursive=True))
assert paths, f"no trace written under {trace_dir}"
with gzip.open(paths[-1], "rt") as f:
    trace = json.load(f)

events = trace.get("traceEvents", [])
# device lanes: pid whose process_name mentions TPU/device
proc_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        proc_names[e["pid"]] = e["args"].get("name", "")
dev_pids = {pid for pid, n in proc_names.items()
            if "TPU" in n or "/device" in n.lower() or "Chip" in n}

tot = {}
for e in events:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        name = e.get("name", "?")
        tot[name] = tot.get(name, 0.0) + e.get("dur", 0.0)

if not tot:  # fall back: all X events
    for e in events:
        if e.get("ph") == "X":
            name = e.get("name", "?")
            tot[name] = tot.get(name, 0.0) + e.get("dur", 0.0)

total = sum(tot.values())
print(f"pids seen: { {pid: proc_names.get(pid,'') for pid in dev_pids} }")
print(f"total device time: {total/1e3:.1f} ms over {len(tot)} op names")
for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{us/1e3:10.2f} ms  {100*us/total:5.1f}%  {name[:110]}")
