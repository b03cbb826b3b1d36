"""Op-level trace of ONE demask forward + ONE critic forward at batch B
(the two calls that are ~92% of decode time). Much faster to compile
than the full generate scan; same per-op breakdown.

  python scripts_dev/trace_forward.py [B] [quant]
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bevgen_tpu.core.config import argoverse_muse_7cam_config
from bevgen_tpu.models import geometry
from bevgen_tpu.models.stage2 import maskgit as mg
from bevgen_tpu.models.stage2.maskgit import MaskGit

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
quant = len(sys.argv) > 2 and sys.argv[2] == "1"

cfg = argoverse_muse_7cam_config()
tfc = cfg.transformer
if quant:
    tfc = tfc.replace(quant="int8")
model = MaskGit(tfc, cfg.muse, dtype=jnp.bfloat16)

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, tfc.vocab_size,
                               (B, tfc.num_cams, tfc.num_cam_tokens)),
                  jnp.int32)
cond = jnp.asarray(rng.integers(0, tfc.cond_vocab_size,
                                (B, tfc.num_cond_tokens)), jnp.int32)
ii, ei = geometry.canonical_rig_inverses(tfc, B)
ii, ei = jnp.asarray(ii), jnp.asarray(ei)
params = model.init(jax.random.PRNGKey(0), ids[:1], cond[:1], ii[:1],
                    ei[:1], method=MaskGit.init_all)
if quant:
    from bevgen_tpu.ops.quant import quantize_dense_tree
    params = jax.tree_util.tree_map(
        jnp.asarray, quantize_dense_tree(params))


@jax.jit
def run(ids):
    logits, embed = mg.cfg_logits(model, params, ids, cond, ii, ei,
                                  cfg.muse.cond_scale, real_cfg=False)
    scores = mg.cfg_critic(model, params, ids, cond, ii, ei,
                           cfg.muse.cond_scale, real_cfg=False)
    return logits, scores


def sync(o):
    np.asarray(o[0].ravel()[0])
    np.asarray(o[1].ravel()[0])


sync(run(ids))
t0 = time.perf_counter()
sync(run(ids))
dt = time.perf_counter() - t0
print(f"demask+critic pair at B={B} quant={quant}: {dt*1e3:.1f} ms "
      f"(x17.5 pairs -> {dt*17.5:.2f} s/decode)", flush=True)

trace_dir = "/tmp/fwd_trace"
with jax.profiler.trace(trace_dir):
    sync(run(ids))

paths = sorted(glob.glob(os.path.join(
    trace_dir, "**", "*.trace.json.gz"), recursive=True))
assert paths, f"no trace written under {trace_dir}"
with gzip.open(paths[-1], "rt") as f:
    trace = json.load(f)

events = trace.get("traceEvents", [])
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
if not tot:
    for e in events:
        if e.get("ph") == "X":
            name = e.get("name", "?")
            tot[name] = tot.get(name, 0.0) + e.get("dur", 0.0)

total = sum(tot.values())
print(f"total device time: {total/1e3:.1f} ms over {len(tot)} op names")
for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:35]:
    print(f"{us/1e3:10.2f} ms  {100*us/total:5.1f}%  {name[:110]}")
