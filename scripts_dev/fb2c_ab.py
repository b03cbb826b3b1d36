"""A/B the fb2 vs fb2c cosine-attention forwards at decode shapes.

  python scripts_dev/fb2c_ab.py B reps [variants...] [MP]
    B: batch; variants default "fb2 fb2c"; MP env PROBE_MP (1792 self,
    384 cross).

Times the REAL wrappers (prologue + kernel) via an on-device scan loop;
sync by materializing one scalar (axon block_until_ready gotcha).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_tpu_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bevgen_tpu.ops.pallas import fused_attention as fa

B = int(sys.argv[1])
reps = int(sys.argv[2])
variants = sys.argv[3:] or ["fb2", "fb2c"]
H, N, D = 16, 1792, 64
M = int(os.environ.get("PROBE_MP", "1792"))

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, H, M, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, H, M, D)), jnp.bfloat16)
nkv = jnp.asarray(rng.standard_normal((2, H, 1, D)), jnp.float32)
qs = jnp.asarray(1 + 0.1 * rng.standard_normal(D), jnp.float32)
ks = jnp.asarray(1 + 0.1 * rng.standard_normal(D), jnp.float32)
bias = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)

kw = {}
if os.environ.get("PROBE_CHUNK"):
    kw["chunk"] = int(os.environ["PROBE_CHUNK"])
if os.environ.get("PROBE_HG"):
    kw["head_group"] = int(os.environ["PROBE_HG"])
if os.environ.get("PROBE_TQ"):
    kw["tile_q"] = int(os.environ["PROBE_TQ"])

for name in variants:
    fwd = getattr(fa, fa._COSINE_FWD_NAMES[name])
    vkw = kw if name == "fb2c" else {
        k_: v_ for k_, v_ in kw.items() if k_ != "chunk"}

    def body(c, _, fwd=fwd, vkw=vkw):
        (x,) = c
        o = fwd(x, k, v, nkv, qs, ks, bias, None, sm_scale=8.0, **vkw)
        return (o.astype(x.dtype),), None

    @jax.jit
    def run(q0):
        (o,), _ = jax.lax.scan(body, (q0,), None, length=reps)
        return o

    t0 = time.perf_counter()
    np.asarray(run(q).ravel()[0])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(run(q).ravel()[0])
    dt = (time.perf_counter() - t0) / reps * 1e3
    flops = 4 * B * H * N * M * D
    print(f"{name}: {dt:.2f} ms/call ({flops / dt / 1e9:.1f} TF/s) "
          f"[compile+1st {tc:.0f}s]", flush=True)
