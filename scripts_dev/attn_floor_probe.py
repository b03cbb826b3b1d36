"""TPU floor probe for the fused cosine attention kernel: run fb2-shaped
kernels with pieces REMOVED to attribute the ~7 ms/call (B=16 decode
shapes) between MXU dots, the exp2 transcendental, the bias-strip
add/fetch, and the bf16 cast. The ablated kernels compute garbage —
they exist only to time the subtracted component.

  python scripts_dev/attn_floor_probe.py B reps mode [mode...]
  modes: full   - fb2 as shipped (reference point)
         noexp  - bias add + cast, no exp2
         nobias - exp2(s) only, no bias fetch/add
         dotonly- QK -> cast -> AV (no exp2, no bias)
         noav   - QK + bias + exp2, AV replaced by cheap slice
         f32av  - AV consumes fp32 e (no cast; MXU at fp32 rate)
         bf16exp- fp32 add, cast the (<=0) sum to bf16, exp2 in bf16
                  (packed VPU rate?), AV directly on bf16 e
"""
import math
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(sys.argv[1])
reps = int(sys.argv[2])
modes = sys.argv[3:]
H, N, D = 16, 1792, 64
Mp = int(os.environ.get("PROBE_MP", "1792"))   # 384 = cross shapes
tile_q = int(os.environ.get("PROBE_TQ", "128"))
hg = int(os.environ.get("PROBE_HG", "4"))
G = H // hg
nq = math.ceil(N / tile_q)
N = nq * tile_q

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B * G, hg, N, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B * G, hg, Mp, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B * G, hg, Mp, 2 * D)), jnp.bfloat16)
bias = jnp.asarray(rng.standard_normal((1, N, Mp)), jnp.float32) - 10.0


def make_kernel(mode):
    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        qb = q_ref[0].astype(o_ref.dtype)
        if mode == "avonly":
            # skip QK entirely: AV on a broadcast 'e' (VPU fill only)
            e = jnp.broadcast_to(
                qb[..., :1], qb.shape[:2] + (k_ref.shape[2],)
            ).astype(v_ref.dtype)
            ov = jax.lax.dot_general(e, v_ref[0],
                                     (((2,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
            o_ref[0] = ov[..., :D].astype(o_ref.dtype)
            return
        s = jax.lax.dot_general(qb, k_ref[0], (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if mode == "qkonly":
            o_ref[0] = s[..., :D].astype(o_ref.dtype)
            return
        if mode == "dotonly":
            e = s
        elif mode == "nobias":
            e = jnp.exp2(s)
        elif mode == "noexp":
            e = s + bias_ref[0][None]
        elif mode == "bf16exp":
            e = jnp.exp2((s + bias_ref[0][None]).astype(jnp.bfloat16))
        else:  # full / noav / f32av
            e = jnp.exp2(s + bias_ref[0][None])
        if mode == "noav":
            o_ref[0] = e[..., :D].astype(o_ref.dtype)
            return
        ei = e if mode in ("f32av", "bf16exp") else e.astype(v_ref.dtype)
        ov = jax.lax.dot_general(ei, v_ref[0], (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        o_ref[0] = (ov[..., :D] / ov[..., D:D + 1]).astype(o_ref.dtype)
    return kernel


def build(mode):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B * G, nq),
        in_specs=[
            pl.BlockSpec((1, hg, tile_q, D), lambda g, qi: (g, 0, qi, 0)),
            pl.BlockSpec((1, hg, Mp, D), lambda g, qi: (g, 0, 0, 0)),
            pl.BlockSpec((1, hg, Mp, 2 * D), lambda g, qi: (g, 0, 0, 0)),
            pl.BlockSpec((1, tile_q, Mp), lambda g, qi: (0, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, hg, tile_q, D),
                               lambda g, qi: (g, 0, qi, 0)),
    )
    return pl.pallas_call(
        make_kernel(mode), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * G, hg, N, D), jnp.bfloat16))


def sync(x):
    np.asarray(x.ravel()[0])


for mode in modes:
    try:
        fn = build(mode)

        def body(c, _):
            (x,) = c
            o = fn(x, k, v, bias)
            return (o.astype(jnp.bfloat16),), None

        @jax.jit
        def run(q0):
            (o,), _ = jax.lax.scan(body, (q0,), None, length=reps)
            return o

        sync(run(q))
        t0 = time.perf_counter()
        sync(run(q))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{mode}: {dt:.2f} ms/call", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{mode}: FAILED {str(e)[:180]}", flush=True)
