"""Attention kernel layout experiments at serving shapes (B=4).

Hypothesis: the batched dot_general contracting BOTH operands' last
dims forces Mosaic to transpose K inside the kernel per grid step.
Variants:
  kmajor     — K supplied as (..., D, M): rhs contracts dim 1 naturally.
  unrolled   — python loop over heads with 2D dots (no batch dim).
  baseline   — production layout for comparison.

Run: python scripts_dev/attn_probe2.py [reps] [B]
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

from bevgen_tpu.ops.pallas import fused_attention as fa

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
H, N, D = 16, 1792, 64
M = N
TILE_Q = 128

rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(0, 1, (B, H, N, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(0, 1, (B, H, M, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(0, 1, (B, H, M, D)), jnp.bfloat16)
bias = jnp.asarray(rng.normal(0, 0.1, (N, M)), jnp.float32)


def bench(fn, name):
    @jax.jit
    def loop(x):
        out, _ = jax.lax.scan(lambda c, _: (fn(c), ()), x, None, length=REPS)
        return out
    o = loop(q)
    np.asarray(o[0, 0, 0, 0])
    t0 = time.perf_counter()
    o = loop(q)
    np.asarray(o[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / REPS * 1e3
    flops = 2 * 2 * B * H * N * M * D
    print(f"{name:30s} {dt:8.3f} ms/call   {flops/dt/1e9:7.1f} GF/ms")


def _kern(q_ref, k_ref, v_ref, bias_ref, o_ref, *, kmajor, unrolled):
    hg = q_ref.shape[1]
    qq = q_ref[0]                                   # (hg, T, D)
    kk = k_ref[0]                                   # (hg, Mp, D) or (hg, D, Mp)
    vv = v_ref[0]
    if unrolled:
        outs = []
        for h in range(hg):
            if kmajor:
                s = jax.lax.dot_general(
                    qq[h], kk[h], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                s = jax.lax.dot_general(
                    qq[h], kk[h], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            s = s * 8.0 + bias_ref[0]
            m_ = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m_)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            outs.append(jax.lax.dot_general(
                p.astype(vv.dtype), vv[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        o_ref[0] = jnp.stack(outs).astype(o_ref.dtype)
        return
    if kmajor:
        s = jax.lax.dot_general(qq, kk, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
    else:
        s = jax.lax.dot_general(qq, kk, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
    s = s * 8.0 + bias_ref[0][None]
    m_ = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m_)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(p.astype(vv.dtype), vv,
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def attn(qx, kmajor=False, unrolled=False, head_group=8):
    Np = math.ceil(N / TILE_Q) * TILE_Q
    Mp = math.ceil(M / 128) * 128
    nq = Np // TILE_Q
    hg = fa._auto_head_group(H, TILE_Q, Mp, D, head_group)
    G = H // hg

    qp = qx.reshape(B * G, hg, N, D)
    kp = k.reshape(B * G, hg, M, D)
    vp = v.reshape(B * G, hg, M, D)
    if kmajor:
        kp = kp.swapaxes(2, 3)                       # (BG, hg, D, M)
        k_spec = pl.BlockSpec((1, hg, D, Mp), lambda g, qi: (g, 0, 0, 0))
    else:
        k_spec = pl.BlockSpec((1, hg, Mp, D), lambda g, qi: (g, 0, 0, 0))
    biasp = bias[None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B * G, nq),
        in_specs=[
            pl.BlockSpec((1, hg, TILE_Q, D), lambda g, qi: (g, 0, qi, 0)),
            k_spec,
            pl.BlockSpec((1, hg, Mp, D), lambda g, qi: (g, 0, 0, 0)),
            pl.BlockSpec((1, TILE_Q, Mp), lambda g, qi: (0, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, hg, TILE_Q, D), lambda g, qi: (g, 0, qi, 0)),
    )
    out = pl.pallas_call(
        partial(_kern, kmajor=kmajor, unrolled=unrolled),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * G, hg, Np, D), qx.dtype),
    )(qp, kp, vp, biasp)
    return out.reshape(B, H, Np, D)[:, :, :N]


bench(lambda x: attn(x), "baseline batched")
bench(lambda x: attn(x, kmajor=True), "kmajor batched")
bench(lambda x: attn(x, unrolled=True), "unrolled 2D")
bench(lambda x: attn(x, kmajor=True, unrolled=True), "kmajor unrolled 2D")
