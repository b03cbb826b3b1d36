"""Microbenchmark: fused cosine attention kernel variants at serving
shapes (batch-2 decode => B=4 CFG batch). On-device lax.scan repeat
loop; sync by scalar materialization (axon gotchas, docs/PERF_NOTES.md).

Run: python scripts_dev/attn_probe.py [reps] [B]
"""
import os
import sys
import time

# script lives in scripts_dev/; repo root must be importable (NOT via
# PYTHONPATH, which breaks axon plugin discovery — see verify skill)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bevgen_tpu.ops.pallas.fused_attention import fused_cosine_attention_fwd

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
H, N, D = 16, 1792, 64
M = N

rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(0, 1, (B, H, N, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(0, 1, (B, H, M, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(0, 1, (B, H, M, D)), jnp.bfloat16)
null_kv = jnp.asarray(rng.normal(0, 1, (2, H, 1, D)), jnp.float32)
qs = jnp.ones((D,), jnp.float32)
ks = jnp.ones((D,), jnp.float32)
bias = jnp.asarray(rng.normal(0, 0.1, (N, M)), jnp.float32)
keep = jnp.ones((B,), jnp.float32)


def bench(fn, name):
    def step(c, _):
        o = fn(c)
        return o, ()
    @jax.jit
    def loop(x):
        out, _ = jax.lax.scan(step, x, None, length=REPS)
        return out
    o = loop(q)
    np.asarray(o[0, 0, 0, 0])  # sync
    t0 = time.perf_counter()
    o = loop(q)
    np.asarray(o[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / REPS * 1e3
    flops = 2 * 2 * B * H * N * M * D
    print(f"{name:30s} {dt:8.3f} ms/call   {flops/dt/1e9:7.1f} GFLOP/s")
    return dt


bench(lambda x: fused_cosine_attention_fwd(
    x, k, v, null_kv, qs, ks, bias, keep), "fused cosine (current)")
bench(lambda x: fused_cosine_attention_fwd(
    x, k, v, null_kv, qs, ks, bias, keep, tile_q=256, head_group=4),
    "tile_q=256 hg=4")
bench(lambda x: fused_cosine_attention_fwd(
    x, k, v, null_kv, qs, ks, bias, keep, tile_q=256, head_group=2),
    "tile_q=256 hg=2")
bench(lambda x: fused_cosine_attention_fwd(
    x, k, v, null_kv, qs, ks, bias, keep, tile_q=512, head_group=2),
    "tile_q=512 hg=2")

# ---- diagnostic: same kernel with softmax stages ablated ----
import math
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bevgen_tpu.ops.pallas import fused_attention as fa


def _diag_kernel(keep_ref, q_ref, k_ref, v_ref, null_ref, scale_ref,
                 bias_ref, o_ref, *, sm_scale, m_real, has_bias,
                 groups_per_batch, mode):
    b = pl.program_id(0) // groups_per_batch
    mp = k_ref.shape[2]
    qsc = scale_ref[0].astype(jnp.float32)
    qq = (fa._l2n(q_ref[0].astype(jnp.float32)) * qsc).astype(o_ref.dtype)
    kk = k_ref[0]
    s = jax.lax.dot_general(qq, kk, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * sm_scale
    if has_bias:
        s = s + bias_ref[0][None]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, mp), 2)
    valid = (col < m_real) & (keep_ref[b] > 0)
    s = jnp.where(valid, s, fa.NEG_INF)
    if mode == "nosoftmax":
        p = s * 0.001
    elif mode == "nomax":
        e = jnp.exp(s - 20.0)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
    elif mode == "exp2":
        LOG2E = 1.4426950408889634
        m_ = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2((s - m_) * LOG2E)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
    else:  # full (= production minus null column, for comparison)
        m_ = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m_)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def diag_attention(q, k, v, bias, mode, tile=128, head_group=8, tile_q=128):
    B_, H_, N_, D_ = q.shape
    M_ = k.shape[2]
    Np = math.ceil(N_ / tile_q) * tile_q
    Mp = math.ceil(M_ / tile) * tile
    nq = Np // tile_q
    hg = fa._auto_head_group(H_, tile_q, Mp, D_, head_group)
    G = H_ // hg

    def regroup(x, L_):
        return x.reshape(B_ * G, hg, L_, D_)

    ksf = jnp.ones((D_,), jnp.float32)
    kf = k
    qp = regroup(fa._pad_to(q, Np, 2), Np)
    kp = regroup(fa._pad_to(kf, Mp, 2), Mp)
    vp = regroup(fa._pad_to(v, Mp, 2), Mp)
    nkv = jnp.zeros((G, hg, 2, D_), jnp.float32)
    scales = jnp.stack([jnp.ones((D_,), jnp.float32), ksf])
    biasp = fa._pad_to(fa._pad_to(bias[None], Mp, 2), Np, 1)
    keep_arr = jnp.ones((B_,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B_ * G, nq),
        in_specs=[
            pl.BlockSpec((1, hg, tile_q, D_), lambda g, qi, kk_: (g, 0, qi, 0)),
            pl.BlockSpec((1, hg, Mp, D_), lambda g, qi, kk_: (g, 0, 0, 0)),
            pl.BlockSpec((1, hg, Mp, D_), lambda g, qi, kk_: (g, 0, 0, 0)),
            pl.BlockSpec((1, hg, 2, D_), lambda g, qi, kk_, G=G: (g % G, 0, 0, 0)),
            pl.BlockSpec((2, D_), lambda g, qi, kk_: (0, 0)),
            pl.BlockSpec((1, tile_q, Mp), lambda g, qi, kk_: (0, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, hg, tile_q, D_),
                               lambda g, qi, kk_: (g, 0, qi, 0)),
    )
    out = pl.pallas_call(
        partial(_diag_kernel, sm_scale=8.0, m_real=M_, has_bias=True,
                groups_per_batch=G, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B_ * G, hg, Np, D_), q.dtype),
    )(keep_arr, qp, kp, vp, nkv, scales, biasp)
    return out.reshape(B_, H_, Np, D_)[:, :, :N_]


for mode in ("full", "nosoftmax", "nomax", "exp2"):
    bench(lambda x, m=mode: diag_attention(x, k, v, bias, m),
          f"diag {mode}")

# ---- XLA dense comparison at serving shapes ----
from bevgen_tpu.ops.pallas.fused_attention import (_dense_cosine,
                                                   make_cosine_attention)

dense_full = make_cosine_attention(sm_scale=8.0, use_pallas=False)
bench(lambda x: dense_full(x, k, v, null_kv, qs, ks, bias, keep),
      "XLA dense (prologue+attn)")

biasp = jnp.pad(bias, ((0, 0), (1, 0)))
kc = jnp.concatenate([jnp.zeros((B, H, 1, D), k.dtype), k], axis=2)
vc = jnp.concatenate([jnp.zeros((B, H, 1, D), v.dtype), v], axis=2)
bench(lambda x: _dense_cosine(x, kc, vc, biasp, keep, 8.0),
      "XLA dense (attn only)")
