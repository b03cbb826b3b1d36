"""Probe: int8 QK^T / AV inside the fused cosine-attention kernel.

PERF_NOTES leaves "int8 inside the attention kernel" as the last open
serving-perf item: v5e's int8 MXU is double-rate (394 TOP/s vs 197
TFLOP/s bf16), and the kernel is matmul-bound at poor occupancy (K=64
contraction). This measures whether int8 operands actually buy time at
serving shapes, including the in-kernel quantize/dequantize overhead:

  variants:
    bf16       — production math (diag kernel, no null column)
    int8-qk    — QK^T in int8 (q quantized per-row in-kernel, k
                 quantized per-head outside), AV stays bf16
    int8-qk-av — both matmuls int8 (softmax probs requantized to int8
                 at fixed scale 127)

Accuracy is also reported (max |delta| and cosine similarity vs fp32
reference) — per-row q scales + per-head k/v scales.

Run: python scripts_dev/attn_probe_int8.py [reps] [B]
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
INTERPRET = os.environ.get("PROBE_INTERPRET", "0") == "1"
if INTERPRET:
    B, H, N, D = 1, 4, 256, 64
else:
    H, N, D = 16, 1792, 64
M = N

rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(0, 1, (B, H, N, D)), jnp.bfloat16)
k_raw = rng.normal(0, 1, (B, H, M, D))
k_raw /= np.linalg.norm(k_raw, axis=-1, keepdims=True)
k = jnp.asarray(k_raw, jnp.bfloat16)          # pre-normalized, like prod
v = jnp.asarray(rng.normal(0, 1, (B, H, M, D)), jnp.bfloat16)
bias = jnp.asarray(rng.normal(0, 0.1, (N, M)), jnp.float32)
SM = 8.0


def _kernel(keep_ref, q_ref, k_ref, v_ref, kscale_ref, vscale_ref,
            bias_ref, o_ref, *, sm_scale, m_real, groups_per_batch, mode):
    mp = k_ref.shape[2]
    qq = fa._l2n(q_ref[0].astype(jnp.float32))            # (hg, T, D)

    if mode == "bf16":
        s = jax.lax.dot_general(qq.astype(jnp.bfloat16), k_ref[0],
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
    else:
        dq = jnp.max(jnp.abs(qq), axis=-1, keepdims=True) / 127.0
        q8 = jnp.round(qq / dq).astype(jnp.int8)
        s32 = jax.lax.dot_general(q8, k_ref[0],
                                  (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.int32)
        dk = kscale_ref[0].astype(jnp.float32)            # (hg, 1, 1)
        s = s32.astype(jnp.float32) * dq * dk

    s = s * sm_scale + bias_ref[0][None]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, mp), 2)
    s = jnp.where(col < m_real, s, fa.NEG_INF)
    m_ = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m_)
    denom = jnp.sum(e, axis=-1, keepdims=True)

    if mode == "int8-qk-av":
        p8 = jnp.round(e * 127.0).astype(jnp.int8)
        o32 = jax.lax.dot_general(p8, v_ref[0],
                                  (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.int32)
        dv = vscale_ref[0].astype(jnp.float32)            # (hg, 1, 1)
        out = o32.astype(jnp.float32) * (dv / 127.0) / denom
    else:
        p = (e / denom).astype(jnp.bfloat16)
        out = jax.lax.dot_general(p, v_ref[0],
                                  (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def probe_attention(q, k, v, bias, mode, tile=128, head_group=8,
                    tile_q=128):
    B_, H_, N_, D_ = q.shape
    M_ = k.shape[2]
    Np = math.ceil(N_ / tile_q) * tile_q
    Mp = math.ceil(M_ / tile) * tile
    nq = Np // tile_q
    hg = fa._auto_head_group(H_, tile_q, Mp, D_, head_group)
    G = H_ // hg

    def regroup(x, L_):
        return x.reshape(B_ * G, hg, L_, *x.shape[3:])

    qp = regroup(fa._pad_to(q, Np, 2), Np)
    vf = v.astype(jnp.float32)
    if mode == "bf16":
        kp = regroup(fa._pad_to(k, Mp, 2), Mp)
        vp = regroup(fa._pad_to(v, Mp, 2), Mp)
        ks = jnp.ones((B_ * G, hg, 1, 1), jnp.float32)
        vs = jnp.ones((B_ * G, hg, 1, 1), jnp.float32)
    else:
        kf = k.astype(jnp.float32)
        dk = jnp.max(jnp.abs(kf), axis=(2, 3), keepdims=True) / 127.0
        k8 = jnp.round(kf / dk).astype(jnp.int8)
        kp = regroup(fa._pad_to(k8, Mp, 2), Mp)
        ks = regroup(dk, 1)
        dv = jnp.max(jnp.abs(vf), axis=(2, 3), keepdims=True) / 127.0
        v8 = jnp.round(vf / dv).astype(jnp.int8)
        if mode == "int8-qk-av":
            vp = regroup(fa._pad_to(v8, Mp, 2), Mp)
        else:
            vp = regroup(fa._pad_to(v, Mp, 2), Mp)
        vs = regroup(dv, 1)
    biasp = fa._pad_to(fa._pad_to(bias[None], Mp, 2), Np, 1)
    keep_arr = jnp.ones((B_,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B_ * G, nq),
        in_specs=[
            pl.BlockSpec((1, hg, tile_q, D_), lambda g, qi, kk: (g, 0, qi, 0)),
            pl.BlockSpec((1, hg, Mp, D_), lambda g, qi, kk: (g, 0, 0, 0)),
            pl.BlockSpec((1, hg, Mp, D_), lambda g, qi, kk: (g, 0, 0, 0)),
            pl.BlockSpec((1, hg, 1, 1), lambda g, qi, kk: (g, 0, 0, 0)),
            pl.BlockSpec((1, hg, 1, 1), lambda g, qi, kk: (g, 0, 0, 0)),
            pl.BlockSpec((1, tile_q, Mp), lambda g, qi, kk: (0, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, hg, tile_q, D_),
                               lambda g, qi, kk: (g, 0, qi, 0)),
    )
    out = pl.pallas_call(
        partial(_kernel, sm_scale=SM, m_real=M_, groups_per_batch=G,
                mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B_ * G, hg, Np, D_), q.dtype),
        interpret=INTERPRET,
    )(keep_arr, qp, kp, vp, ks, vs, biasp)
    return out.reshape(B_, H_, Np, D_)[:, :, :N_]


def bench(fn, name):
    def step(c, _):
        return fn(c), ()

    @jax.jit
    def loop(x):
        out, _ = jax.lax.scan(step, x, None, length=REPS)
        return out

    o = loop(q)
    np.asarray(o[0, 0, 0, 0])  # sync (axon: scalar materialization)
    t0 = time.perf_counter()
    o = loop(q)
    np.asarray(o[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / REPS * 1e3
    flops = 2 * 2 * B * H * N * M * D
    print(f"{name:16s} {dt:8.3f} ms/call  {flops/dt/1e9:8.1f} GFLOP/s-equiv")
    return dt


# fp32 reference for accuracy
def ref_out():
    qq = np.asarray(q, np.float32)
    qq /= np.maximum(np.linalg.norm(qq, axis=-1, keepdims=True), 1e-12)
    kk = np.asarray(k, np.float32)
    s = np.einsum("bhid,bhjd->bhij", qq, kk) * SM + np.asarray(bias)
    s -= s.max(-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhij,bhjd->bhid", p, np.asarray(v, np.float32))


print(f"B={B} H={H} N=M={N} D={D} reps={REPS}")
ref = ref_out()
for mode in ("bf16", "int8-qk", "int8-qk-av"):
    try:
        out = np.asarray(probe_attention(q, k, v, bias, mode),
                         np.float32)
        err = np.abs(out - ref).max()
        cos = (out.ravel() @ ref.ravel()) / (
            np.linalg.norm(out) * np.linalg.norm(ref))
        print(f"{mode:16s} max|d|={err:.4f} cos={cos:.6f}")
        bench(lambda x, m=mode: probe_attention(x, k, v, bias, m), mode)
    except Exception as e:  # noqa: BLE001 — probe reports and moves on
        import traceback
        if INTERPRET:
            traceback.print_exc()
        print(f"{mode:16s} FAILED: {type(e).__name__}: {e}")
