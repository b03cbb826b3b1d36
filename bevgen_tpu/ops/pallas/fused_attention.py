"""Fused dense attention with shared additive bias — Pallas TPU kernel.

The MUSE decode's hot op: softmax(sm_scale * q k^T + bias) v, where the
bias (camera bias) is SHARED across batch and heads. XLA materializes
the (B, H, N, M) fp32 score tensor in HBM (~1.6 GB at decode shapes,
measured ~3.2 ms/layer of pure softmax/memory overhead); this kernel
keeps each (128, M) score strip in VMEM and reads the bias strip once
per q-tile — per-(b,h) traffic is just q/k/v/out.

Also handles the CFG null-conditioning mask: per-sample `keep` flags
gate all context columns except the null-KV column 0
(transformer.py CosineAttention semantics).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(keep_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
            *, sm_scale: float, m_real: int, has_bias: bool, tile: int,
            groups_per_batch: int):
    """Grid (B*G, Nq): a GROUP of heads of one batch element's q-tile
    per step — amortizes grid/dispatch overhead vs a (B*H,) grid
    (measured slower than XLA end-to-end) while staying inside the
    16MB VMEM budget (all 16 heads at once OOMs at decode shapes)."""
    b = pl.program_id(0) // groups_per_batch
    mp = k_ref.shape[2]

    q = q_ref[0].astype(jnp.float32)                     # (H, T, D)
    k = k_ref[0].astype(jnp.float32)                     # (H, Mp, D)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # (H,T,Mp)
    s = s * sm_scale
    if has_bias:
        s = s + bias_ref[0][None]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, mp), 2)
    keep_b = keep_ref[b]
    valid = (col < m_real) & ((keep_b > 0) | (col == 0))
    s = jnp.where(valid, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / denom
    v = v_ref[0].astype(jnp.float32)                     # (H, Mp, D)
    out = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    cfgs = [(0, 0)] * x.ndim
    cfgs[axis] = (0, pad)
    return jnp.pad(x, cfgs)


def _auto_head_group(H: int, tile_q: int, Mp: int, D: int,
                     requested: int, budget_bytes: int = 15 << 20) -> int:
    """Largest head group (divisor of H, <= requested) whose working set
    (exp/prob score strips f32 + double-buffered K/V bf16) fits the
    ~16MB VMEM scoped limit with headroom."""
    per_head = tile_q * Mp * 4 * 2 + 2 * Mp * D * 2 * 2
    fixed = tile_q * Mp * 4 * 2  # bias strip (double buffered)
    hg = math.gcd(requested, H)
    while hg > 1 and hg * per_head + fixed > budget_bytes:
        hg //= 2
    return max(hg, 1)


def fused_bias_attention_fwd(q, k, v, bias=None, keep=None,
                             sm_scale: float = 1.0, tile: int = 128,
                             head_group: int = 8, tile_q: int = 128,
                             interpret: bool = False):
    """q: (B, H, N, D); k, v: (B, H, M, D) (null KV already included at
    column 0 if used); bias: (N, M) fp32 shared or None; keep: (B,)
    bool/int or None. Returns (B, H, N, D)."""
    B, H, N, D = q.shape
    M = k.shape[2]
    Np = math.ceil(N / tile_q) * tile_q
    Mp = math.ceil(M / tile) * tile
    nq = Np // tile_q
    hg = _auto_head_group(H, tile_q, Mp, D, head_group)
    G = H // hg

    def regroup(x, L_):
        return x.reshape(B * G, hg, L_, D)

    qp = regroup(_pad_to(q, Np, 2), Np)
    kp = regroup(_pad_to(k, Mp, 2), Mp)
    vp = regroup(_pad_to(v, Mp, 2), Mp)
    has_bias = bias is not None
    if has_bias:
        biasp = _pad_to(_pad_to(jnp.asarray(bias, jnp.float32)[None],
                                Mp, 2), Np, 1)
    else:
        biasp = jnp.zeros((1, tile_q, Mp), jnp.float32)
    keep_arr = (jnp.ones((B,), jnp.int32) if keep is None
                else jnp.asarray(keep).astype(jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * G, nq),
        in_specs=[
            pl.BlockSpec((1, hg, tile_q, D), lambda g, qi, kk: (g, 0, qi, 0)),
            pl.BlockSpec((1, hg, Mp, D), lambda g, qi, kk: (g, 0, 0, 0)),
            pl.BlockSpec((1, hg, Mp, D), lambda g, qi, kk: (g, 0, 0, 0)),
            (pl.BlockSpec((1, tile_q, Mp), lambda g, qi, kk: (0, qi, 0))
             if has_bias else
             pl.BlockSpec((1, tile_q, Mp), lambda g, qi, kk: (0, 0, 0))),
        ],
        out_specs=pl.BlockSpec((1, hg, tile_q, D),
                               lambda g, qi, kk: (g, 0, qi, 0)),
    )
    out = pl.pallas_call(
        partial(_kernel, sm_scale=sm_scale, m_real=M, has_bias=has_bias,
                tile=tile, groups_per_batch=G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * G, hg, Np, D), q.dtype),
        interpret=interpret,
    )(keep_arr, qp, kp, vp, biasp)
    return out.reshape(B, H, Np, D)[:, :, :N]


def _bwd_kernel(keep_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref,
                *, sm_scale: float, m_real: int, has_bias: bool,
                groups_per_batch: int):
    """Backward: recompute the softmax row strip per (group, q-tile),
    then dq directly; dk/dv accumulated across q-tiles (output block
    revisited with qi innermost); dbias accumulated across groups."""
    g = pl.program_id(0)
    qi = pl.program_id(1)
    b = g // groups_per_batch
    mp = k_ref.shape[2]

    q = q_ref[0].astype(jnp.float32)                      # (H, T, D)
    k = k_ref[0].astype(jnp.float32)                      # (H, Mp, D)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)                    # (H, T, D)

    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * sm_scale
    if has_bias:
        s = s + bias_ref[0][None]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, mp), 2)
    keep_b = keep_ref[b]
    valid = (col < m_real) & ((keep_b > 0) | (col == 0))
    s = jnp.where(valid, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)            # (H, T, Mp)

    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta)                                 # (H, T, Mp)
    ds = jnp.where(valid, ds, 0.0)

    dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = (dq * sm_scale).astype(dq_ref.dtype)

    dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)  # (H,Mp,D)
    dv = jax.lax.dot_general(p, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)

    @pl.when(qi == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += (dk * sm_scale).astype(dk_ref.dtype)
    dv_ref[0] += dv.astype(dv_ref.dtype)

    if has_bias:
        @pl.when(g == 0)
        def _():
            dbias_ref[0] = jnp.zeros_like(dbias_ref[0])
        dbias_ref[0] += jnp.sum(ds, axis=0)


def fused_bias_attention_bwd(q, k, v, bias, keep, do,
                             sm_scale: float = 1.0, tile: int = 128,
                             head_group: int = 4, tile_q: int = 128,
                             interpret: bool = False):
    """Gradients (dq, dk, dv, dbias) for fused_bias_attention_fwd."""
    B, H, N, D = q.shape
    M = k.shape[2]
    Np = math.ceil(N / tile_q) * tile_q
    Mp = math.ceil(M / tile) * tile
    nq = Np // tile_q
    # backward holds ~4 score strips (s/p/dp/ds) + dk/dv accumulators
    per_head = tile_q * Mp * 4 * 4 + 2 * Mp * D * 4 + 3 * Mp * D * 2 * 2
    hg = math.gcd(head_group, H)
    while hg > 1 and hg * per_head > (10 << 20):
        hg //= 2
    G = H // hg

    def regroup(x, L_):
        return x.reshape(B * G, hg, L_, D)

    qp = regroup(_pad_to(q, Np, 2), Np)
    kp = regroup(_pad_to(k, Mp, 2), Mp)
    vp = regroup(_pad_to(v, Mp, 2), Mp)
    dop = regroup(_pad_to(do, Np, 2), Np)
    has_bias = bias is not None
    if has_bias:
        biasp = _pad_to(_pad_to(jnp.asarray(bias, jnp.float32)[None],
                                Mp, 2), Np, 1)
    else:
        biasp = jnp.zeros((1, tile_q, Mp), jnp.float32)
    keep_arr = (jnp.ones((B,), jnp.int32) if keep is None
                else jnp.asarray(keep).astype(jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * G, nq),
        in_specs=[
            pl.BlockSpec((1, hg, tile_q, D), lambda g, qi, kk: (g, 0, qi, 0)),
            pl.BlockSpec((1, hg, Mp, D), lambda g, qi, kk: (g, 0, 0, 0)),
            pl.BlockSpec((1, hg, Mp, D), lambda g, qi, kk: (g, 0, 0, 0)),
            (pl.BlockSpec((1, tile_q, Mp), lambda g, qi, kk: (0, qi, 0))
             if has_bias else
             pl.BlockSpec((1, tile_q, Mp), lambda g, qi, kk: (0, 0, 0))),
            pl.BlockSpec((1, hg, tile_q, D), lambda g, qi, kk: (g, 0, qi, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, hg, tile_q, D), lambda g, qi, kk: (g, 0, qi, 0)),
            pl.BlockSpec((1, hg, Mp, D), lambda g, qi, kk: (g, 0, 0, 0)),
            pl.BlockSpec((1, hg, Mp, D), lambda g, qi, kk: (g, 0, 0, 0)),
            pl.BlockSpec((1, tile_q, Mp), lambda g, qi, kk: (0, qi, 0)),
        ),
    )
    dq, dk, dv, dbias = pl.pallas_call(
        partial(_bwd_kernel, sm_scale=sm_scale, m_real=M,
                has_bias=has_bias, groups_per_batch=G),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B * G, hg, Np, D), jnp.float32),
            jax.ShapeDtypeStruct((B * G, hg, Mp, D), jnp.float32),
            jax.ShapeDtypeStruct((B * G, hg, Mp, D), jnp.float32),
            jax.ShapeDtypeStruct((1, Np, Mp), jnp.float32),
        ),
        interpret=interpret,
    )(keep_arr, qp, kp, vp, biasp, dop)

    dq = dq.reshape(B, H, Np, D)[:, :, :N].astype(q.dtype)
    dk = dk.reshape(B, H, Mp, D)[:, :, :M].astype(k.dtype)
    dv = dv.reshape(B, H, Mp, D)[:, :, :M].astype(v.dtype)
    dbias = dbias[0, :N, :M] if has_bias else None
    return dq, dk, dv, dbias


def _dense_reference(q, k, v, bias, keep, sm_scale):
    s = jnp.einsum("bhid,bhjd->bhij", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    if bias is not None:
        s = s + jnp.asarray(bias, jnp.float32)[None, None]
    if keep is not None:
        M = k.shape[2]
        col = jnp.arange(M)
        valid = (keep[:, None] > 0) | (col[None] == 0)
        s = jnp.where(valid[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def make_fused_attention(sm_scale: float = 1.0, use_pallas: Optional[bool] = None):
    """attn(q, k, v, bias, keep) with Pallas forward on TPU and dense
    XLA backward (generation is forward-only; training falls back to
    the dense path for gradients)."""

    @jax.custom_vjp
    def attn(q, k, v, bias, keep):
        return fused_bias_attention_fwd(q, k, v, bias, keep,
                                        sm_scale=sm_scale)

    def fwd(q, k, v, bias, keep):
        return attn(q, k, v, bias, keep), (q, k, v, bias, keep)

    def bwd(res, g):
        q, k, v, bias, keep = res
        if jax.default_backend() == "tpu":
            dq, dk, dv, dbias = fused_bias_attention_bwd(
                q, k, v, bias, keep, g.astype(q.dtype), sm_scale=sm_scale)
            return dq, dk, dv, dbias, jnp.zeros_like(keep)
        def dense(q, k, v, bias):
            return _dense_reference(q, k, v, bias, keep, sm_scale)
        _, vjp = jax.vjp(dense, q, k, v, bias)
        dq, dk, dv, dbias = vjp(g)
        return dq, dk, dv, dbias, jnp.zeros_like(keep)

    attn.defvjp(fwd, bwd)

    def dispatch(q, k, v, bias=None, keep=None):
        on_tpu = jax.default_backend() == "tpu"
        use = use_pallas if use_pallas is not None else on_tpu
        if not use:
            return _dense_reference(q, k, v, bias, keep, sm_scale)
        # custom_vjp args must be arrays: substitute a zero bias / all-keep
        N, M = q.shape[2], k.shape[2]
        bias_arr = (jnp.zeros((N, M), jnp.float32) if bias is None
                    else jnp.asarray(bias, jnp.float32))
        keep_arr = (jnp.ones((q.shape[0],), jnp.float32) if keep is None
                    else jnp.asarray(keep).astype(jnp.float32))
        return attn(q, k, v, bias_arr, keep_arr)

    return dispatch
