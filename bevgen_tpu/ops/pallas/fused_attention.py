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
        # bias=None threads through the custom_vjp as an empty pytree —
        # the kernels skip every bias read and the dbias pass, instead
        # of billing dead gradient work for a zeros stand-in
        bias_arr = None if bias is None else jnp.asarray(bias, jnp.float32)
        keep_arr = (jnp.ones((q.shape[0],), jnp.float32) if keep is None
                    else jnp.asarray(keep).astype(jnp.float32))
        return attn(q, k, v, bias_arr, keep_arr)

    return dispatch

# ---------------------------------------------------------------------------
# fully-fused cosine attention: l2norm + learned scales + null KV in-kernel
# ---------------------------------------------------------------------------


def _l2n(x, eps=1e-12):
    n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(n, eps)


def _qknorm_kernel(keep_ref, q_ref, k_ref, v_ref, null_ref, scale_ref,
                   bias_ref, o_ref,
                   *, sm_scale: float, m_real: int, has_bias: bool,
                   groups_per_batch: int):
    """Cosine attention with the q-side prologue and the null KV column
    fused: raw q is l2-normalized (fp32) and scaled in VMEM; the null
    column (muse_maskgit_pytorch.py:150-156) is folded into the softmax
    algebra instead of being concatenated onto K/V in HBM. K arrives
    pre-normalized from one cheap XLA elementwise pass (normalizing K
    in-kernel needs either a per-q-tile recompute — a cross-lane
    reduction, measured +10 ms/call — or a VMEM scratch cache that
    forces the head group down to 2, measured +2.6 ms/call). Column 0
    of the reference layout (the null column) carries no bias and
    ignores the CFG keep flag."""
    b = pl.program_id(0) // groups_per_batch
    mp = k_ref.shape[2]

    qsc = scale_ref[0].astype(jnp.float32)               # (D,)
    q = (_l2n(q_ref[0].astype(jnp.float32)) * qsc).astype(o_ref.dtype)
    k = k_ref[0]                                         # (H, Mp, D) normed
    nk = null_ref[0, :, 0:1].astype(o_ref.dtype)         # (H, 1, D) normed
    nv = null_ref[0, :, 1:2].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * sm_scale
    if has_bias:
        s = s + bias_ref[0][None]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, mp), 2)
    keep_b = keep_ref[b]
    valid = (col < m_real) & (keep_b > 0)
    s = jnp.where(valid, s, NEG_INF)

    # null column: score q.nk * sm_scale, zero bias, always visible
    s_null = jax.lax.dot_general(q, nk, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    s_null = s_null * sm_scale                            # (H, T, 1)

    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_null)
    e = jnp.exp(s - m)
    e_null = jnp.exp(s_null - m)                          # (H, T, 1)
    denom = jnp.sum(e, axis=-1, keepdims=True) + e_null
    # p @ V on bf16 operands (the XLA reference also casts the probs
    # to the compute dtype before AV — transformer.py:136-138)
    out = jax.lax.dot_general(e.astype(v_ref.dtype), v_ref[0],
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    out = (out + e_null * nv) / denom
    o_ref[0] = out.astype(o_ref.dtype)


def _qknorm_kernel_fb(keep_ref, q_ref, k_ref, v_ref, null_ref,
                      scale_ref, bias_ref, rb_ref, o_ref,
                      *, groups_per_batch: int):
    """Fixed-bound softmax cosine kernel — the VPU-minimal variant.

    Same math as _qknorm_kernel, but softmax normalization uses a
    PRECOMPUTED per-row upper bound instead of the in-kernel running
    max: every term is exp(s - rowbound) with
    rowbound[n] >= max_m(s[n, m]) by construction
    (sm_scale * max_d|q_scale_d * k_scale_d| bounds the cosine term —
    Cauchy-Schwarz on unit vectors — plus the bias row max, computed
    once per call in XLA). Uniform scaling cancels exactly in the
    out = acc / denom division, and fp32 cannot underflow at the bound
    gap this model can produce (<= ~40 -> e >= 1e-18), so the kernel is
    numerically the same attention.

    What that buys on the VPU (the measured bottleneck at batch 16 —
    the strip kernel spends ~10 elementwise passes over the
    B*H*N*M-element score strip): the scale-mul is folded into q_scale,
    the padding/CFG masking into the precomputed bias strip (padded
    columns carry NEG_INF; the CFG keep flag becomes one scalar add),
    and the max-reduce/renormalize disappear. Remaining passes:
    add(bias), add(keep scalar), exp, sum-reduce, cast — ~5.

    bias_ref: (1, T, Mp) strip ALREADY holding bias - rowbound with
    NEG_INF padding columns; rb_ref: (1, T) rowbound for the null
    column's exp; scale_ref[0] = q_scale * sm_scale."""
    b = pl.program_id(0) // groups_per_batch

    qsc = scale_ref[0].astype(jnp.float32)               # (D,) * sm_scale
    q = (_l2n(q_ref[0].astype(jnp.float32)) * qsc).astype(o_ref.dtype)
    nk = null_ref[0, :, 0:1].astype(o_ref.dtype)         # (hg, 1, D) normed
    nv = null_ref[0, :, 1:2].astype(jnp.float32)         # (hg, 1, D)

    # (keep - 1) * 1e9: 0 for kept rows, -1e9 on every REAL column of
    # dropped-cond rows (padded columns are already -1e9; the null
    # column never sees it)
    ka = (keep_ref[b].astype(jnp.float32) - 1.0) * 1e9

    s = jax.lax.dot_general(q, k_ref[0], (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    e = jnp.exp(s + (bias_ref[0][None] + ka))            # (hg, T, Mp)

    s_null = jax.lax.dot_general(q, nk, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    e_null = jnp.exp(s_null - rb_ref[0][None])           # (hg, T, 1)

    denom = jnp.sum(e, axis=-1, keepdims=True) + e_null
    out = jax.lax.dot_general(e.astype(v_ref.dtype), v_ref[0],
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    o_ref[0] = ((out + e_null * nv) / denom).astype(o_ref.dtype)


LOG2E = 1.4426950408889634


def _qknorm_kernel_fb2(keep_ref, q_ref, k_ref, v_ref, null_ref,
                       scale_ref, bias_ref, rb_ref, o_ref,
                       *, d_model: int, groups_per_batch: int):
    """fb variant with the two remaining heavy strip passes moved off
    the VPU:

    * exp -> exp2: log2(e) is folded into the q-side scales and the
      precomputed bias strip host-side, so the kernel's transcendental
      is a bare exp2 with no multiply pass over the (hg, T, Mp) strip.
    * the softmax denominator comes out of the MXU instead of a
      cross-lane VPU sum-reduce: a ones-column is appended to V
      IN-KERNEL (a VMEM-resident copy, ~nothing), so e @ [V | 1]
      yields AV and the per-row sum in ONE dot — the AV output at
      D=64 fills half the 128 MXU lanes, so the extra column is free
      on the MXU. V arrives RAW from HBM (round 3 built [V | 1 | 0pad]
      host-side, which cost a full concat+convert pass over V in HBM
      per call — measured 182 ms/b16-generate — plus 12% more V
      traffic; moving the append into VMEM removes both).

    Remaining strip passes: add(bias) + add(keep scalar) + exp2 +
    cast — the minimum this softmax can express.

    Numerics: identical attention up to summation order; on bf16
    inputs the denominator picks up bf16-term rounding (~2^-9
    relative), the same order as the AV numerator already has. With
    fp32 v (tests/interpret) both stay fp32-exact."""
    b = pl.program_id(0) // groups_per_batch

    qsc = scale_ref[0].astype(jnp.float32)    # q_scale * sm_scale * LOG2E
    q = (_l2n(q_ref[0].astype(jnp.float32)) * qsc).astype(o_ref.dtype)
    nk = null_ref[0, :, 0:1].astype(o_ref.dtype)         # (hg, 1, D) normed
    nv = null_ref[0, :, 1:2].astype(jnp.float32)         # (hg, 1, D)

    # (keep - 1) * 1e9: 0 for kept rows, -1e9 on every REAL column of
    # dropped-cond rows (padding columns already carry NEG_INF)
    ka = (keep_ref[b].astype(jnp.float32) - 1.0) * 1e9

    s = jax.lax.dot_general(q, k_ref[0], (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    e = jnp.exp2(s + (bias_ref[0][None] + ka))           # (hg, T, Mp)

    s_null = jax.lax.dot_general(q, nk, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    e_null = jnp.exp2(s_null - rb_ref[0][None])          # (hg, T, 1)

    # ones-column appended to V in VMEM (raw V from HBM) — the MXU
    # denominator at zero HBM cost; output lanes pad to 128 either way
    vx = jnp.concatenate(
        [v_ref[0], jnp.ones(v_ref.shape[1:3] + (1,), v_ref.dtype)], -1)
    ov = jax.lax.dot_general(e.astype(vx.dtype), vx,
                             (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    num = ov[..., :d_model] + e_null * nv
    den = ov[..., d_model:d_model + 1] + e_null
    o_ref[0] = (num / den).astype(o_ref.dtype)


def _qknorm_kernel_fb2c(keep_ref, q_ref, k_ref, v_ref, null_ref,
                        scale_ref, bias_ref, rb_ref, o_ref,
                        *, d_model: int, groups_per_batch: int, chunk: int):
    """fb2 with CHUNKED score strips — the batch-16 kernel.

    Identical math to _qknorm_kernel_fb2 (fixed-bound exp2 softmax,
    MXU-summed denominator), but the (hg, T, Mp) score strip is never
    materialized: K/V stay resident for the grid row and the strip is
    computed `chunk` columns at a time with a PLAIN accumulation —
    the fixed bound makes every exp2 term final (no running max, no
    alpha-rescale recurrence that sank the round-2 chunked kernel).
    The chunk loop is a static-trip fori_loop (NOT a Python unroll —
    see the comment at the loop: unrolling keeps every chunk's fp32
    score transient live at once and blows the VMEM budget).

    Shrinking the transient from O(Mp) to O(chunk) is what lets the
    head group DOUBLE (4 -> 8 at decode shapes). The shared camera-bias
    strip is re-fetched once per (batch, group), so its HBM traffic is
    B * G * N * M * bytes — at batch 16 the dominant kernel cost
    (measured ~0.95 GB/layer-call at G=4 fp32). hg=8 halves it; the
    strip additionally arrives as BF16 (halving it again): the bias is
    stored as biasfb = (bias - rowbound) * log2(e), whose significant
    values (the columns that dominate the softmax) sit near 0 where
    bf16 ABSOLUTE error is ~2^-9 * |value| — the resulting weight
    error lands well inside the bf16 tolerance the pipeline already
    carries (tests/test_fused_attention.py locks this vs fp32 dense).

    v_ref is RAW V (D lanes); the denominator ones-column is appended
    per-chunk in VMEM (see _qknorm_kernel_fb2 — removes the host-side
    concat pass and the widened HBM V traffic of the round-3 layout)."""
    b = pl.program_id(0) // groups_per_batch
    mp = k_ref.shape[2]

    qsc = scale_ref[0].astype(jnp.float32)    # q_scale * sm_scale * LOG2E
    q = (_l2n(q_ref[0].astype(jnp.float32)) * qsc).astype(o_ref.dtype)
    nk = null_ref[0, :, 0:1].astype(o_ref.dtype)         # (hg, 1, D) normed
    nv = null_ref[0, :, 1:2].astype(jnp.float32)         # (hg, 1, D)

    # (keep - 1) * 1e9: 0 for kept rows, -1e9 on every REAL column of
    # dropped-cond rows (padding columns already carry NEG_INF)
    ka = (keep_ref[b].astype(jnp.float32) - 1.0) * 1e9
    # per-row fixed bound applied from the fp32 rb vector — NOT folded
    # into the bf16 strip (quantizing bias - rowbound would magnify the
    # bf16 step by the large common offset; the strip holds only the
    # small centered bias values)
    rbka = ka - rb_ref[0]                                # (T, 1)

    s_null = jax.lax.dot_general(q, nk, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    e_null = jnp.exp2(s_null - rb_ref[0][None])          # (hg, T, 1)

    hg, T = q.shape[0], q.shape[1]

    # static-trip fori_loop (NOT a Python unroll: unrolling keeps every
    # chunk's fp32 score transient live at once — measured 16.02MB VMEM
    # at hg=8/chunk=256, over the 16MB scoped limit). No recurrence
    # hazards here: the accumulation is order-free (fixed bound) and
    # the out block is written once per grid step (no revisits).
    def step(ci, acc):
        off = ci * chunk
        kc = k_ref[0, :, pl.ds(off, chunk), :]
        s = jax.lax.dot_general(q, kc, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        bc = bias_ref[0, :, pl.ds(off, chunk)].astype(jnp.float32)
        e = jnp.exp2(s + (bc[None] + rbka[None]))        # (hg, T, chunk)
        vc = v_ref[0, :, pl.ds(off, chunk), :]
        vx = jnp.concatenate(
            [vc, jnp.ones(vc.shape[:-1] + (1,), vc.dtype)], -1)
        return acc + jax.lax.dot_general(
            e.astype(vx.dtype), vx, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, mp // chunk, step,
                            jnp.zeros((hg, T, d_model + 1), jnp.float32))

    num = acc[..., :d_model] + e_null * nv
    den = acc[..., d_model:d_model + 1] + e_null
    o_ref[0] = (num / den).astype(o_ref.dtype)


def _vmem_scope_bytes() -> int:
    """VMEM scope to request from the Mosaic compiler on the local
    device. v4/v5/v6-generation chips carry 128MB physical VMEM — scope
    100MB (headroom for the compiler's own buffers); unknown or older
    kinds fall back to the 16MB compiler default so the pallas_call
    degrades to a smaller head group instead of failing at compile."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        kind = ""
    if any(tag in kind for tag in ("v4", "v5", "v6", "v7")):
        return 100 << 20
    return 16 << 20


def _auto_head_group_fb2c(H: int, tile_q: int, Mp: int, D: int,
                          requested: int, chunk: int,
                          budget_bytes: Optional[int] = None) -> int:
    """VMEM-budgeted head group for fb2c: resident K + raw V slabs
    (double-buffered), chunk-sized fp32/bf16 score transients + the
    per-chunk [V|1] concat, fp32 accumulator, q block. The budget
    tracks the scoped VMEM limit actually requested from the compiler
    (44% of it — the measured 16.02MB@hg=8 working set vs the 36MB
    estimate this formula gives, i.e. the formula over-counts ~2.2x
    and 44% keeps hg=8 at decode shapes on a 100MB scope while
    degrading on 16MB-class devices)."""
    if budget_bytes is None:
        budget_bytes = int(_vmem_scope_bytes() * 0.44)
    per_head = (2 * Mp * D * 2                # K, double-buffered
                + 2 * Mp * D * 2              # V raw, double-buffered
                + tile_q * chunk * (4 + 2)    # s fp32 + e bf16 transient
                + chunk * (D + 1) * 2         # per-chunk [V|1] concat
                + tile_q * (D + 1) * 4        # accumulator
                + tile_q * D * (2 * 2 + 4))   # q block dbl-buf + fp32 temp
    fixed = tile_q * Mp * 2 * 2               # bf16 bias strip, dbl-buffered
    hg = math.gcd(requested, H)
    while hg > 1 and hg * per_head + fixed > budget_bytes:
        hg //= 2
    return max(hg, 1)


def fused_cosine_attention_fwd_fb2c(q, k, v, null_kv, q_scale, k_scale,
                                    bias=None, keep=None,
                                    sm_scale: float = 8.0,
                                    tile: int = 128, head_group: int = 8,
                                    tile_q: int = 128, chunk: int = 256,
                                    interpret: bool = False,
                                    k_prenormed: bool = False):
    """Chunked exp2 fixed-bound cosine attention (_qknorm_kernel_fb2c).
    Same contract as the other cosine forwards."""
    B, H, N, D = q.shape
    M = k.shape[2]
    Np = math.ceil(N / tile_q) * tile_q
    Mp = math.ceil(M / tile) * tile
    nq = Np // tile_q
    # the chunk must DIVIDE Mp: largest tile-multiple divisor <= request
    # (clamped up to one tile so a sub-tile request degrades to the
    # minimum legal chunk instead of an empty-sequence max())
    chunk = max(c for c in range(tile, min(max(chunk, tile), Mp) + 1, tile)
                if Mp % c == 0)
    hg = _auto_head_group_fb2c(H, tile_q, Mp, D, head_group, chunk)
    G = H // hg

    def regroup(x, L_, W):
        return x.reshape(B * G, hg, L_, W)

    def l2n_scaled(t, sc):
        n = jnp.sqrt(jnp.sum(jnp.square(t.astype(jnp.float32)), axis=-1,
                             keepdims=True))
        return (t.astype(jnp.float32) / jnp.maximum(n, 1e-12)) * sc

    qsf = jnp.asarray(q_scale, jnp.float32)
    ksf = jnp.asarray(k_scale, jnp.float32)
    kf = k.astype(q.dtype) if k_prenormed else \
        l2n_scaled(k, ksf).astype(q.dtype)
    qp = regroup(_pad_to(q, Np, 2), Np, D)
    kp = regroup(_pad_to(kf, Mp, 2), Mp, D)
    # V raw — the denominator ones-column is appended per-chunk in VMEM
    vp = regroup(_pad_to(v, Mp, 2), Mp, D)
    nkv = jnp.asarray(null_kv, jnp.float32)
    nkv = jnp.stack([l2n_scaled(nkv[0], ksf), nkv[1]])
    nkv = nkv.reshape(2, G, hg, D).transpose(1, 2, 0, 3)  # (G, hg, 2, D)
    scales = jnp.stack([qsf * sm_scale * LOG2E, ksf])     # (2, D)

    cos_bound = sm_scale * jnp.max(jnp.abs(qsf * ksf))
    bias_f = (jnp.zeros((N, M), jnp.float32) if bias is None
              else jnp.asarray(bias, jnp.float32))
    rowbound = cos_bound + jnp.maximum(jnp.max(bias_f, axis=1), 0.0)  # (N,)
    # bf16 strip holding ONLY the centered bias (the per-row rowbound
    # shift is applied in-kernel from the fp32 rb vector — folding it
    # into the strip would magnify the bf16 step by the large common
    # offset). Halves the dominant HBM cost of the kernel.
    biasfb = jnp.pad(bias_f * LOG2E, ((0, Np - N), (0, Mp - M)),
                     constant_values=NEG_INF)[None]       # (1, Np, Mp)
    biasfb = biasfb.astype(jnp.bfloat16)
    rbp = _pad_to(rowbound[None] * LOG2E, Np, 1)[..., None]  # (1, Np, 1)
    keep_arr = (jnp.ones((B,), jnp.int32) if keep is None
                else jnp.asarray(keep).astype(jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * G, nq),
        in_specs=[
            pl.BlockSpec((1, hg, tile_q, D), lambda g, qi, kk: (g, 0, qi, 0)),
            pl.BlockSpec((1, hg, Mp, D), lambda g, qi, kk: (g, 0, 0, 0)),
            pl.BlockSpec((1, hg, Mp, D), lambda g, qi, kk: (g, 0, 0, 0)),
            pl.BlockSpec((1, hg, 2, D),
                         lambda g, qi, kk, G=G: (g % G, 0, 0, 0)),
            pl.BlockSpec((2, D), lambda g, qi, kk: (0, 0)),
            pl.BlockSpec((1, tile_q, Mp), lambda g, qi, kk: (0, qi, 0)),
            pl.BlockSpec((1, tile_q, 1), lambda g, qi, kk: (0, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, hg, tile_q, D),
                               lambda g, qi, kk: (g, 0, qi, 0)),
    )
    out = pl.pallas_call(
        partial(_qknorm_kernel_fb2c, d_model=D, groups_per_batch=G,
                chunk=chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * G, hg, Np, D), q.dtype),
        # the default 16MB scoped-vmem budget is a compiler default, not
        # the v5e's 128MB physical VMEM: hg=8 with the resident K/V
        # slabs measures 16.02MB — raise the scope instead of shrinking
        # the head group (the whole point of this kernel). Derived from
        # the device generation; 16MB-class devices keep the default and
        # _auto_head_group_fb2c shrinks hg to match.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_scope_bytes()),
        interpret=interpret,
    )(keep_arr, qp, kp, vp, nkv, scales, biasfb, rbp)
    return out.reshape(B, H, Np, D)[:, :, :N]


def _auto_head_group_fb2(H: int, tile_q: int, Mp: int, D: int,
                         requested: int,
                         budget_bytes: Optional[int] = None) -> int:
    """VMEM-budgeted head group for fb2: score strip fp32 + bf16 copy
    for the AV dot, double-buffered K and raw V, plus the in-kernel
    [V|1] concat transient. Budget tracks the device-derived scoped
    VMEM limit (44% of it, same calibration as fb2c) — at the 100MB
    scope of v4+ chips the decode shapes run hg=8 (half the grid rows
    and bias re-fetches of the 16MB-default hg=4)."""
    if budget_bytes is None:
        budget_bytes = int(_vmem_scope_bytes() * 0.44)
    per_head = (tile_q * Mp * (4 + 2)        # e fp32 + bf16 cast
                + 2 * Mp * D * 2             # K, double-buffered
                + 2 * Mp * D * 2             # V raw, double-buffered
                + Mp * (D + 1) * 2)          # in-kernel [V|1] transient
    fixed = tile_q * Mp * 4 * 2              # bias strip, double-buffered
    hg = math.gcd(requested, H)
    while hg > 1 and hg * per_head + fixed > budget_bytes:
        hg //= 2
    return max(hg, 1)


def fused_cosine_attention_fwd_fb2(q, k, v, null_kv, q_scale, k_scale,
                                   bias=None, keep=None,
                                   sm_scale: float = 8.0,
                                   tile: int = 128, head_group: int = 8,
                                   tile_q: int = 128,
                                   interpret: bool = False,
                                   k_prenormed: bool = False):
    """exp2 + MXU-denominator fixed-bound cosine attention (see
    _qknorm_kernel_fb2). Same contract as the other cosine forwards."""
    B, H, N, D = q.shape
    M = k.shape[2]
    Np = math.ceil(N / tile_q) * tile_q
    Mp = math.ceil(M / tile) * tile
    nq = Np // tile_q
    # batch-aware head-group budget (all four points TPU-measured,
    # flagship e2e): at b16 the 100MB-scope budget runs self-attn at
    # hg=8 — half the grid rows and bias re-fetches — for +3.9%
    # (17.48 -> 18.16 img/s); at b2/b4 the short B*G grid loses more
    # pipeline fill than the traffic saves (-4.2% / -2.4%; b8 neutral),
    # so small batches keep the legacy 16MB-class budget (self hg=4,
    # cross-attn hg=8 — the previously-measured optimum).
    #
    # The decision deliberately keys on the PER-SHARD batch: grid fill
    # is a per-chip property (the grid has B_local*G rows), so a global
    # b16 run sharded dp=4 puts a B=4-shaped kernel on each chip —
    # exactly the single-chip b4 shape where hg=4 measured faster. A
    # review suggested keying on the global batch instead; that would
    # apply the b16 measurement to a b4-shaped per-chip grid.
    # BEVGEN_FB2_BATCH_MODE=big|small overrides for on-chip A/B probes
    # (scripts_dev sweeps).
    import os
    mode = os.environ.get("BEVGEN_FB2_BATCH_MODE")
    if mode == "big":
        budget = None
    elif mode == "small":
        budget = 15 << 20
    else:
        budget = None if B >= 12 else (15 << 20)
    hg = _auto_head_group_fb2(H, tile_q, Mp, D, head_group, budget)
    G = H // hg

    def regroup(x, L_, W):
        return x.reshape(B * G, hg, L_, W)

    def l2n_scaled(t, sc):
        n = jnp.sqrt(jnp.sum(jnp.square(t.astype(jnp.float32)), axis=-1,
                             keepdims=True))
        return (t.astype(jnp.float32) / jnp.maximum(n, 1e-12)) * sc

    qsf = jnp.asarray(q_scale, jnp.float32)
    ksf = jnp.asarray(k_scale, jnp.float32)
    kf = k.astype(q.dtype) if k_prenormed else \
        l2n_scaled(k, ksf).astype(q.dtype)
    qp = regroup(_pad_to(q, Np, 2), Np, D)
    kp = regroup(_pad_to(kf, Mp, 2), Mp, D)
    # V raw — the denominator ones-column is appended in-kernel (VMEM),
    # so there is no host-side concat pass or widened HBM V traffic
    vp = regroup(_pad_to(v, Mp, 2), Mp, D)
    nkv = jnp.asarray(null_kv, jnp.float32)
    nkv = jnp.stack([l2n_scaled(nkv[0], ksf), nkv[1]])
    nkv = nkv.reshape(2, G, hg, D).transpose(1, 2, 0, 3)  # (G, hg, 2, D)
    # sm_scale AND log2(e) folded into the q-side scales: the kernel's
    # scores and bias are in log2 units, its transcendental a bare exp2
    scales = jnp.stack([qsf * sm_scale * LOG2E, ksf])     # (2, D)

    cos_bound = sm_scale * jnp.max(jnp.abs(qsf * ksf))
    bias_f = (jnp.zeros((N, M), jnp.float32) if bias is None
              else jnp.asarray(bias, jnp.float32))
    rowbound = cos_bound + jnp.maximum(jnp.max(bias_f, axis=1), 0.0)  # (N,)
    biasfb = (bias_f - rowbound[:, None]) * LOG2E
    biasfb = jnp.pad(biasfb, ((0, Np - N), (0, Mp - M)),
                     constant_values=NEG_INF)[None]       # (1, Np, Mp)
    rbp = _pad_to(rowbound[None] * LOG2E, Np, 1)[..., None]  # (1, Np, 1)
    keep_arr = (jnp.ones((B,), jnp.int32) if keep is None
                else jnp.asarray(keep).astype(jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * G, nq),
        in_specs=[
            pl.BlockSpec((1, hg, tile_q, D), lambda g, qi, kk: (g, 0, qi, 0)),
            pl.BlockSpec((1, hg, Mp, D), lambda g, qi, kk: (g, 0, 0, 0)),
            pl.BlockSpec((1, hg, Mp, D), lambda g, qi, kk: (g, 0, 0, 0)),
            pl.BlockSpec((1, hg, 2, D),
                         lambda g, qi, kk, G=G: (g % G, 0, 0, 0)),
            pl.BlockSpec((2, D), lambda g, qi, kk: (0, 0)),
            pl.BlockSpec((1, tile_q, Mp), lambda g, qi, kk: (0, qi, 0)),
            pl.BlockSpec((1, tile_q, 1), lambda g, qi, kk: (0, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, hg, tile_q, D),
                               lambda g, qi, kk: (g, 0, qi, 0)),
    )
    out = pl.pallas_call(
        partial(_qknorm_kernel_fb2, d_model=D, groups_per_batch=G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * G, hg, Np, D), q.dtype),
        # raise the scoped VMEM to the device-derived limit ONLY on the
        # big-batch hg=8 path (it cannot compile under the 16MB
        # default); raising it unconditionally regressed the b2/b3
        # serving rows ~5% even at hg=4 — the compiler appears to trade
        # pipelining decisions against the larger scope
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_scope_bytes())
            if budget is None else pltpu.CompilerParams()),
        interpret=interpret,
    )(keep_arr, qp, kp, vp, nkv, scales, biasfb, rbp)
    return out.reshape(B, H, Np, D)[:, :, :N]


def fused_cosine_attention_fwd_fb(q, k, v, null_kv, q_scale, k_scale,
                                  bias=None, keep=None,
                                  sm_scale: float = 8.0,
                                  tile: int = 128, head_group: int = 8,
                                  tile_q: int = 128,
                                  interpret: bool = False,
                                  k_prenormed: bool = False):
    """Fixed-bound-softmax cosine attention (see _qknorm_kernel_fb).
    Same contract as fused_cosine_attention_fwd_strip."""
    B, H, N, D = q.shape
    M = k.shape[2]
    Np = math.ceil(N / tile_q) * tile_q
    Mp = math.ceil(M / tile) * tile
    nq = Np // tile_q
    hg = _auto_head_group(H, tile_q, Mp, D, head_group)
    G = H // hg

    def regroup(x, L_):
        return x.reshape(B * G, hg, L_, D)

    def l2n_scaled(t, sc):
        n = jnp.sqrt(jnp.sum(jnp.square(t.astype(jnp.float32)), axis=-1,
                             keepdims=True))
        return (t.astype(jnp.float32) / jnp.maximum(n, 1e-12)) * sc

    qsf = jnp.asarray(q_scale, jnp.float32)
    ksf = jnp.asarray(k_scale, jnp.float32)
    kf = k.astype(q.dtype) if k_prenormed else \
        l2n_scaled(k, ksf).astype(q.dtype)
    qp = regroup(_pad_to(q, Np, 2), Np)
    kp = regroup(_pad_to(kf, Mp, 2), Mp)
    vp = regroup(_pad_to(v, Mp, 2), Mp)
    nkv = jnp.asarray(null_kv, jnp.float32)
    nkv = jnp.stack([l2n_scaled(nkv[0], ksf), nkv[1]])
    nkv = nkv.reshape(2, G, hg, D).transpose(1, 2, 0, 3)  # (G, hg, 2, D)
    # sm_scale folded into the q-side scales (one fewer strip pass)
    scales = jnp.stack([qsf * sm_scale, ksf])             # (2, D)

    # rowbound[n] >= every score in row n INCLUDING the null column
    # (whose bias is 0): the cosine term bound + the nonneg bias max
    cos_bound = sm_scale * jnp.max(jnp.abs(qsf * ksf))
    bias_f = (jnp.zeros((N, M), jnp.float32) if bias is None
              else jnp.asarray(bias, jnp.float32))
    rowbound = cos_bound + jnp.maximum(jnp.max(bias_f, axis=1), 0.0)  # (N,)
    biasfb = bias_f - rowbound[:, None]
    biasfb = jnp.pad(biasfb, ((0, Np - N), (0, Mp - M)),
                     constant_values=NEG_INF)[None]       # (1, Np, Mp)
    rbp = _pad_to(rowbound[None], Np, 1)[..., None]       # (1, Np, 1)
    keep_arr = (jnp.ones((B,), jnp.int32) if keep is None
                else jnp.asarray(keep).astype(jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * G, nq),
        in_specs=[
            pl.BlockSpec((1, hg, tile_q, D), lambda g, qi, kk: (g, 0, qi, 0)),
            pl.BlockSpec((1, hg, Mp, D), lambda g, qi, kk: (g, 0, 0, 0)),
            pl.BlockSpec((1, hg, Mp, D), lambda g, qi, kk: (g, 0, 0, 0)),
            pl.BlockSpec((1, hg, 2, D),
                         lambda g, qi, kk, G=G: (g % G, 0, 0, 0)),
            pl.BlockSpec((2, D), lambda g, qi, kk: (0, 0)),
            pl.BlockSpec((1, tile_q, Mp), lambda g, qi, kk: (0, qi, 0)),
            pl.BlockSpec((1, tile_q, 1), lambda g, qi, kk: (0, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, hg, tile_q, D),
                               lambda g, qi, kk: (g, 0, qi, 0)),
    )
    out = pl.pallas_call(
        partial(_qknorm_kernel_fb, groups_per_batch=G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * G, hg, Np, D), q.dtype),
        interpret=interpret,
    )(keep_arr, qp, kp, vp, nkv, scales, biasfb, rbp)
    return out.reshape(B, H, Np, D)[:, :, :N]


def _qknorm_kernel_chunked(keep_ref, q_ref, k_ref, v_ref, null_ref,
                           scale_ref, bias_ref, o_ref,
                           *, sm_scale: float, m_real: int, has_bias: bool,
                           groups_per_batch: int, chunk: int):
    """Cosine attention with an in-VMEM chunked (running-max) softmax.

    Same math as _qknorm_kernel, but the (hg, T, Mp) fp32 score strip is
    never materialized: K/V stay VMEM-resident for the whole grid row
    and the softmax runs over `chunk`-column slices with the standard
    online max/denominator/accumulator recurrence (exact — each term
    ends up exp(s - m_final) either way). Shrinking the transient from
    O(Mp) to O(chunk) is what lets the head group DOUBLE (4 -> 8 at
    decode shapes), which halves the kernel's dominant HBM cost: the
    shared bias strip is re-fetched once per (batch, group), so its
    traffic is B * G * N * M * 4 bytes (measured 880 MB -> 440 MB per
    batch-16 layer call, the round-2 batch-scaling regression).

    The null column (muse_maskgit_pytorch.py:150-156) is the INITIAL
    state of the recurrence: m0 = s_null, l0 = 1, acc0 = null_v."""
    b = pl.program_id(0) // groups_per_batch
    hg, T, D = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    mp = k_ref.shape[2]
    nchunks = mp // chunk

    qsc = scale_ref[0].astype(jnp.float32)               # (D,)
    q = (_l2n(q_ref[0].astype(jnp.float32)) * qsc).astype(o_ref.dtype)
    nk = null_ref[0, :, 0:1].astype(o_ref.dtype)         # (hg, 1, D) normed
    nv = null_ref[0, :, 1:2].astype(jnp.float32)         # (hg, 1, D)

    s_null = jax.lax.dot_general(q, nk, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    m0 = s_null[..., 0] * sm_scale                       # (hg, T)
    l0 = jnp.ones((hg, T), jnp.float32)
    acc0 = jnp.broadcast_to(nv, (hg, T, D)).astype(jnp.float32)

    keep_b = keep_ref[b]

    def step(i, carry):
        m, l, acc = carry
        off = i * chunk
        kc = k_ref[0, :, pl.ds(off, chunk), :]           # (hg, chunk, D)
        vc = v_ref[0, :, pl.ds(off, chunk), :]
        s = jax.lax.dot_general(q, kc, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * sm_scale                                 # (hg, T, chunk)
        if has_bias:
            s = s + bias_ref[0, :, pl.ds(off, chunk)][None]
        col = off + jax.lax.broadcasted_iota(jnp.int32, (1, 1, chunk), 2)
        valid = (col < m_real) & (keep_b > 0)
        s = jnp.where(valid, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))      # (hg, T)
        alpha = jnp.exp(m - m_new)
        e = jnp.exp(s - m_new[..., None])
        l = l * alpha + jnp.sum(e, axis=-1)
        av = jax.lax.dot_general(e.astype(v_ref.dtype), vc,
                                 (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        acc = acc * alpha[..., None] + av
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, nchunks, step, (m0, l0, acc0))
    o_ref[0] = (acc / l[..., None]).astype(o_ref.dtype)


def _auto_head_group_chunked(H: int, tile_q: int, Mp: int, D: int,
                             requested: int, chunk: int,
                             budget_bytes: int = 15 << 20) -> int:
    """Largest head group (divisor of H, <= requested) for the chunked
    kernel: double-buffered resident K/V bf16 + chunk-sized fp32 score
    transients + fp32 accumulator, plus the double-buffered bias strip."""
    per_head = (2 * Mp * D * 2 * 2            # K/V, double-buffered
                + 2 * tile_q * chunk * 4      # s/e chunk transients
                + tile_q * D * 4              # accumulator
                + tile_q * D * 2 * 2)         # q (raw block + normed)
    fixed = tile_q * Mp * 4 * 2               # bias strip (double-buffered)
    hg = math.gcd(requested, H)
    while hg > 1 and hg * per_head + fixed > budget_bytes:
        hg //= 2
    return max(hg, 1)


def fused_cosine_attention_fwd(q, k, v, null_kv, q_scale, k_scale,
                               bias=None, keep=None, sm_scale: float = 8.0,
                               tile: int = 128, head_group: int = 8,
                               tile_q: int = 128, interpret: bool = False,
                               k_prenormed: bool = False,
                               chunk: int = 256):
    """q: (B, H, N, D) RAW (pre-norm); k, v: (B, H, M, D) RAW without the
    null column; null_kv: (2, H, 1, D); q_scale/k_scale: (D,);
    bias: (N, M) or None; keep: (B,) or None. Returns (B, H, N, D) in
    q.dtype — numerically the cosine attention of
    models/stage2/transformer.py with the null KV at column 0.

    Runs the chunked-softmax kernel (_qknorm_kernel_chunked); the
    strip-materializing original is kept as
    fused_cosine_attention_fwd_strip for A/B measurement."""
    B, H, N, D = q.shape
    M = k.shape[2]
    Np = math.ceil(N / tile_q) * tile_q
    Mp = math.ceil(M / tile) * tile
    # the kv chunk must DIVIDE Mp — padding Mp up to a chunk multiple
    # instead costs real HBM+FLOPs (1792 -> 2048 at chunk=512, measured
    # VMEM OOM at B=16). Largest 128-multiple divisor <= requested
    # (clamped up to one tile so a sub-tile request stays legal):
    chunk = max(c for c in range(tile, min(max(chunk, tile), Mp) + 1, tile)
                if Mp % c == 0)
    nq = Np // tile_q
    hg = _auto_head_group_chunked(H, tile_q, Mp, D, head_group, chunk)
    G = H // hg

    def regroup(x, L_):
        return x.reshape(B * G, hg, L_, D)

    def l2n_scaled(t, sc):
        n = jnp.sqrt(jnp.sum(jnp.square(t.astype(jnp.float32)), axis=-1,
                             keepdims=True))
        return (t.astype(jnp.float32) / jnp.maximum(n, 1e-12)) * sc

    ksf = jnp.asarray(k_scale, jnp.float32)
    kf = k.astype(q.dtype) if k_prenormed else \
        l2n_scaled(k, ksf).astype(q.dtype)
    qp = regroup(_pad_to(q, Np, 2), Np)
    kp = regroup(_pad_to(kf, Mp, 2), Mp)
    vp = regroup(_pad_to(v, Mp, 2), Mp)
    # (2, H, 1, D) -> (G, hg, 2, D): normalized null-K row + raw null-V
    nkv = jnp.asarray(null_kv, jnp.float32)
    nkv = jnp.stack([l2n_scaled(nkv[0], ksf), nkv[1]])
    nkv = nkv.reshape(2, G, hg, D).transpose(1, 2, 0, 3)  # (G, hg, 2, D)
    scales = jnp.stack([jnp.asarray(q_scale, jnp.float32), ksf])  # (2, D)
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
            pl.BlockSpec((1, hg, 2, D),
                         lambda g, qi, kk, G=G: (g % G, 0, 0, 0)),
            pl.BlockSpec((2, D), lambda g, qi, kk: (0, 0)),
            (pl.BlockSpec((1, tile_q, Mp), lambda g, qi, kk: (0, qi, 0))
             if has_bias else
             pl.BlockSpec((1, tile_q, Mp), lambda g, qi, kk: (0, 0, 0))),
        ],
        out_specs=pl.BlockSpec((1, hg, tile_q, D),
                               lambda g, qi, kk: (g, 0, qi, 0)),
    )
    out = pl.pallas_call(
        partial(_qknorm_kernel_chunked, sm_scale=sm_scale, m_real=M,
                has_bias=has_bias, groups_per_batch=G, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * G, hg, Np, D), q.dtype),
        interpret=interpret,
    )(keep_arr, qp, kp, vp, nkv, scales, biasp)
    return out.reshape(B, H, Np, D)[:, :, :N]


def fused_cosine_attention_fwd_strip(q, k, v, null_kv, q_scale, k_scale,
                                     bias=None, keep=None,
                                     sm_scale: float = 8.0,
                                     tile: int = 128, head_group: int = 8,
                                     tile_q: int = 128,
                                     interpret: bool = False,
                                     k_prenormed: bool = False):
    """The original strip-materializing cosine kernel (_qknorm_kernel):
    holds the full (hg, tile_q, Mp) fp32 score strip, which capped the
    head group at 4 at decode shapes. Kept for A/B measurement against
    the chunked default."""
    B, H, N, D = q.shape
    M = k.shape[2]
    Np = math.ceil(N / tile_q) * tile_q
    Mp = math.ceil(M / tile) * tile
    nq = Np // tile_q
    hg = _auto_head_group(H, tile_q, Mp, D, head_group)
    G = H // hg

    def regroup(x, L_):
        return x.reshape(B * G, hg, L_, D)

    def l2n_scaled(t, sc):
        n = jnp.sqrt(jnp.sum(jnp.square(t.astype(jnp.float32)), axis=-1,
                             keepdims=True))
        return (t.astype(jnp.float32) / jnp.maximum(n, 1e-12)) * sc

    ksf = jnp.asarray(k_scale, jnp.float32)
    kf = k.astype(q.dtype) if k_prenormed else \
        l2n_scaled(k, ksf).astype(q.dtype)
    qp = regroup(_pad_to(q, Np, 2), Np)
    kp = regroup(_pad_to(kf, Mp, 2), Mp)
    vp = regroup(_pad_to(v, Mp, 2), Mp)
    nkv = jnp.asarray(null_kv, jnp.float32)
    nkv = jnp.stack([l2n_scaled(nkv[0], ksf), nkv[1]])
    nkv = nkv.reshape(2, G, hg, D).transpose(1, 2, 0, 3)  # (G, hg, 2, D)
    scales = jnp.stack([jnp.asarray(q_scale, jnp.float32), ksf])  # (2, D)
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
            pl.BlockSpec((1, hg, 2, D),
                         lambda g, qi, kk, G=G: (g % G, 0, 0, 0)),
            pl.BlockSpec((2, D), lambda g, qi, kk: (0, 0)),
            (pl.BlockSpec((1, tile_q, Mp), lambda g, qi, kk: (0, qi, 0))
             if has_bias else
             pl.BlockSpec((1, tile_q, Mp), lambda g, qi, kk: (0, 0, 0))),
        ],
        out_specs=pl.BlockSpec((1, hg, tile_q, D),
                               lambda g, qi, kk: (g, 0, qi, 0)),
    )
    out = pl.pallas_call(
        partial(_qknorm_kernel, sm_scale=sm_scale, m_real=M,
                has_bias=has_bias, groups_per_batch=G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * G, hg, Np, D), q.dtype),
        interpret=interpret,
    )(keep_arr, qp, kp, vp, nkv, scales, biasp)
    return out.reshape(B, H, Np, D)[:, :, :N]


def fused_cosine_attention_fwd_nhd(q, k, v, null_kv, q_scale, k_scale,
                                   bias=None, keep=None,
                                   sm_scale: float = 8.0, tile: int = 128,
                                   head_group: int = 8, tile_q: int = 128,
                                   interpret: bool = False):
    """Layout-optimal variant: q (B, N, H, D); k, v (B, M, H, D) — i.e.
    free bitcast views of the projections' natural (B, L, H*D) output.
    Returns (B, N, H*D).

    Why: the (b, n, h*d) -> (b, h, n, d) transpose plus the kernel's
    (B*G, hg, L, D) regroup cost XLA TWO physical copies per operand at
    decode shapes (profiled: 1.64 s of 14.3 s per batch-16 generate).
    Folding both into ONE 5-d transpose ((B, L, G, hg, D) ->
    (B, G, hg, L, D), whose output row-major layout IS the kernel block
    layout) halves that traffic; the output side gets the same
    treatment."""
    B, N, H, D = q.shape
    M = k.shape[1]
    Np = math.ceil(N / tile_q) * tile_q
    Mp = math.ceil(M / tile) * tile
    nq = Np // tile_q
    hg = _auto_head_group(H, tile_q, Mp, D, head_group)
    G = H // hg

    def to_groups(x, Lp):
        x = _pad_to(x, Lp, 1)                       # (B, Lp, H, D)
        x = x.reshape(B, Lp, G, hg, D).transpose(0, 2, 3, 1, 4)
        return x.reshape(B * G, hg, Lp, D)          # bitcast of the above

    ksf = jnp.asarray(k_scale, jnp.float32)

    def l2n_scaled(t, sc):
        n = jnp.sqrt(jnp.sum(jnp.square(t.astype(jnp.float32)), axis=-1,
                             keepdims=True))
        return (t.astype(jnp.float32) / jnp.maximum(n, 1e-12)) * sc

    qp = to_groups(q, Np)
    kp = to_groups(l2n_scaled(k, ksf).astype(q.dtype), Mp)
    vp = to_groups(v, Mp)
    nkv = jnp.asarray(null_kv, jnp.float32)         # (2, H, 1, D)
    nkv = jnp.stack([l2n_scaled(nkv[0], ksf), nkv[1]])
    nkv = nkv.reshape(2, G, hg, D).transpose(1, 2, 0, 3)   # (G, hg, 2, D)
    scales = jnp.stack([jnp.asarray(q_scale, jnp.float32), ksf])
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
            pl.BlockSpec((1, hg, 2, D),
                         lambda g, qi, kk, G=G: (g % G, 0, 0, 0)),
            pl.BlockSpec((2, D), lambda g, qi, kk: (0, 0)),
            (pl.BlockSpec((1, tile_q, Mp), lambda g, qi, kk: (0, qi, 0))
             if has_bias else
             pl.BlockSpec((1, tile_q, Mp), lambda g, qi, kk: (0, 0, 0))),
        ],
        out_specs=pl.BlockSpec((1, hg, tile_q, D),
                               lambda g, qi, kk: (g, 0, qi, 0)),
    )
    out = pl.pallas_call(
        partial(_qknorm_kernel, sm_scale=sm_scale, m_real=M,
                has_bias=has_bias, groups_per_batch=G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * G, hg, Np, D), q.dtype),
        interpret=interpret,
    )(keep_arr, qp, kp, vp, nkv, scales, biasp)
    # one 5-d permutation back to the projections' natural layout
    out = out.reshape(B, G, hg, Np, D).transpose(0, 3, 1, 2, 4)
    return out.reshape(B, Np, H * D)[:, :N]


def make_cosine_attention_nhd(sm_scale: float = 8.0,
                              use_pallas: Optional[bool] = None):
    """cos_attn(q, k, v, null_kv, q_scale, k_scale, bias, keep) in the
    copy-minimal (B, L, H, D) layout; returns (B, N, H*D). Backward
    routes through the (B, H, L, D) kernel backward with explicit
    transposes — training pays two extra copies, the forward-only decode
    path (where the time goes) pays one."""

    def _to_bhld(x):
        return x.transpose(0, 2, 1, 3)

    @jax.custom_vjp
    def attn(q, k, v, null_kv, q_scale, k_scale, bias, keep):
        return fused_cosine_attention_fwd_nhd(q, k, v, null_kv, q_scale,
                                              k_scale, bias, keep,
                                              sm_scale=sm_scale)

    def fwd(q, k, v, null_kv, q_scale, k_scale, bias, keep):
        return (attn(q, k, v, null_kv, q_scale, k_scale, bias, keep),
                (q, k, v, null_kv, q_scale, k_scale, bias, keep))

    def bwd(res, g):
        q, k, v, null_kv, q_scale, k_scale, bias, keep = res
        B, N, H, D = q.shape
        inner = make_cosine_attention(sm_scale=sm_scale, use_pallas=False)

        def ref(q, k, v, null_kv, q_scale, k_scale, bias):
            out = inner(_to_bhld(q), _to_bhld(k), _to_bhld(v), null_kv,
                        q_scale, k_scale, bias, keep)
            return out.transpose(0, 2, 1, 3).reshape(B, N, H * D)

        _, vjp = jax.vjp(ref, q, k, v, null_kv, q_scale, k_scale, bias)
        dq, dk, dv, dnull, dqs, dks, dbias = vjp(g)
        return dq, dk, dv, dnull, dqs, dks, dbias, jnp.zeros_like(keep)

    attn.defvjp(fwd, bwd)

    def _dense(q, k, v, null_kv, q_scale, k_scale, bias, keep):
        B, N, H, D = q.shape
        inner = make_cosine_attention(sm_scale=sm_scale, use_pallas=False)
        out = inner(_to_bhld(q), _to_bhld(k), _to_bhld(v), null_kv,
                    q_scale, k_scale, bias, keep)
        return out.transpose(0, 2, 1, 3).reshape(B, N, H * D)

    def dispatch(q, k, v, null_kv, q_scale, k_scale, bias=None, keep=None):
        on_tpu = jax.default_backend() == "tpu"
        use = use_pallas if use_pallas is not None else on_tpu
        bias_arr = None if bias is None else jnp.asarray(bias, jnp.float32)
        keep_arr = (jnp.ones((q.shape[0],), jnp.float32) if keep is None
                    else jnp.asarray(keep).astype(jnp.float32))
        if not use:
            return _dense(q, k, v, null_kv, q_scale, k_scale, bias_arr,
                          keep_arr)
        return attn(q, k, v, null_kv, q_scale, k_scale, bias_arr, keep_arr)

    return dispatch


# choice -> module attribute, resolved late (globals()) so tests can
# monkeypatch the variants with interpret=True
_COSINE_FWD_NAMES = {
    "fb": "fused_cosine_attention_fwd_fb",
    "fb2": "fused_cosine_attention_fwd_fb2",
    "fb2c": "fused_cosine_attention_fwd_fb2c",
    "strip": "fused_cosine_attention_fwd_strip",
    "chunked": "fused_cosine_attention_fwd",
}


def cosine_kernel_choice() -> str:
    """Which cosine forward kernel the dispatcher uses (BEVGEN_COSINE_KERNEL
    env): 'fb2' (default — fixed-bound exp2 softmax with the MXU-summed
    denominator; b2 flagship 17.68 -> 19.33 img/s vs strip), 'fb',
    'strip', or 'chunked'."""
    import os
    return os.environ.get("BEVGEN_COSINE_KERNEL", "fb2")


def make_cosine_attention(sm_scale: float = 8.0,
                          use_pallas: Optional[bool] = None,
                          k_prenormed: bool = False):
    """cos_attn(q, k, v, null_kv, q_scale, k_scale, bias, keep) -> out.

    Forward: one fully-fused Pallas kernel (norms + scales + null KV +
    bias + CFG keep + softmax + AV). Backward: the prologue is
    recomputed in XLA under jax.vjp and chained with the Pallas
    attention backward — training pays what it paid before this fusion,
    the forward (both passes) gets cheaper.

    k_prenormed=True: k arrives ALREADY l2-normalized and k_scale-d
    (the decode cache precomputes the step-invariant cross-attention K
    once per generate — models/stage2/transformer.py); the wrappers
    and dense path then skip the per-call K norm."""

    def _prologue(q, k, v, null_kv, q_scale, k_scale, bias):
        B, H = q.shape[0], q.shape[1]
        D = q.shape[-1]
        f32 = jnp.float32
        nk = jnp.broadcast_to(null_kv[0][None], (B, H, 1, D)).astype(q.dtype)
        nv = jnp.broadcast_to(null_kv[1][None], (B, H, 1, D)).astype(v.dtype)
        vc = jnp.concatenate([nv, v], axis=2)

        def l2n(t):
            n = jnp.linalg.norm(t.astype(f32), axis=-1, keepdims=True)
            return t.astype(f32) / jnp.maximum(n, 1e-12)

        qf = (l2n(q) * q_scale).astype(q.dtype)
        if k_prenormed:
            nkf = (l2n(nk) * k_scale).astype(q.dtype)
            kf = jnp.concatenate([nkf, k.astype(q.dtype)], axis=2)
        else:
            kc = jnp.concatenate([nk, k], axis=2)
            kf = (l2n(kc) * k_scale).astype(q.dtype)
        biasp = (None if bias is None
                 else jnp.pad(jnp.asarray(bias, f32), ((0, 0), (1, 0))))
        return qf, kf, vc, biasp

    @jax.custom_vjp
    def attn(q, k, v, null_kv, q_scale, k_scale, bias, keep):
        # kernel selection (BEVGEN_COSINE_KERNEL): 'fb2' fixed-bound
        # exp2 softmax with the MXU-summed denominator is the measured
        # default (b2 flagship e2e: strip 17.7, fb2 19.3 img/s). 'fb'
        # is fixed-bound with a VPU sum-reduce; 'strip' the round-2
        # running-max kernel; 'chunked' the online-softmax variant that
        # halves shared-bias HBM traffic by doubling the head group but
        # whose fori_loop recurrence costs more than the saving
        # (17.7 -> 12.7 img/s b2 e2e) — all kept for A/B measurement.
        fwd_fn = globals()[_COSINE_FWD_NAMES.get(
            cosine_kernel_choice(), "fused_cosine_attention_fwd_fb2")]
        return fwd_fn(q, k, v, null_kv, q_scale, k_scale, bias, keep,
                      sm_scale=sm_scale, k_prenormed=k_prenormed)

    def fwd(q, k, v, null_kv, q_scale, k_scale, bias, keep):
        return (attn(q, k, v, null_kv, q_scale, k_scale, bias, keep),
                (q, k, v, null_kv, q_scale, k_scale, bias, keep))

    def bwd(res, g):
        q, k, v, null_kv, q_scale, k_scale, bias, keep = res
        (qf, kf, vc, biasp), pvjp = jax.vjp(
            _prologue, q, k, v, null_kv, q_scale, k_scale, bias)
        # keep-flag semantics differ by one column between the two
        # kernels: the prologue output's column 0 IS the null column,
        # which fused_bias_attention_bwd already exempts from keep.
        dqf, dkf, dvc, dbiasp = fused_bias_attention_bwd(
            qf, kf, vc, biasp, keep, g.astype(qf.dtype), sm_scale=sm_scale)
        dq, dk, dv, dnull, dqs, dks, dbias = pvjp(
            (dqf.astype(qf.dtype), dkf.astype(kf.dtype),
             dvc.astype(vc.dtype), dbiasp))
        return dq, dk, dv, dnull, dqs, dks, dbias, jnp.zeros_like(keep)

    attn.defvjp(fwd, bwd)

    def _dense(q, k, v, null_kv, q_scale, k_scale, bias, keep):
        qf, kf, vc, biasp = _prologue(q, k, v, null_kv, q_scale, k_scale,
                                      bias)
        return _dense_cosine(qf, kf, vc, biasp, keep, sm_scale)

    def dispatch(q, k, v, null_kv, q_scale, k_scale, bias=None, keep=None):
        on_tpu = jax.default_backend() == "tpu"
        use = use_pallas if use_pallas is not None else on_tpu
        # bias=None threads through (kernels skip bias reads + dbias)
        bias_arr = None if bias is None else jnp.asarray(bias, jnp.float32)
        keep_arr = (jnp.ones((q.shape[0],), jnp.float32) if keep is None
                    else jnp.asarray(keep).astype(jnp.float32))
        if not use:
            return _dense(q, k, v, null_kv, q_scale, k_scale, bias_arr,
                          keep_arr)
        return attn(q, k, v, null_kv, q_scale, k_scale, bias_arr, keep_arr)

    return dispatch


def _dense_cosine(qf, kf, vc, biasp, keep, sm_scale):
    """XLA reference for the post-prologue cosine attention (null column
    already at index 0 of kf/vc/biasp)."""
    s = jnp.einsum("bhid,bhjd->bhij", qf, kf,
                   preferred_element_type=jnp.float32) * sm_scale
    if biasp is not None:
        s = s + biasp[None, None]
    if keep is not None:
        M = kf.shape[2]
        col = jnp.arange(M)
        valid = (jnp.asarray(keep)[:, None] > 0) | (col[None] == 0)
        s = jnp.where(valid[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p.astype(vc.dtype), vc,
                      preferred_element_type=jnp.float32).astype(qf.dtype)
