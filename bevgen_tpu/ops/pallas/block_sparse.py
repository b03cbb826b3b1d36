"""Pallas TPU block-sparse attention kernel.

Replaces DeepSpeed's Triton sdd/softmax/dsd block-sparse pipeline
(reference sparse_self_attention.py:64-85) with one flash-style TPU
kernel, re-designed for the MXU:

  * the reference's 16-token blocks are re-tiled onto 128x128 MXU tiles
    (SURVEY §7 hard-part 2); a tile is visited only if ANY of its
    16-blocks is active in this head's layout — the per-(head, q-tile)
    active-tile lists are scalar-prefetched so the kernel's inner loop
    runs exactly `count` iterations, skipping inactive tiles entirely;
  * the multiplicative mask (cond columns + causal-in-decode-order band
    + pad-row rules, bevgen_tpu.models.masks) is INDEX-DERIVABLE, so it
    is computed from iotas in-kernel — zero HBM traffic (a naive
    mask-strip design costs ~2.4 MB x grid-steps of bandwidth and was
    measured slower than dense XLA);
  * within a visited tile, the fine 16-block layout is expanded on the
    MXU (E @ strip @ one-hot — Mosaic forbids unaligned dynamic lane
    slices, so selection is a matmul, not a gather);
  * online (flash) softmax in fp32; K/V for one (batch, head) live
    fully in VMEM (L<=2432, D=64 -> ~300KB each).

Semantics: matches dense masked attention with mask value -1e9; the
optional additive bias (learned camera bias) is added to RAW scores and
scaled with them (DeepSpeed add_mask semantics,
sparse_self_attention.py:153-173).
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


class TilePlan(NamedTuple):
    counts: np.ndarray      # (H, nt) int32 — active kv tiles per q tile
    indices: np.ndarray     # (H, nt, nt) int32 — active kv tile ids (padded 0)
    layout_pad: np.ndarray  # (H, nbp, nbp) int32 — 16-block layout, padded
    l_pad: int              # padded sequence length
    ratio: int              # tile // block


def plan_tiles(layout: np.ndarray, block: int, L: int,
               tile: int = 128, transpose: bool = False) -> TilePlan:
    """Host-side: coarsen the per-head 16-block layout to 128-tile
    granularity and build the active-tile lists. transpose=True lists,
    for each KV tile, the q tiles that touch it (the dkv backward
    traversal order)."""
    assert tile % block == 0, (tile, block)
    ratio = tile // block
    H, nb, _ = layout.shape
    nt = math.ceil(L / tile)
    nbp = nt * ratio
    lp = np.zeros((H, nbp, nbp), np.int32)
    lp[:, :nb, :nb] = layout
    coarse = lp.reshape(H, nt, ratio, nt, ratio).max(axis=(2, 4))  # (H,nt,nt)
    if transpose:
        coarse = coarse.transpose(0, 2, 1)
    counts = coarse.sum(-1).astype(np.int32)
    indices = np.zeros((H, nt, nt), np.int32)
    for h in range(H):
        for i in range(nt):
            js = np.nonzero(coarse[h, i])[0]
            indices[h, i, :len(js)] = js
    return TilePlan(counts=counts, indices=indices, layout_pad=lp,
                    l_pad=nt * tile, ratio=ratio)


def _allowed_tile(row_g, col_g, nc: int, pad_start: int):
    """In-kernel reconstruction of the mul-mask for a (tile, tile) score
    block. row_g: (T, 1) global row ids; col_g: (1, T) global col ids.

    Rules (masks.sparse_masks / mask_generator.py:192-206):
      cond rows (< nc): attend all cond columns only;
      img rows: all cond columns + causal band (col <= row);
      pad rows (>= pad_start): only column 0.
    """
    cond_col = col_g < nc
    pad_row = row_g >= pad_start
    # cond rows reduce to cond_col automatically: col<=row<nc => cond col
    regular = cond_col | (col_g <= row_g)
    return (~pad_row & regular) | (pad_row & (col_g == 0))


def _kernel(counts_ref, idx_ref,            # scalar prefetch
            q_ref, k_ref, v_ref, layout_ref, bias_ref,  # inputs
            o_ref, *maybe_lse,              # outputs
            **kw):
    _kernel_body(counts_ref, idx_ref, q_ref, k_ref, v_ref, layout_ref,
                 bias_ref, o_ref, maybe_lse[0] if maybe_lse else None,
                 **kw)


def _kernel_body(counts_ref, idx_ref, q_ref, k_ref, v_ref, layout_ref,
                 bias_ref, o_ref, lse_ref,
                 *, tile: int, ratio: int, scale: float, num_heads: int,
                 nc: int, pad_start: int, has_bias: bool):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    h = jax.lax.rem(bh, num_heads)
    d = q_ref.shape[-1]

    q = q_ref[0].astype(jnp.float32)                          # (T, D)
    n_active = counts_ref[h, qi]
    nbp = layout_ref.shape[-1]
    inner = tile // ratio                                     # tokens/block

    # 0/1 expansion matrix: E[i, b] = 1 iff token-row i is in 16-block b
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, ratio), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, ratio), 1)
    expand = (rows // inner == cols).astype(jnp.float32)

    # this q-tile's row strip of the block layout, (ratio, nbp)
    if ratio >= 8:
        strip = layout_ref[0].astype(jnp.float32)
    else:
        # whole per-head layout in VMEM; select the qi rows by one-hot
        # matmul (sublane-dim blocks <8 are not addressable directly)
        full = layout_ref[0].astype(jnp.float32)              # (nbp, nbp)
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (ratio, nbp), 0)
        rc_ids = jax.lax.broadcasted_iota(jnp.int32, (ratio, nbp), 1)
        rowsel = (rc_ids == qi * ratio + r_ids).astype(jnp.float32)
        strip = rowsel @ full                                 # (ratio, nbp)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (nbp, tile), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (nbp, tile), 1)

    row_g = qi * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    col_l = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)

    def body(t, carry):
        m_i, l_i, acc = carry
        j = idx_ref[h, qi, t]
        koff = pl.multiple_of(j * tile, tile)
        k_tile = k_ref[0, pl.ds(koff, tile), :].astype(jnp.float32)
        v_tile = v_ref[0, pl.ds(koff, tile), :].astype(jnp.float32)

        s = jax.lax.dot_general(q, k_tile, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (T,T)

        col_g = koff + col_l
        keep = _allowed_tile(row_g, col_g, nc, pad_start)
        if ratio > 1:
            # dynamic column selection as a one-hot matmul (Mosaic
            # forbids unaligned dynamic lane slices)
            sel = (c_ids == j * ratio + col_ids // inner).astype(jnp.float32)
            sub_exp = expand @ (strip @ sel)                  # (T, T)
            keep = keep & (sub_exp > 0.5)
        # ratio == 1: a visited tile IS an active block — no fine mask
        if has_bias:
            # bias added to RAW scores; the softmax scale applies to it
            s = s + bias_ref[0, :, pl.ds(koff, tile)]
        s = jnp.where(keep, s * scale, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((tile, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((tile, 1), jnp.float32)
    a0 = jnp.zeros((tile, d), jnp.float32)
    m_i, l_i, acc = jax.lax.fori_loop(0, n_active, body, (m0, l0, a0))

    out = acc / jnp.maximum(l_i, 1e-30)
    o_ref[0] = out.astype(o_ref.dtype)
    if lse_ref is not None:
        lse_ref[0] = m_i + jnp.log(jnp.maximum(l_i, 1e-30))


def block_sparse_attention(q, k, v, layout, allowed, bias=None,
                           block: int = 16, tile: int = 128,
                           scale: Optional[float] = None,
                           num_cond_tokens: Optional[int] = None,
                           num_pad_tokens: int = 0,
                           return_lse: bool = False,
                           interpret: bool = False):
    """q,k,v: (B, H, L, D). layout: (H, nb, nb) 0/1 per-head 16-block
    layout (static). allowed: (L, L) 0/1 mul-mask — used only to infer
    the (nc, pad) structure unless num_cond_tokens is given; the kernel
    reconstructs the mask from indices. bias: optional (L, L) additive
    bias, may be a TRACED array (learned camera bias).
    Returns (B, H, L, D).
    """
    B, H, L, D = q.shape
    scale = scale if scale is not None else 1.0 / float(np.sqrt(D))
    layout = np.asarray(layout)
    plan = plan_tiles(layout, block, L, tile)
    Lp = plan.l_pad
    nt = Lp // tile

    if num_cond_tokens is None:
        # infer nc: number of leading columns fully allowed in row 0
        a0 = np.asarray(allowed)[0]
        nc = int(np.argmin(a0)) if a0.min() == 0 else L
    else:
        nc = num_cond_tokens
    pad_start = L - num_pad_tokens if num_pad_tokens else L

    has_bias = bias is not None
    if has_bias:
        biasp = jnp.pad(jnp.asarray(bias, jnp.float32)[None],
                        ((0, 0), (0, Lp - L), (0, Lp - L)))
    else:
        biasp = jnp.zeros((1, tile, Lp), jnp.float32)  # dummy, never read

    def prep(x):
        x = x.reshape(B * H, L, D)
        return jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))

    qp, kp, vp = prep(q), prep(k), prep(v)

    bias_spec = (pl.BlockSpec((1, tile, Lp), lambda bh, qi, c, i: (0, qi, 0))
                 if has_bias else
                 pl.BlockSpec((1, tile, Lp), lambda bh, qi, c, i: (0, 0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B * H, nt),
        in_specs=[
            pl.BlockSpec((1, tile, D), lambda bh, qi, c, i: (bh, qi, 0)),
            pl.BlockSpec((1, Lp, D), lambda bh, qi, c, i: (bh, 0, 0)),
            pl.BlockSpec((1, Lp, D), lambda bh, qi, c, i: (bh, 0, 0)),
            (pl.BlockSpec((1, plan.ratio, plan.layout_pad.shape[2]),
                          lambda bh, qi, c, i: (bh % H, qi, 0))
             if plan.ratio >= 8 else
             pl.BlockSpec((1,) + plan.layout_pad.shape[1:],
                          lambda bh, qi, c, i: (bh % H, 0, 0))),
            bias_spec,
        ],
        out_specs=(
            (pl.BlockSpec((1, tile, D), lambda bh, qi, c, i: (bh, qi, 0)),
             pl.BlockSpec((1, tile, 1), lambda bh, qi, c, i: (bh, qi, 0)))
            if return_lse else
            pl.BlockSpec((1, tile, D), lambda bh, qi, c, i: (bh, qi, 0))),
    )

    out_shape = (
        (jax.ShapeDtypeStruct((B * H, Lp, D), q.dtype),
         jax.ShapeDtypeStruct((B * H, Lp, 1), jnp.float32))
        if return_lse else jax.ShapeDtypeStruct((B * H, Lp, D), q.dtype))
    res = pl.pallas_call(
        partial(_kernel, tile=tile, ratio=plan.ratio, scale=scale,
                num_heads=H, nc=nc, pad_start=pad_start, has_bias=has_bias),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(plan.counts), jnp.asarray(plan.indices),
      qp, kp, vp, jnp.asarray(plan.layout_pad), biasp)

    if return_lse:
        out, lse = res
        return out[:, :L].reshape(B, H, L, D), lse
    return res[:, :L].reshape(B, H, L, D)


# ---------------------------------------------------------------------------
# backward kernels (flash-style with tile skipping)
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(counts_ref, idx_ref,
                   q_ref, k_ref, v_ref, layout_ref, bias_ref,
                   do_ref, lse_ref, delta_ref,
                   dq_ref, dbias_ref,
                   *, tile: int, ratio: int, scale: float, num_heads: int,
                   nc: int, pad_start: int, has_bias: bool):
    """dq per (q-tile, bh): loop over active kv tiles, recompute p from
    the saved lse, accumulate ds @ K. dbias (shared over b,h) is
    accumulated into its qi-indexed block across the INNERMOST bh grid
    dim — consecutive output revisits are the only accumulation pattern
    Mosaic pipelines correctly (non-consecutive revisits lose a step's
    contribution on HW; interpret mode hides it)."""
    qi = pl.program_id(0)
    bh = pl.program_id(1)
    h = jax.lax.rem(bh, num_heads)
    d = q_ref.shape[-1]
    nbp = layout_ref.shape[-1]
    inner = tile // ratio

    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                                   # (T, 1)
    delta = delta_ref[0]                               # (T, 1)
    n_active = counts_ref[h, qi]

    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, ratio), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, ratio), 1)
    expand = (rows // inner == cols).astype(jnp.float32)
    if ratio >= 8:
        strip = layout_ref[0].astype(jnp.float32)
    else:
        full = layout_ref[0].astype(jnp.float32)
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (ratio, nbp), 0)
        rc_ids = jax.lax.broadcasted_iota(jnp.int32, (ratio, nbp), 1)
        rowsel = (rc_ids == qi * ratio + r_ids).astype(jnp.float32)
        strip = rowsel @ full
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (nbp, tile), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (nbp, tile), 1)
    row_g = qi * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    col_l = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)

    @pl.when(bh == 0)
    def _():
        if has_bias:
            dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    lp = k_ref.shape[1]

    def body(t, carry):
        dq, db = carry
        j = idx_ref[h, qi, t]
        koff = pl.multiple_of(j * tile, tile)
        k_tile = k_ref[0, pl.ds(koff, tile), :].astype(jnp.float32)
        v_tile = v_ref[0, pl.ds(koff, tile), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k_tile, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        col_g = koff + col_l
        keep = _allowed_tile(row_g, col_g, nc, pad_start)
        if ratio > 1:
            sel = (c_ids == j * ratio + col_ids // inner).astype(jnp.float32)
            sub_exp = expand @ (strip @ sel)
            keep = keep & (sub_exp > 0.5)
        if has_bias:
            s = s + bias_ref[0, :, pl.ds(koff, tile)]
        s = jnp.where(keep, s * scale, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v_tile, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        ds = jnp.where(keep, ds, 0.0)
        if has_bias:
            # ds is the grad of scale*(qk+bias): dbias gets ds*scale.
            # Place this kv tile's columns into the full-width strip on
            # the MXU (P[r, c] = 1 iff c == koff + r) and accumulate in
            # the loop carry. Dynamic-lane-offset stores (to scratch OR
            # the output ref) inside fori_loop are silently mis-lowered
            # on HW — interpret mode passes, compiled results smear
            # across tiles — so the only dbias_ref access is one
            # full-block += after the loop.
            r_loc = jax.lax.broadcasted_iota(jnp.int32, (tile, lp), 0)
            c_glb = jax.lax.broadcasted_iota(jnp.int32, (tile, lp), 1)
            place = (c_glb == koff + r_loc).astype(jnp.float32)
            db = db + jax.lax.dot_general(
                ds * scale, place, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return dq + jax.lax.dot_general(
            ds, k_tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), db

    dq0 = jnp.zeros((tile, d), jnp.float32)
    db0 = jnp.zeros((tile, lp), jnp.float32)
    dq, db = jax.lax.fori_loop(0, n_active, body, (dq0, db0))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)
    if has_bias:
        dbias_ref[0] += db


def _bwd_dkv_kernel(counts_t_ref, idx_t_ref,
                    q_ref, k_ref, v_ref, layout_ref, bias_ref,
                    do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref,
                    *, tile: int, ratio: int, scale: float, num_heads: int,
                    nc: int, pad_start: int, has_bias: bool):
    """dk/dv per (bh, kv-tile): loop over the TRANSPOSED active q-tile
    list, recompute p/ds per (q-tile, this kv-tile) block."""
    bh = pl.program_id(0)
    j = pl.program_id(1)
    h = jax.lax.rem(bh, num_heads)
    d = k_ref.shape[-1]
    nbp = layout_ref.shape[-1]
    inner = tile // ratio

    k_tile = k_ref[0].astype(jnp.float32)              # (T, D) this kv tile
    v_tile = v_ref[0].astype(jnp.float32)
    n_active = counts_t_ref[h, j]
    koff = pl.multiple_of(j * tile, tile)

    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, ratio), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, ratio), 1)
    expand = (rows // inner == cols).astype(jnp.float32)
    full = layout_ref[0].astype(jnp.float32)           # (nbp, nbp)
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (ratio, nbp), 0)
    rc_ids = jax.lax.broadcasted_iota(jnp.int32, (ratio, nbp), 1)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (nbp, tile), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (nbp, tile), 1)
    col_l = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    col_g = koff + col_l

    def body(t, carry):
        dk, dv = carry
        i = idx_t_ref[h, j, t]
        qoff = pl.multiple_of(i * tile, tile)
        q_i = q_ref[0, pl.ds(qoff, tile), :].astype(jnp.float32)
        do_i = do_ref[0, pl.ds(qoff, tile), :].astype(jnp.float32)
        lse_i = lse_ref[0, pl.ds(qoff, tile), :]       # (T, 1)
        delta_i = delta_ref[0, pl.ds(qoff, tile), :]   # (T, 1)

        s = jax.lax.dot_general(q_i, k_tile, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        row_g = qoff + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        keep = _allowed_tile(row_g, col_g, nc, pad_start)
        if ratio > 1:
            rowsel = (rc_ids == i * ratio + r_ids).astype(jnp.float32)
            strip = rowsel @ full
            sel = (c_ids == j * ratio + col_ids // inner).astype(jnp.float32)
            sub_exp = expand @ (strip @ sel)
            keep = keep & (sub_exp > 0.5)
        if has_bias:
            s = s + bias_ref[0, pl.ds(qoff, tile), :]
        s = jnp.where(keep, s * scale, NEG_INF)
        p = jnp.exp(s - lse_i)
        dp = jax.lax.dot_general(do_i, v_tile, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = jnp.where(keep, p * (dp - delta_i), 0.0)
        dk = dk + jax.lax.dot_general(ds, q_i, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dv = dv + jax.lax.dot_general(p, do_i, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    z = jnp.zeros((tile, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_active, body, (z, z))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def block_sparse_attention_bwd(q, k, v, layout, bias, out, do, lse,
                               block: int = 16, tile: int = 128,
                               scale: Optional[float] = None,
                               num_cond_tokens: int = 0,
                               num_pad_tokens: int = 0,
                               interpret: bool = False):
    """Gradients (dq, dk, dv, dbias) for block_sparse_attention given the
    forward output and its per-row log-sum-exp. dbias is None when bias
    is None."""
    B, H, L, D = q.shape
    scale = scale if scale is not None else 1.0 / float(np.sqrt(D))
    layout = np.asarray(layout)
    plan = plan_tiles(layout, block, L, tile)
    plan_t = plan_tiles(layout, block, L, tile, transpose=True)
    Lp = plan.l_pad
    nt = Lp // tile
    nc = num_cond_tokens
    pad_start = L - num_pad_tokens if num_pad_tokens else L
    has_bias = bias is not None

    if has_bias:
        biasp = jnp.pad(jnp.asarray(bias, jnp.float32)[None],
                        ((0, 0), (0, Lp - L), (0, Lp - L)))
    else:
        biasp = jnp.zeros((1, tile, Lp), jnp.float32)

    def prep(x):
        return jnp.pad(x.reshape(B * H, L, D), ((0, 0), (0, Lp - L), (0, 0)))

    qp, kp, vp, dop = prep(q), prep(k), prep(v), prep(do)
    # delta_i = rowsum(dO_i * O_i) — the softmax-backward row constant
    delta = jnp.pad(
        jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                axis=-1).reshape(B * H, L),
        ((0, 0), (0, Lp - L)))[..., None]              # (B*H, Lp, 1)
    lse_p = jnp.asarray(lse, jnp.float32).reshape(B * H, Lp, 1)

    kw = dict(tile=tile, ratio=plan.ratio, scale=scale, num_heads=H,
              nc=nc, pad_start=pad_start, has_bias=has_bias)
    layout_spec_rows = (
        pl.BlockSpec((1, plan.ratio, plan.layout_pad.shape[2]),
                     lambda qi, bh, c, i: (bh % H, qi, 0))
        if plan.ratio >= 8 else
        pl.BlockSpec((1,) + plan.layout_pad.shape[1:],
                     lambda qi, bh, c, i: (bh % H, 0, 0)))
    layout_spec_full = pl.BlockSpec(
        (1,) + plan.layout_pad.shape[1:], lambda bh, j, c, i: (bh % H, 0, 0))
    bias_spec_rows = (pl.BlockSpec((1, tile, Lp),
                                   lambda qi, bh, c, i: (0, qi, 0))
                      if has_bias else
                      pl.BlockSpec((1, tile, Lp),
                                   lambda qi, bh, c, i: (0, 0, 0)))
    bias_spec_cols = (pl.BlockSpec((1, Lp, tile),
                                   lambda bh, j, c, i: (0, 0, j))
                      if has_bias else
                      pl.BlockSpec((1, tile, Lp),
                                   lambda bh, j, c, i: (0, 0, 0)))

    # ---- dq (+ dbias) over (q-tile, bh) — bh innermost so the shared
    # dbias block is revisited CONSECUTIVELY (see _bwd_dq_kernel) -----------
    grid_dq = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt, B * H),
        in_specs=[
            pl.BlockSpec((1, tile, D), lambda qi, bh, c, i: (bh, qi, 0)),
            pl.BlockSpec((1, Lp, D), lambda qi, bh, c, i: (bh, 0, 0)),
            pl.BlockSpec((1, Lp, D), lambda qi, bh, c, i: (bh, 0, 0)),
            layout_spec_rows,
            bias_spec_rows,
            pl.BlockSpec((1, tile, D), lambda qi, bh, c, i: (bh, qi, 0)),
            pl.BlockSpec((1, tile, 1), lambda qi, bh, c, i: (bh, qi, 0)),
            pl.BlockSpec((1, tile, 1), lambda qi, bh, c, i: (bh, qi, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, D), lambda qi, bh, c, i: (bh, qi, 0)),
            pl.BlockSpec((1, tile, Lp), lambda qi, bh, c, i: (0, qi, 0)),
        ),
    )
    dq, dbias = pl.pallas_call(
        partial(_bwd_dq_kernel, **kw),
        grid_spec=grid_dq,
        out_shape=(jax.ShapeDtypeStruct((B * H, Lp, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, Lp, Lp), jnp.float32)),
        interpret=interpret,
    )(jnp.asarray(plan.counts), jnp.asarray(plan.indices),
      qp, kp, vp, jnp.asarray(plan.layout_pad), biasp, dop, lse_p, delta)

    # ---- dk/dv over (bh, kv-tile) -----------------------------------------
    grid_dkv = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B * H, nt),
        in_specs=[
            pl.BlockSpec((1, Lp, D), lambda bh, j, c, i: (bh, 0, 0)),
            pl.BlockSpec((1, tile, D), lambda bh, j, c, i: (bh, j, 0)),
            pl.BlockSpec((1, tile, D), lambda bh, j, c, i: (bh, j, 0)),
            layout_spec_full,
            bias_spec_cols,
            pl.BlockSpec((1, Lp, D), lambda bh, j, c, i: (bh, 0, 0)),
            pl.BlockSpec((1, Lp, 1), lambda bh, j, c, i: (bh, 0, 0)),
            pl.BlockSpec((1, Lp, 1), lambda bh, j, c, i: (bh, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, D), lambda bh, j, c, i: (bh, j, 0)),
            pl.BlockSpec((1, tile, D), lambda bh, j, c, i: (bh, j, 0)),
        ),
    )
    dk, dv = pl.pallas_call(
        partial(_bwd_dkv_kernel, **kw),
        grid_spec=grid_dkv,
        out_shape=(jax.ShapeDtypeStruct((B * H, Lp, D), jnp.float32),
                   jax.ShapeDtypeStruct((B * H, Lp, D), jnp.float32)),
        interpret=interpret,
    )(jnp.asarray(plan_t.counts), jnp.asarray(plan_t.indices),
      qp, kp, vp, jnp.asarray(plan.layout_pad), biasp, dop, lse_p, delta)

    dq = dq[:, :L].reshape(B, H, L, D).astype(q.dtype)
    dk = dk[:, :L].reshape(B, H, L, D).astype(k.dtype)
    dv = dv[:, :L].reshape(B, H, L, D).astype(v.dtype)
    dbias_out = dbias[0, :L, :L] if has_bias else None
    return dq, dk, dv, dbias_out
