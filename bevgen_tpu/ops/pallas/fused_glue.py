"""Fused transformer "glue" kernels: residual-add + LayerNorm, and
GEGLU + LayerNorm — the decode's elementwise budget.

Why (round-4 batch-16 device budget, docs/PERF_NOTES.md): with the
matmuls at ~190 TF/s and the attention in Pallas, the next biggest
buckets are XLA's LayerNorm-stats loop fusions (633 ms/b16-generate —
~0.32 ms per (16,1792,1024) pass vs a 0.07 ms pure-read floor; the
tiny S(1) stat outputs serialize the fusion) and the GEGLU gate pass.
Each transformer block runs residual-add -> LN(scale-only) three times
and gate*gelu -> LN once; fusing each chain into ONE memory-bound
Pallas pass removes the separate stats read-pass and the residual
round-trip.

Numerics: bit-compatible with the XLA path at bf16 resolution — the
residual stream is rounded to the compute dtype before the fp32 stats
(exactly what XLA does: x_new is a bf16 tensor), and the scale-only
LayerNorm matches flax nn.LayerNorm(use_bias=False, eps=1e-5)
(muse_maskgit_pytorch.py:62-69 LayerNorm with a zero-buffer beta).

Training: custom_vjp backward recomputes the chain with plain XLA ops,
so gradients are the standard ones; only the forward (inference decode,
where the time goes) runs the kernel.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

EPS = 1e-5


def _pick_tile(rows: int, want: int = 512) -> int:
    """Largest 8-multiple tile <= want dividing rows (rows is padded to
    a multiple of 8 by the wrappers)."""
    t = math.gcd(rows, want)
    while t % 8 and t > 1:
        t = math.gcd(rows, t - (t % 8))
    return max(t, 8) if rows % 8 == 0 else rows


def _pad_rows(x, mult: int):
    r = x.shape[0]
    pad = (-r) % mult
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, r


# ---------------------------------------------------------------------------
# residual + scale-only LayerNorm
# ---------------------------------------------------------------------------


def _res_ln_kernel(x_ref, d_ref, g_ref, xo_ref, no_ref, *, nf: float):
    s = (x_ref[...].astype(jnp.float32) + d_ref[...].astype(jnp.float32))
    sb = s.astype(xo_ref.dtype)
    xo_ref[...] = sb
    sf = sb.astype(jnp.float32)
    mu = jnp.sum(sf, -1, keepdims=True) * (1.0 / nf)
    var = jnp.sum(sf * sf, -1, keepdims=True) * (1.0 / nf) - mu * mu
    g = g_ref[...].astype(jnp.float32)            # (1, F)
    no_ref[...] = ((sf - mu) * jax.lax.rsqrt(var + EPS)
                   * g).astype(no_ref.dtype)


def residual_layernorm_fwd(x, d, gamma, tile: int = 512,
                           interpret: bool = False):
    """x, d: (..., F) compute-dtype; gamma: (F,) fp32.
    Returns (x_new, normed), both x.dtype: x_new = dtype(x + d),
    normed = LN(x_new) * gamma with fp32 stats."""
    shape = x.shape
    F = shape[-1]
    x2 = x.reshape(-1, F)
    d2 = d.reshape(-1, F)
    x2, rows = _pad_rows(x2, 8)
    d2, _ = _pad_rows(d2, 8)
    t = _pick_tile(x2.shape[0], tile)
    grid = (x2.shape[0] // t,)
    xo, no = pl.pallas_call(
        partial(_res_ln_kernel, nf=float(F)),
        grid=grid,
        in_specs=[pl.BlockSpec((t, F), lambda i: (i, 0)),
                  pl.BlockSpec((t, F), lambda i: (i, 0)),
                  pl.BlockSpec((1, F), lambda i: (0, 0))],
        out_specs=(pl.BlockSpec((t, F), lambda i: (i, 0)),
                   pl.BlockSpec((t, F), lambda i: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct(x2.shape, x.dtype),
                   jax.ShapeDtypeStruct(x2.shape, x.dtype)),
        interpret=interpret,
    )(x2, d2, jnp.asarray(gamma, jnp.float32)[None])
    return xo[:rows].reshape(shape), no[:rows].reshape(shape)


def _res_ln_reference(x, d, gamma, dtype):
    s = (x.astype(jnp.float32) + d.astype(jnp.float32)).astype(dtype)
    sf = s.astype(jnp.float32)
    mu = sf.mean(-1, keepdims=True)
    var = (sf * sf).mean(-1, keepdims=True) - mu * mu
    n = ((sf - mu) * jax.lax.rsqrt(var + EPS) * gamma).astype(dtype)
    return s, n


def make_residual_layernorm(use_pallas: Optional[bool] = None):
    """fn(x, d, gamma) -> (x_new, normed). Pallas forward on TPU; the
    backward recomputes through plain XLA ops (jax.vjp), so training
    gradients are the standard LayerNorm ones."""

    @jax.custom_vjp
    def fused(x, d, gamma):
        return residual_layernorm_fwd(x, d, gamma)

    def fwd(x, d, gamma):
        return fused(x, d, gamma), (x, d, gamma)

    def bwd(res, g):
        x, d, gamma = res
        _, vjp = jax.vjp(
            lambda x, d, gamma: _res_ln_reference(x, d, gamma, x.dtype),
            x, d, gamma)
        return vjp(g)

    fused.defvjp(fwd, bwd)

    def dispatch(x, d, gamma):
        on_tpu = jax.default_backend() == "tpu"
        use = use_pallas if use_pallas is not None else on_tpu
        if not use:
            return _res_ln_reference(x, d, gamma, x.dtype)
        return fused(x, d, gamma)

    return dispatch


# ---------------------------------------------------------------------------
# GEGLU + scale-only LayerNorm (padded-lane layout)
# ---------------------------------------------------------------------------


def _erf_as(x):
    """erf via Abramowitz & Stegun 7.1.26 (exp-based): Mosaic has no
    erf primitive. Max abs error 1.5e-7 — three orders of magnitude
    below the bf16 resolution the GEGLU output is rounded to, so the
    kernel remains numerically the XLA chain."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _geglu_ln_kernel(y_ref, g_ref, o_ref, *, fp: int, nf: float):
    y = y_ref[...]
    a = y[:, :fp].astype(jnp.float32)
    gate = y[:, fp:].astype(jnp.float32)
    h = (gate * (a * 0.5 * (1.0 + _erf_as(a * (2.0 ** -0.5)))))
    hb = h.astype(o_ref.dtype)
    hf = hb.astype(jnp.float32)
    mu = jnp.sum(hf, -1, keepdims=True) * (1.0 / nf)
    var = jnp.sum(hf * hf, -1, keepdims=True) * (1.0 / nf) - mu * mu
    g = g_ref[...].astype(jnp.float32)            # (1, fp)
    o_ref[...] = ((hf - mu) * jax.lax.rsqrt(var + EPS)
                  * g).astype(o_ref.dtype)


def geglu_layernorm_fwd(y, gamma_padded, f_real: int, tile: int = 256,
                        interpret: bool = False):
    """y: (..., 2*Fp) — [a | gate] halves, each Fp lanes with the real
    features in [:f_real] and ZEROS beyond (the padded proj_in layout,
    models/stage2/transformer.py _GegluProjIn). gamma_padded: (Fp,)
    fp32, zeros beyond f_real. Returns (..., Fp): LN(gate*gelu(a)) with
    stats over the f_real REAL features (padded h is identically 0 and
    contributes nothing; padded outputs are (0-mu)*rsqrt*0 = 0)."""
    shape = y.shape
    Fp2 = shape[-1]
    fp = Fp2 // 2
    y2 = y.reshape(-1, Fp2)
    y2, rows = _pad_rows(y2, 8)
    t = _pick_tile(y2.shape[0], tile)
    grid = (y2.shape[0] // t,)
    out = pl.pallas_call(
        partial(_geglu_ln_kernel, fp=fp, nf=float(f_real)),
        grid=grid,
        in_specs=[pl.BlockSpec((t, Fp2), lambda i: (i, 0)),
                  pl.BlockSpec((1, fp), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((t, fp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((y2.shape[0], fp), y.dtype),
        interpret=interpret,
    )(y2, jnp.asarray(gamma_padded, jnp.float32)[None])
    return out[:rows].reshape(shape[:-1] + (fp,))


def _geglu_ln_reference(y, gamma_padded, f_real: int, dtype):
    fp = y.shape[-1] // 2
    a = y[..., :fp].astype(jnp.float32)
    gate = y[..., fp:].astype(jnp.float32)
    h = (gate * (a * 0.5 * (1.0 + jax.lax.erf(a * (2.0 ** -0.5))))
         ).astype(dtype)
    hf = h.astype(jnp.float32)
    mu = hf.sum(-1, keepdims=True) / f_real
    var = (hf * hf).sum(-1, keepdims=True) / f_real - mu * mu
    return ((hf - mu) * jax.lax.rsqrt(var + EPS)
            * gamma_padded).astype(dtype)


def make_geglu_layernorm(f_real: int, use_pallas: Optional[bool] = None):
    """fn(y_padded, gamma_padded) -> z_padded (see geglu_layernorm_fwd)."""

    @jax.custom_vjp
    def fused(y, gamma):
        return geglu_layernorm_fwd(y, gamma, f_real)

    def fwd(y, gamma):
        return fused(y, gamma), (y, gamma)

    def bwd(res, g):
        y, gamma = res
        _, vjp = jax.vjp(
            lambda y, gamma: _geglu_ln_reference(y, gamma, f_real, y.dtype),
            y, gamma)
        return vjp(g)

    fused.defvjp(fwd, bwd)

    def dispatch(y, gamma):
        on_tpu = jax.default_backend() == "tpu"
        use = use_pallas if use_pallas is not None else on_tpu
        if not use:
            return _geglu_ln_reference(y, gamma, f_real, y.dtype)
        return fused(y, gamma)

    return dispatch
