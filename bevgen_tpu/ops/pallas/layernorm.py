"""Scale-only LayerNorm as a single-pass Pallas TPU kernel.

STATUS: measured dead end — kept tested but NOT wired by default
(models/stage2/transformer.py LayerNormG defaults to the XLA path).
Motivation was the profiled "elementwise/convert fusions ~25%" decode
line item (XLA's cross-lane mean/variance reductions run ~3.7x off the
HBM roofline). The kernel reads each (tile, D) row block once, computes
sum(x) and sum(x^2) on the MXU (dot with a ones vector — lane reductions
are the VPU's weak spot, and the MXU is idle during LN), normalizes
in-register, and writes bf16. It is numerically exact vs flax, but
END-TO-END SLOWER: 8.59 vs 9.2 img/s (batch-2 flagship generate, real
v5e); x8-chain microbench 4.97 ms fused vs 4.35 ms XLA at the decode's
(32, 1792, 1024) shape (scripts_dev/bench_layernorm.py). Cause: a
standalone LN kernel forfeits XLA's fusion of the norm into the adjacent
residual-add / matmul-epilogue chains, so the extra HBM round trips cost
more than the in-kernel reduction saves. Per-row statistics only reduce
over D, so ragged row tiles need no masking; the D axis is masked when
padded.

Numerics match flax nn.LayerNorm(use_bias=False, use_scale=True,
eps=1e-5) with fp32 statistics (E[x^2] - E[x]^2 fast variance), i.e. the
reference's scale-only LayerNorm (muse_maskgit_pytorch.py:62-69).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ln_kernel(x_ref, scale_ref, ones_ref, o_ref, *, eps: float,
               d_real: int):
    x = x_ref[0].astype(jnp.float32)                     # (T, Dp)
    dp = x.shape[-1]
    if dp != d_real:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, dp), 1)
        x = jnp.where(lane < d_real, x, 0.0)
    ones = ones_ref[...]                                 # (Dp, 128) col0=1
    s1 = jax.lax.dot(x, ones,
                     preferred_element_type=jnp.float32)[:, :1]   # (T,1)
    s2 = jax.lax.dot(x * x, ones,
                     preferred_element_type=jnp.float32)[:, :1]
    mean = s1 / d_real
    var = s2 / d_real - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    y = (x - mean) * rstd * scale_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def fused_layernorm(x, scale, eps: float = 1e-5, tile: int = 256,
                    interpret: bool = False):
    """x: (..., N, D) any leading batch dims; scale: (D,). Returns
    LayerNorm(x) * scale in x.dtype with fp32 statistics."""
    orig_shape = x.shape
    D = orig_shape[-1]
    x2 = x.reshape(-1, orig_shape[-2], D)                # (B, N, D)
    B, N, _ = x2.shape
    Dp = math.ceil(D / 128) * 128
    tile = min(tile, math.ceil(N / 8) * 8)
    nq = math.ceil(N / tile)

    ones = jnp.zeros((Dp, 128), jnp.float32).at[:D, 0].set(1.0)
    scale2 = jnp.asarray(scale, jnp.float32).reshape(1, D)
    if Dp != D:
        x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, Dp - D)))
        scale2 = jnp.pad(scale2, ((0, 0), (0, Dp - D)))

    out = pl.pallas_call(
        partial(_ln_kernel, eps=eps, d_real=D),
        grid=(B, nq),
        in_specs=[
            pl.BlockSpec((1, tile, Dp), lambda b, q: (b, q, 0)),
            pl.BlockSpec((1, Dp), lambda b, q: (0, 0)),
            pl.BlockSpec((Dp, 128), lambda b, q: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, Dp), lambda b, q: (b, q, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, Dp), x.dtype),
        interpret=interpret,
    )(x2, scale2, ones)
    if Dp != D:
        out = out[..., :D]
    return out.reshape(orig_shape)


def make_layernorm(eps: float = 1e-5, use_pallas: Optional[bool] = None):
    """ln(x, scale) -> normalized * scale. Pallas forward on TPU;
    backward (training) recomputes through the XLA reference under
    jax.vjp — the decode path is forward-only, training numerics are
    the standard fp32-stat LayerNorm either way."""

    def _dense(x, scale):
        f32 = x.astype(jnp.float32)
        mean = jnp.mean(f32, axis=-1, keepdims=True)
        var = jnp.mean(f32 * f32, axis=-1, keepdims=True) - mean * mean
        y = (f32 - mean) * jax.lax.rsqrt(var + eps)
        return (y * scale.astype(jnp.float32)).astype(x.dtype)

    @jax.custom_vjp
    def ln(x, scale):
        return fused_layernorm(x, scale, eps=eps)

    def fwd(x, scale):
        return ln(x, scale), (x, scale)

    def bwd(res, g):
        x, scale = res
        _, vjp = jax.vjp(_dense, x, scale)
        dx, dscale = vjp(g)
        return dx, dscale.astype(scale.dtype)

    ln.defvjp(fwd, bwd)

    def dispatch(x, scale):
        on_tpu = jax.default_backend() == "tpu"
        use = use_pallas if use_pallas is not None else on_tpu
        if not use:
            return _dense(x, scale)
        return ln(x, scale)

    return dispatch
