"""Single-position (decode-time) attention kernel.

One Pallas pass computes softmax(q.K^T * scale + addend).V for ONE
query position against a static-width cache prefix — the AR decoder's
per-layer attention (models/stage2/ar_cached.decode_step_unrolled),
which XLA otherwise runs as ~5 separate fusions (scores dot, scale+
addend, max/exp/sum, div, AV dot) whose per-op overheads dominate at
(b=2, H=16, dh=64) sizes.

Layout: the (b, H) pairs flatten to rows; each grid cell owns ROWS_PER
rows (the TPU block-shape rule needs the second-minor block dim
divisible by 8) and finishes each row — scores dot, softmax, AV dot —
in a static in-kernel loop over its rows. The whole (pl, dh) K/V
prefixes for 8 rows stay ~5 MB of VMEM, so no online-softmax loop is
needed.

`addend` carries the mask and bias pre-folded by the caller:
bias*scale where attendable, NEG_INF where masked (exp underflows to
exactly 0.0 in f32).

Replaces no reference component by itself — it is a faster formulation
of cond_transformer_multi_view.py:172-227's per-token attention math
(which the reference computes by running the FULL L-position forward).
Env-gated default (BEVGEN_AR_ATTN) until TPU-measured faster.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
ROWS_PER = 8


def _vmem_scope_bytes() -> int:
    from bevgen_tpu.ops.pallas.fused_attention import _vmem_scope_bytes
    return _vmem_scope_bytes()


def _kernel(q_ref, k_ref, v_ref, a_ref, o_ref, *, sm_scale):
    # every operand stays 2-D with static row slices: Mosaic cannot
    # insert a minor dim on 16-bit types, and (1, pl)-shaped score rows
    # keep the softmax reductions on the lane dim
    outs = []
    for r in range(ROWS_PER):
        q2 = q_ref[r:r + 1]                            # (1, dh)
        K = k_ref[r]                                   # (pl, dh)
        V = v_ref[r]                                   # (pl, dh)
        a = a_ref[r]                                   # (1, pl) f32
        s = jax.lax.dot_general(
            q2, K, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (1, pl)
        s = s * sm_scale + a
        m = jnp.max(s)
        p = jnp.exp(s - m)                             # (1, pl) f32
        d = jnp.sum(p)
        # probs at the cache dtype for the AV contraction (same
        # convention as the jnp path: probs.astype(v.dtype))
        pb = (p / d).astype(V.dtype)
        o = jax.lax.dot_general(
            pb, V, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (1, dh)
        outs.append(o)
    o_ref[...] = jnp.concatenate(outs, axis=0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def decode_attention(q, k, v, addend, sm_scale: float,
                     interpret: bool = False):
    """q: (b, H, dh); k, v: (b, H, pl, dh); addend: (H, pl, 1) f32
    (bias*scale + mask). Returns (b, H, dh) in q.dtype.
    Requires b*H to be a multiple of 8 (pad the batch otherwise)."""
    b, H, dh = q.shape
    pl_len = k.shape[2]
    R = b * H
    if R % ROWS_PER != 0:
        # tiny configs — row padding isn't worth it; the jnp math is
        # identical (this is the inline path's formulation)
        return decode_attention_reference(q, k, v, addend, sm_scale)
    qf = q.reshape(R, dh)
    kf = k.reshape(R, pl_len, dh)
    vf = v.reshape(R, pl_len, dh)
    af = jnp.broadcast_to(addend[None, :, None, :, 0],
                          (b, H, 1, pl_len)).reshape(R, 1, pl_len)
    grid = (R // ROWS_PER,)
    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS_PER, dh), lambda i: (i, 0)),
            pl.BlockSpec((ROWS_PER, pl_len, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((ROWS_PER, pl_len, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((ROWS_PER, 1, pl_len), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((ROWS_PER, dh), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, dh), q.dtype),
        # the double-buffered K/V prefixes exceed the 16MB default
        # scope at pl=2432 — request the chip's real VMEM (same
        # calibration as fused_attention._vmem_scope_bytes)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_scope_bytes()),
        interpret=interpret,
    )(qf, kf, vf, af)
    return out.reshape(b, H, dh)


def decode_attention_reference(q, k, v, addend, sm_scale: float):
    """jnp twin of the kernel (the exact math decode_step_unrolled runs
    inline) for equality tests."""
    scores = jnp.einsum("bhd,bhjd->bhj", q.astype(k.dtype), k,
                        preferred_element_type=jnp.float32)
    scores = scores * sm_scale + addend[None, :, :, 0]
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhj,bhjd->bhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
