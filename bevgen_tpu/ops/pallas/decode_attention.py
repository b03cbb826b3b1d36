"""Single-position (decode-time) attention kernel.

One Pallas pass computes softmax(q.K^T * scale + addend).V for ONE
query position against a static-width cache prefix — the AR decoder's
per-layer attention (models/stage2/ar_cached.decode_step_unrolled),
which XLA otherwise runs as ~5 separate fusions (scores dot, scale+
addend, max/exp/sum, div, AV dot) whose per-op overheads dominate at
(b=2, H=16, dh=64) sizes. The whole (pl, dh) K and V prefixes fit VMEM
(<= 2432 x 64 bf16 = 311 KB each), so no online-softmax loop is needed:
grid (b, H), one shot per row.

`addend` carries the mask and bias pre-folded by the caller:
bias*scale where attendable, NEG_INF where masked (exp underflows to
exactly 0.0 in f32) — shaped (H, pl, 1) to respect the TPU (row, lane,
1) rule for per-row scalars.

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

NEG_INF = -1e9


def _kernel(q_ref, k_ref, v_ref, a_ref, o_ref, *, sm_scale):
    q = q_ref[0, 0]                                    # (dh,) bf16-ish
    K = k_ref[0, 0]                                    # (pl, dh)
    V = v_ref[0, 0]                                    # (pl, dh)
    a = a_ref[0]                                       # (pl, 1) f32
    s = jax.lax.dot_general(
        K, q[:, None], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (pl, 1)
    s = s * sm_scale + a
    m = jnp.max(s)
    p = jnp.exp(s - m)                                 # (pl, 1) f32
    d = jnp.sum(p)
    # probs at the cache dtype for the AV contraction (same convention
    # as the jnp path: probs.astype(v.dtype))
    pb = (p / d).astype(V.dtype)
    o = jax.lax.dot_general(
        pb, V, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (1, dh)
    o_ref[0, 0] = o[0].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def decode_attention(q, k, v, addend, sm_scale: float,
                     interpret: bool = False):
    """q: (b, H, dh); k, v: (b, H, pl, dh); addend: (H, pl, 1) f32
    (bias*scale + mask). Returns (b, H, dh) in q.dtype."""
    b, H, dh = q.shape
    pl_len = k.shape[2]
    grid = (b, H)
    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, dh), lambda i, h: (i, h, 0)),
            pl.BlockSpec((1, 1, pl_len, dh), lambda i, h: (i, h, 0, 0)),
            pl.BlockSpec((1, 1, pl_len, dh), lambda i, h: (i, h, 0, 0)),
            pl.BlockSpec((1, pl_len, 1), lambda i, h: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, dh), lambda i, h: (i, h, 0)),
        out_shape=jax.ShapeDtypeStruct((b, H, dh), q.dtype),
        interpret=interpret,
    )(q, k, v, addend)
    return out


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
