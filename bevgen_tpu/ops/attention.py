"""Block-sparse multi-head attention ops.

TPU-native replacement for the reference's vendored DeepSpeed Triton
block-sparse attention (modules/transformer/sparse_self_attention.py):
per-head block layouts, a multiplicative [L,L] 0/1 mask applied inside
kept blocks ('mul' mask mode converts zeros to -inf, DeepSpeed
softmax.py), and an optional additive dense bias scattered by layout
(the 'add_mask' extension, sparse_self_attention.py:155-163 — added to
RAW scores, so it is scaled together with qk^T).

Two implementations with identical semantics:
  * XLA dense-masked attention — the combined mask is expanded from the
    small (H, nb, nb) layout inside the jitted program; ground truth.
  * Pallas flash-style kernels (ops/pallas/block_sparse.py) skipping
    inactive 128-tiles — the hot path on TPU for BOTH directions: the
    forward saves per-row lse, and the custom_vjp backward runs the
    dq/dbias and transposed-plan dk/dv kernels.

The reference kernels are fp16-only (sparse_self_attention.py:127);
here bf16/fp32 both work, softmax always fp32.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


def expand_layout_mask(layout, allowed, block: int):
    """(H, nb, nb) layout + (L, L) mul-mask -> (H, L, L) bool keep-mask,
    built in-graph from small constants."""
    big = jnp.repeat(jnp.repeat(jnp.asarray(layout), block, axis=1),
                     block, axis=2)                       # (H, Lb, Lb)
    L = allowed.shape[-1]
    big = big[:, :L, :L]
    return (big > 0) & (jnp.asarray(allowed)[None] > 0)


def make_sparse_attention(layout: np.ndarray, allowed: np.ndarray,
                          block: int = 16, tile: int = 128,
                          scale: Optional[float] = None,
                          use_pallas: Optional[bool] = None,
                          num_cond_tokens: Optional[int] = None,
                          num_pad_tokens: int = 0) -> Callable:
    """Build `attn(q, k, v, bias=None) -> out` for a fixed sparse layout.

    layout: (H, nb, nb) 0/1; allowed: (L, L) 0/1 — static artifacts.
    bias: optional traced (L, L) additive bias (learned camera bias),
    added to raw scores before scaling (DeepSpeed semantics).
    q,k,v: (B, H, L, D).
    """
    layout = np.asarray(layout, np.int32)
    allowed = np.asarray(allowed, np.float32)

    def _scale(d):
        return scale if scale is not None else 1.0 / float(np.sqrt(d))

    def dense(q, k, v, bias):
        keep = expand_layout_mask(layout, allowed, block)
        s = jnp.einsum("bhid,bhjd->bhij", q, k,
                       preferred_element_type=jnp.float32)
        if bias is not None:
            s = s + bias[None, None]
        s = s * _scale(q.shape[-1])
        s = jnp.where(keep[None], s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32).astype(v.dtype)

    # the kernel only wins when enough 128-tiles actually skip: random
    # fine-grained blocks coarsen to near-dense (measured: 16-token
    # blocks at fine density 0.24 -> coarse 0.53, kernel 14ms vs dense
    # 10ms; 128-token blocks at 0.23 -> kernel 5ms vs dense 10ms)
    pallas_ok = tile % block == 0
    if pallas_ok:
        from bevgen_tpu.ops.pallas.block_sparse import plan_tiles
        plan = plan_tiles(layout, block, allowed.shape[-1], tile)
        coarse_density = float(plan.counts.mean()) / plan.counts.shape[-1]
        pallas_ok = coarse_density < 0.45

    def _nc(q):
        if num_cond_tokens is not None:
            return num_cond_tokens
        a0 = allowed[0]
        return int(np.argmin(a0)) if a0.min() == 0 else allowed.shape[-1]

    @jax.custom_vjp
    def attn(q, k, v, bias):
        from bevgen_tpu.ops.pallas.block_sparse import block_sparse_attention
        return block_sparse_attention(q, k, v, layout, allowed, bias,
                                      block=block, tile=tile,
                                      scale=_scale(q.shape[-1]),
                                      num_cond_tokens=num_cond_tokens,
                                      num_pad_tokens=num_pad_tokens)

    def fwd(q, k, v, bias):
        from bevgen_tpu.ops.pallas.block_sparse import block_sparse_attention
        out, lse = block_sparse_attention(q, k, v, layout, allowed, bias,
                                          block=block, tile=tile,
                                          scale=_scale(q.shape[-1]),
                                          num_cond_tokens=num_cond_tokens,
                                          num_pad_tokens=num_pad_tokens,
                                          return_lse=True)
        return out, (q, k, v, bias, out, lse)

    def bwd(res, g):
        q, k, v, bias, out, lse = res
        from bevgen_tpu.ops.pallas.block_sparse import (
            block_sparse_attention_bwd)
        dq, dk, dv, dbias = block_sparse_attention_bwd(
            q, k, v, layout, bias, out, g.astype(q.dtype), lse,
            block=block, tile=tile, scale=_scale(q.shape[-1]),
            num_cond_tokens=_nc(q), num_pad_tokens=num_pad_tokens)
        # dbias is None exactly when bias was None (the kernels skip all
        # bias reads and the whole dbias pass — no zeros stand-in that
        # would bill dead gradient work for camera_bias=False configs)
        return dq, dk, dv, dbias

    attn.defvjp(fwd, bwd)

    def dispatch(q, k, v, bias=None):
        on_tpu = jax.default_backend() == "tpu"
        use = use_pallas if use_pallas is not None else (on_tpu and pallas_ok)
        if use:
            return attn(q, k, v, bias)
        return dense(q, k, v, bias)

    # introspection for benchmarks/tests: does THIS layout take the
    # Pallas kernel on TPU? (bench.py asserts the AR row actually
    # exercises the kernel rather than the dense fallback)
    dispatch.pallas_ok = bool(pallas_ok)
    return dispatch
