"""Serving-shape experiments round 3:
  1. cross-attention (M=257): Pallas kernel vs fused XLA dense;
  2. transpose-free self-attention kernel prototype taking (B, N, H*D)
     and writing (B, N, H*D) — no HBM head transposes.

Run: python scripts_dev/attn_probe3.py [reps] [B]
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
H, N, D = 16, 1792, 64
MC = 256  # cross-attention context (null handled separately -> 257)
TILE_Q = 128

rng = np.random.default_rng(0)
# (B, H, .) layout operands
q4 = jnp.asarray(rng.normal(0, 1, (B, H, N, D)), jnp.bfloat16)
kc4 = jnp.asarray(rng.normal(0, 1, (B, H, MC + 1, D)), jnp.bfloat16)
vc4 = jnp.asarray(rng.normal(0, 1, (B, H, MC + 1, D)), jnp.bfloat16)
bias_c = jnp.asarray(rng.normal(0, 0.1, (N, MC + 1)), jnp.float32)
keep = jnp.ones((B,), jnp.float32)
# flat layout operands (transpose-free path)
qf = jnp.asarray(rng.normal(0, 1, (B, N, H * D)), jnp.bfloat16)
kf = jnp.asarray(rng.normal(0, 1, (B, N, H * D)), jnp.bfloat16)
vf = jnp.asarray(rng.normal(0, 1, (B, N, H * D)), jnp.bfloat16)
bias_s = jnp.asarray(rng.normal(0, 0.1, (N, N)), jnp.float32)


def bench(fn, x, name, flops):
    @jax.jit
    def loop(x):
        out, _ = jax.lax.scan(lambda c, _: (fn(c), ()), x, None, length=REPS)
        return out
    o = loop(x)
    np.asarray(o[(0,) * o.ndim])
    t0 = time.perf_counter()
    o = loop(x)
    np.asarray(o[(0,) * o.ndim])
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:34s} {dt:8.3f} ms/call   {flops/dt/1e9:7.1f} GF/ms")


# ---- 1. cross attention ----
cross_flops = 2 * 2 * B * H * N * (MC + 1) * D

bench(lambda x: fa.fused_bias_attention_fwd(x, kc4, vc4, bias_c, keep,
                                            sm_scale=8.0),
      q4, "cross: pallas fused", cross_flops)
bench(lambda x: fa._dense_reference(x, kc4, vc4, bias_c, keep, 8.0),
      q4, "cross: XLA dense", cross_flops)


# ---- 2. transpose-free self-attention prototype ----
def _flat_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, hg, d, sm_scale):
    """Blocks: q (tile_q, hg*d), k/v (Mp, hg*d), bias (tile_q, Mp).
    Heads sliced at static lane offsets; output rebuilt by concat."""
    outs = []
    for h in range(hg):
        sl = slice(h * d, (h + 1) * d)
        qh = q_ref[0, :, sl]
        kh = k_ref[0, :, sl]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * sm_scale + bias_ref[0]
        m_ = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m_)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v_ref.dtype)
        outs.append(jax.lax.dot_general(p, v_ref[0, :, sl],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def flat_attention(qx, kx, vx, bias, head_group=4):
    Np = math.ceil(N / TILE_Q) * TILE_Q
    Mp = Np
    nq = Np // TILE_Q
    hg = head_group
    G = H // hg
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B * G, nq),
        in_specs=[
            pl.BlockSpec((1, TILE_Q, hg * D),
                         lambda g, qi, G=G: (g // G, qi, g % G)),
            pl.BlockSpec((1, Mp, hg * D),
                         lambda g, qi, G=G: (g // G, 0, g % G)),
            pl.BlockSpec((1, Mp, hg * D),
                         lambda g, qi, G=G: (g // G, 0, g % G)),
            pl.BlockSpec((1, TILE_Q, Mp), lambda g, qi: (0, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE_Q, hg * D),
                               lambda g, qi, G=G: (g // G, qi, g % G)),
    )
    return pl.pallas_call(
        partial(_flat_kernel, hg=hg, d=D, sm_scale=8.0),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Np, H * D), qx.dtype),
    )(qx, kx, vx, bias[None])


self_flops = 2 * 2 * B * H * N * N * D
for hg in (2, 4, 8):
    bench(lambda x, h=hg: flat_attention(x, kf, vf, bias_s, head_group=h),
          qf, f"self flat(B,N,HD) hg={hg}", self_flops)

# correctness vs 4D reference (same math)
o_flat = np.asarray(flat_attention(qf, kf, vf, bias_s)[:, :N], np.float32)
q4r = qf.reshape(B, N, H, D).transpose(0, 2, 1, 3)
k4r = kf.reshape(B, N, H, D).transpose(0, 2, 1, 3)
v4r = vf.reshape(B, N, H, D).transpose(0, 2, 1, 3)
s = jnp.einsum("bhid,bhjd->bhij", q4r, k4r,
               preferred_element_type=jnp.float32) * 8.0 + bias_s[None, None]
p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
o_ref = jnp.einsum("bhij,bhjd->bhid", p, v4r,
                   preferred_element_type=jnp.float32)
o_ref = np.asarray(o_ref.transpose(0, 2, 1, 3).reshape(B, N, H * D),
                   np.float32)
err = np.abs(o_flat - o_ref).max() / (np.abs(o_ref).max() + 1e-6)
print(f"flat kernel max rel err vs dense: {err:.2e}")
