"""TPU microbench: chunked cosine kernel vs the strip kernel at decode
shapes. The remote compile service is serialized and slow, so each
variant is opt-in:

  python scripts_dev/attn_probe_chunked.py B reps var [var...]
  vars: acc (chunk256-vs-strip correctness), c256 c448 c896,
        strip4 stripauto, xc256 xstrip (cross-attn M=257)
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bevgen_tpu.ops.pallas import fused_attention as fa

B = int(sys.argv[1])
reps = int(sys.argv[2])
variants = sys.argv[3:]
H, N, D = 16, 1792, 64
M = N

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, H, M, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, H, M, D)), jnp.bfloat16)
nkv = jnp.asarray(rng.standard_normal((2, H, 1, D)), jnp.float32)
qs = jnp.asarray(1 + 0.1 * rng.standard_normal(D), jnp.float32)
ks = jnp.asarray(1 + 0.1 * rng.standard_normal(D), jnp.float32)
bias = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
Mx = 257
kx = jnp.asarray(rng.standard_normal((B, H, Mx, D)), jnp.bfloat16)
vx = jnp.asarray(rng.standard_normal((B, H, Mx, D)), jnp.bfloat16)
bx = jnp.asarray(rng.standard_normal((N, Mx)), jnp.float32)


def sync(x):
    np.asarray(x.ravel()[0])


def bench(fn, label):
    try:
        def body(c, _):
            (x,) = c
            return (fn(x).astype(jnp.bfloat16),), None

        @jax.jit
        def run(q0):
            (o,), _ = jax.lax.scan(body, (q0,), None, length=reps)
            return o

        sync(run(q))
        t0 = time.perf_counter()
        sync(run(q))
        dt = (time.perf_counter() - t0) / reps * 1e3
        flops = 2 * 2 * B * H * N * M * D
        print(f"{label}: {dt:.2f} ms/call  {flops/dt/1e9:.1f} TF/s",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED {str(e)[:200]}", flush=True)


FNS = {
    "c256": (lambda x: fa.fused_cosine_attention_fwd(
        x, k, v, nkv, qs, ks, bias, None, sm_scale=8.0, chunk=256)),
    "c448": (lambda x: fa.fused_cosine_attention_fwd(
        x, k, v, nkv, qs, ks, bias, None, sm_scale=8.0, chunk=448)),
    "c896": (lambda x: fa.fused_cosine_attention_fwd(
        x, k, v, nkv, qs, ks, bias, None, sm_scale=8.0, chunk=896)),
    "strip4": (lambda x: fa.fused_cosine_attention_fwd_strip(
        x, k, v, nkv, qs, ks, bias, None, sm_scale=8.0, head_group=4)),
    "fb": (lambda x: fa.fused_cosine_attention_fwd_fb(
        x, k, v, nkv, qs, ks, bias, None, sm_scale=8.0)),
    "fb8": (lambda x: fa.fused_cosine_attention_fwd_fb(
        x, k, v, nkv, qs, ks, bias, None, sm_scale=8.0, head_group=8)),
    "xfb": (lambda x: fa.fused_cosine_attention_fwd_fb(
        x, kx, vx, nkv, qs, ks, bx, None, sm_scale=8.0)),
    "stripauto": (lambda x: fa.fused_cosine_attention_fwd_strip(
        x, k, v, nkv, qs, ks, bias, None, sm_scale=8.0)),
    "xc256": (lambda x: fa.fused_cosine_attention_fwd(
        x, kx, vx, nkv, qs, ks, bx, None, sm_scale=8.0, chunk=256)),
    "xstrip": (lambda x: fa.fused_cosine_attention_fwd_strip(
        x, kx, vx, nkv, qs, ks, bx, None, sm_scale=8.0)),
    "fb2": (lambda x: fa.fused_cosine_attention_fwd_fb2(
        x, k, v, nkv, qs, ks, bias, None, sm_scale=8.0)),
    "xfb2": (lambda x: fa.fused_cosine_attention_fwd_fb2(
        x, kx, vx, nkv, qs, ks, bx, None, sm_scale=8.0)),
    # cross-attn grid-shape sweep: M is tiny (257 -> Mp 384), so the
    # default tile_q=128 yields a (B*G, 14) grid of minuscule steps —
    # fewer, fatter steps should close the ~3.4ms-vs-~1ms-SoL gap
    "xfb448": (lambda x: fa.fused_cosine_attention_fwd_fb(
        x, kx, vx, nkv, qs, ks, bx, None, sm_scale=8.0, tile_q=448)),
    "xfb2448": (lambda x: fa.fused_cosine_attention_fwd_fb2(
        x, kx, vx, nkv, qs, ks, bx, None, sm_scale=8.0, tile_q=448)),
    "xfb2896": (lambda x: fa.fused_cosine_attention_fwd_fb2(
        x, kx, vx, nkv, qs, ks, bx, None, sm_scale=8.0, tile_q=896,
        head_group=4)),
    "xfb896": (lambda x: fa.fused_cosine_attention_fwd_fb(
        x, kx, vx, nkv, qs, ks, bx, None, sm_scale=8.0, tile_q=896)),
    "xfb1792": (lambda x: fa.fused_cosine_attention_fwd_fb(
        x, kx, vx, nkv, qs, ks, bx, None, sm_scale=8.0, tile_q=1792)),
}


def _xdense(x):
    """XLA dense cosine attention at the cross shapes (fp32 softmax)."""
    def l2n(t):
        n = jnp.sqrt(jnp.sum(jnp.square(t.astype(jnp.float32)), -1,
                             keepdims=True))
        return t.astype(jnp.float32) / jnp.maximum(n, 1e-12)
    qf = (l2n(x) * qs).astype(jnp.bfloat16)
    kf = (l2n(kx) * ks).astype(jnp.bfloat16)
    s = jnp.einsum("bhid,bhjd->bhij", qf, kf,
                   preferred_element_type=jnp.float32) * 8.0 + bx[None, None]
    p = jax.nn.softmax(s, -1).astype(jnp.bfloat16)
    return jnp.einsum("bhij,bhjd->bhid", p, vx,
                      preferred_element_type=jnp.float32)


FNS["xdense"] = _xdense

for var in variants:
    if var == "accfb2":
        @jax.jit
        def _maxerr_fb2(q):
            a = fa.fused_cosine_attention_fwd_fb2(
                q, k, v, nkv, qs, ks, bias, None, sm_scale=8.0)
            b = fa.fused_cosine_attention_fwd_strip(
                q, k, v, nkv, qs, ks, bias, None, sm_scale=8.0)
            d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
            return jnp.max(d), jnp.max(jnp.abs(b.astype(jnp.float32)))
        err, scale_ = jax.device_get(_maxerr_fb2(q))
        print(f"fb2 vs strip (TPU): max abs {float(err):.3e} "
              f"rel {float(err)/(float(scale_)+1e-9):.3e}", flush=True)
        continue
    if var == "accfb":
        @jax.jit
        def _maxerr_fb(q):
            a = fa.fused_cosine_attention_fwd_fb(
                q, k, v, nkv, qs, ks, bias, None, sm_scale=8.0)
            b = fa.fused_cosine_attention_fwd_strip(
                q, k, v, nkv, qs, ks, bias, None, sm_scale=8.0)
            d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
            return jnp.max(d), jnp.max(jnp.abs(b.astype(jnp.float32)))
        err, scale_ = jax.device_get(_maxerr_fb(q))
        print(f"fb vs strip (TPU): max abs {float(err):.3e} "
              f"rel {float(err)/(float(scale_)+1e-9):.3e}", flush=True)
        continue
    if var == "acc":
        @partial(jax.jit, static_argnums=1)
        def _maxerr(q, chunk):
            a = fa.fused_cosine_attention_fwd(
                q, k, v, nkv, qs, ks, bias, None, sm_scale=8.0, chunk=chunk)
            b = fa.fused_cosine_attention_fwd_strip(
                q, k, v, nkv, qs, ks, bias, None, sm_scale=8.0,
                head_group=4)
            d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
            return jnp.max(d), jnp.max(jnp.abs(b.astype(jnp.float32)))
        err, scale_ = jax.device_get(_maxerr(q, 256))
        print(f"chunk256 vs strip: max abs {float(err):.3e} "
              f"rel {float(err)/(float(scale_)+1e-9):.3e}", flush=True)
    else:
        bench(FNS[var], var)
print("done")
