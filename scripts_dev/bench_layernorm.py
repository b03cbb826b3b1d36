"""Microbench: fused Pallas LayerNorm vs XLA LayerNorm at decode shapes.

Run on the real TPU:  python scripts_dev/bench_layernorm.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from bevgen_tpu.ops.pallas.layernorm import fused_layernorm


def xla_ln(x, scale, eps=1e-5):
    f32 = x.astype(jnp.float32)
    mean = jnp.mean(f32, axis=-1, keepdims=True)
    var = jnp.mean(f32 * f32, axis=-1, keepdims=True) - mean * mean
    y = (f32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def sync(v):
    np.asarray(jax.device_get(v.ravel()[0]))


def timeit(fn, *args, reps=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    key = jax.random.PRNGKey(0)
    D = 1024
    scale = jax.random.normal(key, (D,), jnp.float32)
    for B, N in [(4, 1792), (32, 1792), (4, 256), (32, 256)]:
        x = jax.random.normal(key, (B, N, D), jnp.bfloat16)
        f_fused = jax.jit(lambda x: fused_layernorm(x, scale))
        f_xla = jax.jit(lambda x: xla_ln(x, scale))
        # chained: 8 back-to-back LNs to amortize dispatch overhead and
        # mimic the decode loop's per-layer cadence
        f_fused8 = jax.jit(
            lambda x: [x := fused_layernorm(x + 0.001, scale)
                       for _ in range(8)][-1])
        f_xla8 = jax.jit(
            lambda x: [x := xla_ln(x + 0.001, scale) for _ in range(8)][-1])
        tf = timeit(f_fused, x)
        tx = timeit(f_xla, x)
        tf8 = timeit(f_fused8, x)
        tx8 = timeit(f_xla8, x)
        bytes_rw = 2 * B * N * D * 2  # bf16 read+write
        print(f"B={B:3d} N={N:5d}: single fused {tf*1e6:8.1f}us "
              f"xla {tx*1e6:8.1f}us | x8-chain fused {tf8*1e6:8.1f}us "
              f"xla {tx8*1e6:8.1f}us | roofline {bytes_rw/819e9*1e6:6.1f}us"
              f" (819GB/s HBM)")


if __name__ == "__main__":
    main()
