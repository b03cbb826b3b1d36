"""Practical MXU peak on THIS chip: big square bf16/int8 matmuls in an
on-device scan. Establishes the denominator for every MFU claim.

  python scripts_dev/mxu_peak_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(t):
    np.asarray(t.ravel()[0])


def bench(fn, x, label, flops, scan_len=16):
    def body(c, _):
        return fn(c), None

    @jax.jit
    def run(x0):
        out, _ = jax.lax.scan(body, x0, None, length=scan_len)
        return out

    sync(run(x))
    t0 = time.perf_counter()
    sync(run(x))
    dt = (time.perf_counter() - t0) / scan_len
    print(f"{label}: {dt*1e3:.2f} ms  {flops/dt/1e12:.1f} TF/s", flush=True)


rng = np.random.default_rng(0)
n = 8192
a = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
bench(lambda c: (c @ w).astype(jnp.bfloat16), a, f"bf16 {n}x{n}x{n}",
      2 * n ** 3)

ai = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
wi = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
bench(lambda c: jax.lax.dot_general(
    c, wi, (((1,), (0,)), ((), ())),
    preferred_element_type=jnp.int32).astype(jnp.int8), ai,
    f"int8 {n}x{n}x{n}", 2 * n ** 3)

# the decode's actual proj shapes at b16
B, L, dim = 16, 1792, 1024
inner = 5460
x = jnp.asarray(rng.standard_normal((B, L, dim)), jnp.bfloat16)
k1 = jnp.asarray(rng.standard_normal((dim, inner)), jnp.bfloat16)
k2 = jnp.asarray(rng.standard_normal((inner, dim)), jnp.bfloat16)
bench(lambda c: ((c @ k1) @ k2).astype(jnp.bfloat16), x,
      "proj_in+out b16", 2 * B * L * dim * inner * 2)
k1f = k1.reshape(dim, inner)
x2 = x.reshape(B * L, dim)
bench(lambda c: ((c @ k1f) @ k2).astype(jnp.bfloat16), x2,
      "proj flat (B*L) b16", 2 * B * L * dim * inner * 2)
print("done")
