"""TPU decomposition of the MUSE decode layer at batch 16 (flagship
7-cam shapes): where do the ~14 ms/layer go?

  python scripts_dev/layer_decomp.py B reps part [part...]
  parts: fwd (full transformer forward), fwd1 (num_layers=1),
         ff (GEGLU block), qkvo (the four projections),
         dense1 (proj_in-sized single matmul), q8 (QuantDense proj_in),
         samp (one maskgit demask+critic scan step's sampling glue)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1])
reps = int(sys.argv[2])
parts = sys.argv[3:]

from bevgen_tpu.core.config import argoverse_muse_7cam_config

cfg = argoverse_muse_7cam_config()
tf = cfg.transformer
L = tf.num_img_tokens          # 1792
dim = tf.num_embed             # 1024
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, L, dim)), jnp.bfloat16)


def sync(t):
    np.asarray(t.ravel()[0])


def bench(fn, label, scan_len=8):
    def body(c, _):
        return fn(c).astype(jnp.bfloat16), None

    @jax.jit
    def run(x0):
        out, _ = jax.lax.scan(body, x0, None, length=scan_len)
        return out

    sync(run(x))
    t0 = time.perf_counter()
    sync(run(x))
    dt = (time.perf_counter() - t0) / scan_len * 1e3
    print(f"{label}: {dt:.2f} ms", flush=True)


if "fwd" in parts or "fwd1" in parts:
    from bevgen_tpu.models.stage2.transformer import MultiViewTransformer
    from bevgen_tpu.models import geometry

    nl = tf.num_layers if "fwd" in parts else 1
    tfl = tf.replace(num_layers=nl)
    model = MultiViewTransformer(tfl, dtype=jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, tf.vocab_size,
                                   (B, tf.num_cams, tf.num_cam_tokens)),
                      jnp.int32)
    cond = jnp.asarray(rng.integers(0, tf.cond_vocab_size,
                                    (B, tf.num_cond_tokens)), jnp.int32)
    ii, ei = geometry.canonical_rig_inverses(tf, B)
    ii, ei = jnp.asarray(ii), jnp.asarray(ei)
    params = model.init(jax.random.PRNGKey(0), ids[:1], cond[:1],
                        ii[:1], ei[:1])

    @jax.jit
    def run_fwd(ids):
        return model.apply(params, ids, cond, ii, ei).logits

    sync(run_fwd(ids))
    t0 = time.perf_counter()
    n = max(reps, 3)
    for _ in range(n):
        sync(run_fwd(ids))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"forward({nl}L): {dt:.2f} ms", flush=True)

if "ff" in parts:
    from bevgen_tpu.models.stage2.transformer import GEGLUFeedForward
    ff = GEGLUFeedForward(dim, tf.ff_mult, dtype=jnp.bfloat16)
    fp = ff.init(jax.random.PRNGKey(0), x[:1, :8])
    bench(lambda t: ff.apply(fp, t), "ff_block")

if "qkvo" in parts:
    kq = jnp.asarray(rng.standard_normal((dim, dim)), jnp.bfloat16)
    kkv = jnp.asarray(rng.standard_normal((dim, 2 * dim)), jnp.bfloat16)
    ko = jnp.asarray(rng.standard_normal((dim, dim)), jnp.bfloat16)

    def qkvo(t):
        q = t @ kq
        kv = t @ kkv
        o = q @ ko
        return o + kv[..., :dim] + kv[..., dim:]
    bench(qkvo, "qkvo_matmuls")

if "dense1" in parts:
    inner = int(dim * tf.ff_mult * 2 / 3) * 2
    kk = jnp.asarray(rng.standard_normal((dim, inner)), jnp.bfloat16)
    ko = jnp.asarray(rng.standard_normal((inner, dim)), jnp.bfloat16)
    bench(lambda t: (t @ kk) @ ko, "proj_in+out_matmuls")

if "q8" in parts:
    from bevgen_tpu.ops.quant import QuantDense
    inner = int(dim * tf.ff_mult * 2 / 3) * 2
    qd = QuantDense(inner, dtype=jnp.bfloat16)
    qp = qd.init(jax.random.PRNGKey(0), x[:1, :8])
    qd2 = QuantDense(dim, dtype=jnp.bfloat16)
    qp2 = qd2.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 8, inner), jnp.bfloat16))
    bench(lambda t: qd2.apply(qp2, qd.apply(qp, t)), "q8_proj_in+out")

print("done")
