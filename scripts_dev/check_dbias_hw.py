"""HW check: fused_bias_attention_bwd dbias accumulation on a REAL TPU.

The dbias output block (0, qi, 0) on grid (B*G, nq) is revisited across
the outer g dim (non-consecutive revisits). The Mosaic gotcha list says
plain kernels (no data-dependent fori_loop) accumulate correctly in
that pattern; this re-confirms it empirically at shapes where both
revisit dims are non-trivial (G=2, nq=2) — a shape interpret mode
cannot vouch for.

Run from /root/repo on the axon platform:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts_dev/check_dbias_hw.py
(append — don't replace — PYTHONPATH: the axon PJRT plugin lives in
/root/.axon_site, injected via the default PYTHONPATH).

Measured calibration (2026-08-18, v5e): both sides must run under
jax.default_matmul_precision("highest"). At TPU default precision fp32
dots execute as single-pass bf16 on the MXU, and with sm_scale=3.0 on
N(0,1) q/k at D=64 the logits have std ~24 (a near-one-hot softmax),
so bf16's ~4e-3 relative noise in the DENSE REFERENCE's own matmuls
amplifies to ~0.43 absolute in dq/dk (vs ref max ~95) — that is
reference noise, not a kernel defect. Under "highest" the same shapes
agree to 7e-5 abs, and dbias (the accumulation under test) to 8e-6.
"""
import jax
import jax.numpy as jnp
import numpy as np

from bevgen_tpu.ops.pallas import fused_attention as fa


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    B, H, N, M, D = 2, 4, 256, 140, 64     # head_group 2 -> G=2; nq=2
    rng = np.random.default_rng(3)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    q, k, v, do = mk(B, H, N, D), mk(B, H, M, D), mk(B, H, M, D), mk(B, H, N, D)
    bias = mk(N, M)
    keep = jnp.asarray([1, 1], jnp.int32)

    with jax.default_matmul_precision("highest"):
        dq, dk, dv, dbias = jax.jit(
            lambda *a: fa.fused_bias_attention_bwd(*a, sm_scale=3.0,
                                                   head_group=2))(
            q, k, v, bias, keep, do)

        def loss(q, k, v, bias):
            return jnp.sum(fa._dense_reference(q, k, v, bias, keep, 3.0) * do)

        rq, rk, rv, rbias = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
            q, k, v, bias)

    for name, a, b in (("dq", dq, rq), ("dk", dk, rk), ("dv", dv, rv),
                       ("dbias", dbias, rbias)):
        a, b = np.asarray(a), np.asarray(b)   # materialize = sync on axon
        err = np.abs(a - b).max()
        scale = np.abs(b).max() + 1e-9
        print(f"{name}: max abs err {err:.2e} (ref max {scale:.2e})")
        assert err / scale < 2e-5, f"{name} mismatch on HW: {err} rel {err/scale:.2e}"
    print("fused bwd dbias accumulation OK on real TPU")


if __name__ == "__main__":
    main()
