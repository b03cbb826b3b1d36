"""Block-sparse attention: XLA ground truth vs Pallas kernel (interpret
mode on CPU), semantics vs a hand-rolled dense reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevgen_tpu.ops.attention import make_sparse_attention
from bevgen_tpu.ops.pallas.block_sparse import (block_sparse_attention,
                                                plan_tiles)


def make_case(B=1, H=2, L=256, D=64, block=16, density=0.4, seed=0,
              with_bias=True):
    rng = np.random.default_rng(seed)
    nb = L // block
    layout = (rng.uniform(size=(H, nb, nb)) < density)
    # causal at block granularity + diagonal always on
    tri = np.tril(np.ones((nb, nb), bool))
    layout = layout & tri
    for h in range(H):
        np.fill_diagonal(layout[h], True)
    allowed = np.tril(np.ones((L, L), np.float32))
    bias = rng.standard_normal((L, L)).astype(np.float32) if with_bias else None
    q = rng.standard_normal((B, H, L, D)).astype(np.float32)
    k = rng.standard_normal((B, H, L, D)).astype(np.float32)
    v = rng.standard_normal((B, H, L, D)).astype(np.float32)
    return layout.astype(np.int64), allowed, bias, q, k, v


def dense_reference(layout, allowed, bias, q, k, v, block):
    """Brute-force numpy reference of the DeepSpeed semantics."""
    B, H, L, D = q.shape
    scale = 1.0 / np.sqrt(D)
    big = np.kron(layout, np.ones((block, block)))[:, :L, :L]
    keep = (big > 0) & (allowed > 0)
    out = np.zeros_like(q)
    for b in range(B):
        for h in range(H):
            s = q[b, h] @ k[b, h].T
            if bias is not None:
                s = s + bias
            s = s * scale
            s = np.where(keep[h], s, -1e9)
            s = s - s.max(-1, keepdims=True)
            p = np.exp(s)
            p /= p.sum(-1, keepdims=True)
            out[b, h] = p @ v[b, h]
    return out


def test_xla_path_matches_dense_reference():
    layout, allowed, bias, q, k, v = make_case()
    attn = make_sparse_attention(layout, allowed, block=16, use_pallas=False)
    out = np.asarray(attn(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(bias)))
    ref = dense_reference(layout, allowed, bias, q, k, v, 16)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_pallas_interpret_matches_xla():
    layout, allowed, bias, q, k, v = make_case(L=256)
    out_p = np.asarray(block_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), layout, allowed,
        jnp.asarray(bias), block=16, interpret=True))
    ref = dense_reference(layout, allowed, bias, q, k, v, 16)
    np.testing.assert_allclose(out_p, ref, atol=2e-4)


def test_pallas_interpret_no_bias_unaligned_length():
    # L=200 not a multiple of the 128 tile: exercises padding
    layout, allowed, _, q, k, v = make_case(L=208, with_bias=False,
                                            density=0.6)
    out_p = np.asarray(block_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), layout, allowed,
        None, block=16, interpret=True))
    ref = dense_reference(layout, allowed, None, q, k, v, 16)
    np.testing.assert_allclose(out_p, ref, atol=2e-4)


def test_plan_tiles_counts():
    layout = np.zeros((1, 16, 16), np.int64)  # L=256, block 16, 2 tiles
    layout[0, 0, 0] = 1          # q tile 0 <- kv tile 0
    layout[0, 9, 9] = 1          # q tile 1 <- kv tile 1
    layout[0, 9, 1] = 1          # q tile 1 <- kv tile 0
    plan = plan_tiles(layout, block=16, L=256, tile=128)
    assert plan.counts.tolist() == [[1, 2]]
    assert plan.indices[0, 0, 0] == 0
    assert sorted(plan.indices[0, 1, :2].tolist()) == [0, 1]


def test_gradients_flow_through_custom_vjp():
    layout, allowed, bias, q, k, v = make_case(L=128)
    attn = make_sparse_attention(layout, allowed, block=16, use_pallas=False)

    def loss(q, k, v, b):
        return jnp.sum(attn(q, k, v, b) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


@pytest.mark.slow
def test_block_sparse_backward_matches_dense_grads():
    """Pallas sparse backward (dq + transposed-plan dkv + dbias) vs
    jax.grad of the dense masked reference, interpret mode."""
    layout, allowed, bias, q, k, v = make_case(B=2, H=2, L=256, density=0.4,
                                               seed=3)
    # our backward uses the causal/cond index-mask: this synthetic case
    # is pure-causal (nc inferred as 1 by the fwd path); use nc=0-like
    # semantics by making row 0 attend col 0 only -> set nc=1
    nc = 1
    rng = np.random.default_rng(9)
    do = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))

    out, lse = block_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), layout, allowed,
        jnp.asarray(bias), block=16, num_cond_tokens=nc, return_lse=True,
        interpret=True)
    from bevgen_tpu.ops.pallas.block_sparse import block_sparse_attention_bwd
    dq, dk, dv, dbias = block_sparse_attention_bwd(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), layout,
        jnp.asarray(bias), out, do, lse, block=16, num_cond_tokens=nc,
        interpret=True)

    def dense_loss(q, k, v, bias):
        B, H, L, D = q.shape
        scale = 1.0 / np.sqrt(D)
        big = jnp.repeat(jnp.repeat(jnp.asarray(layout), 16, 1), 16, 2)
        keep = (big[:, :L, :L] > 0) & (jnp.asarray(allowed)[None] > 0)
        s = jnp.einsum("bhid,bhjd->bhij", q, k,
                       preferred_element_type=jnp.float32)
        s = jnp.where(keep[None], (s + bias[None, None]) * scale, -1e9)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhij,bhjd->bhid", p, v,
                       preferred_element_type=jnp.float32)
        return jnp.sum(o * do)

    rq, rk, rv, rbias = jax.grad(dense_loss, argnums=(0, 1, 2, 3))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=5e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=5e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=5e-3)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(rbias),
                               atol=5e-3)
