"""Fused bias attention: Pallas interpret vs dense reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial

from bevgen_tpu.ops.pallas import fused_attention as fa


def make_case(B=2, H=2, N=96, M=70, D=64, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, H, N, D)).astype(np.float32)
    k = rng.standard_normal((B, H, M, D)).astype(np.float32)
    v = rng.standard_normal((B, H, M, D)).astype(np.float32)
    bias = rng.standard_normal((N, M)).astype(np.float32)
    return q, k, v, bias


def test_fused_matches_dense_with_bias():
    q, k, v, bias = make_case()
    out = np.asarray(fa.fused_bias_attention_fwd(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        sm_scale=8.0, interpret=True))
    ref = np.asarray(fa._dense_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias, None, 8.0))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_fused_keep_flag_masks_all_but_null():
    q, k, v, bias = make_case(B=2)
    keep = jnp.asarray([1, 0], jnp.int32)
    out = np.asarray(fa.fused_bias_attention_fwd(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        keep=keep, sm_scale=8.0, interpret=True))
    ref = np.asarray(fa._dense_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias,
        keep, 8.0))
    np.testing.assert_allclose(out, ref, atol=2e-4)
    # dropped sample: output equals attending ONLY the null column
    null_only = np.broadcast_to(v[1:, :, :1], q[1:].shape[:3] + (v.shape[-1],))
    np.testing.assert_allclose(out[1], null_only[0], atol=2e-4)


def test_fused_no_bias_unaligned():
    q, k, v, _ = make_case(N=100, M=37)
    out = np.asarray(fa.fused_bias_attention_fwd(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None,
        sm_scale=1.0, interpret=True))
    ref = np.asarray(fa._dense_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None, None, 1.0))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_dispatch_gradients():
    q, k, v, bias = make_case(N=32, M=17)
    attn = fa.make_fused_attention(sm_scale=2.0, use_pallas=False)

    def loss(q, k, v, b):
        return jnp.sum(attn(q, k, v, b) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


def test_transformer_fused_matches_dense_cpu():
    """MUSE transformer with use_fused forced on (interpret) vs off."""
    from bevgen_tpu.core.config import MultiViewConfig
    from bevgen_tpu.models.stage2.transformer import CosineAttention
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 24, 64)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((24, 24)).astype(np.float32))
    a_dense = CosineAttention(dim=64, dim_head=32, heads=2, use_fused=False)
    params = a_dense.init(jax.random.PRNGKey(0), x, attn_bias=bias)
    out_d = a_dense.apply(params, x, attn_bias=bias)
    # fused path on CPU runs the pallas kernel in interpret-free mode —
    # emulate by calling the kernel in interpret mode directly through
    # fused_bias_attention_fwd equivalence (covered above); here just
    # confirm the module's dense path is the default off-TPU
    import jax as _jax
    assert _jax.default_backend() == "cpu"
    a_auto = CosineAttention(dim=64, dim_head=32, heads=2)
    out_a = a_auto.apply(params, x, attn_bias=bias)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_a),
                               atol=1e-6)


def test_pallas_backward_matches_dense_grads():
    """fused_bias_attention_bwd vs jax.grad of the dense reference —
    incl. the accumulated dk/dv (revisited over q-tiles) and dbias
    (revisited over groups)."""
    B, H, N, M, D = 2, 4, 160, 70, 64
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, M, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, M, D)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
    keep = jnp.asarray([1, 0], jnp.int32)
    do = jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))

    dq, dk, dv, dbias = fa.fused_bias_attention_bwd(
        q, k, v, bias, keep, do, sm_scale=3.0, head_group=2,
        interpret=True)

    def loss(q, k, v, bias):
        out = fa._dense_reference(q, k, v, bias, keep, 3.0)
        return jnp.sum(out * do)

    rq, rk, rv, rbias = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=2e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=2e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=2e-3)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(rbias),
                               atol=2e-3)


def cosine_case(B=2, H=4, N=96, M=70, D=64, seed=2):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, H, N, D)).astype(np.float32)
    k = rng.standard_normal((B, H, M, D)).astype(np.float32)
    v = rng.standard_normal((B, H, M, D)).astype(np.float32)
    null_kv = rng.standard_normal((2, H, 1, D)).astype(np.float32)
    qs = (1.0 + 0.1 * rng.standard_normal(D)).astype(np.float32)
    ks = (1.0 + 0.1 * rng.standard_normal(D)).astype(np.float32)
    bias = rng.standard_normal((N, M)).astype(np.float32)
    return (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(null_kv), jnp.asarray(qs), jnp.asarray(ks),
            jnp.asarray(bias))


def dense_cosine_reference(q, k, v, null_kv, qs, ks, bias, keep, scale=8.0):
    B, H, N, D = q.shape
    nk = jnp.broadcast_to(null_kv[0][None], (B, H, 1, D))
    nv = jnp.broadcast_to(null_kv[1][None], (B, H, 1, D))
    kc = jnp.concatenate([nk, k], axis=2)
    vc = jnp.concatenate([nv, v], axis=2)

    def l2n(t):
        n = jnp.linalg.norm(t, axis=-1, keepdims=True)
        return t / jnp.maximum(n, 1e-12)

    qf, kf = l2n(q) * qs, l2n(kc) * ks
    s = jnp.einsum("bhid,bhjd->bhij", qf, kf) * scale
    s = s + jnp.pad(bias, ((0, 0), (1, 0)))[None, None]
    if keep is not None:
        col = jnp.arange(kc.shape[2])
        valid = (keep[:, None] > 0) | (col[None] == 0)
        s = jnp.where(valid[:, None, None, :], s, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p, vc)


@pytest.mark.parametrize("keep", [None, "flags"])
def test_fused_cosine_matches_dense(keep):
    q, k, v, nkv, qs, ks, bias = cosine_case()
    keep_arr = jnp.asarray([1, 0], jnp.int32) if keep else None
    out = np.asarray(fa.fused_cosine_attention_fwd(
        q, k, v, nkv, qs, ks, bias, keep_arr, sm_scale=8.0, interpret=True))
    ref = np.asarray(dense_cosine_reference(q, k, v, nkv, qs, ks, bias,
                                            keep_arr))
    np.testing.assert_allclose(out, ref, atol=3e-4)


def test_fused_cosine_multi_group_interpret():
    # H=4, head_group=2 -> 2 groups per batch: exercises the per-group
    # null-KV block indexing
    q, k, v, nkv, qs, ks, bias = cosine_case(H=4)
    out = np.asarray(fa.fused_cosine_attention_fwd(
        q, k, v, nkv, qs, ks, bias, None, sm_scale=8.0, head_group=2,
        interpret=True))
    ref = np.asarray(dense_cosine_reference(q, k, v, nkv, qs, ks, bias,
                                            None))
    np.testing.assert_allclose(out, ref, atol=3e-4)


@pytest.mark.parametrize("keep", [None, "flags"])
def test_fused_cosine_chunked_multi_chunk(keep):
    """Force several kv chunks (chunk=128 < Mp) so the online-softmax
    recurrence (running max / renorm / accumulator) is actually
    exercised, including a final chunk that is all padding."""
    q, k, v, nkv, qs, ks, bias = cosine_case(M=300)
    keep_arr = jnp.asarray([1, 0], jnp.int32) if keep else None
    out = np.asarray(fa.fused_cosine_attention_fwd(
        q, k, v, nkv, qs, ks, bias, keep_arr, sm_scale=8.0, chunk=128,
        interpret=True))
    ref = np.asarray(dense_cosine_reference(q, k, v, nkv, qs, ks, bias,
                                            keep_arr))
    np.testing.assert_allclose(out, ref, atol=3e-4)


FB_VARIANTS = {"fb": "fused_cosine_attention_fwd_fb",
               "fb2": "fused_cosine_attention_fwd_fb2"}


@pytest.mark.parametrize("variant", sorted(FB_VARIANTS))
@pytest.mark.parametrize("keep", [None, "flags"])
@pytest.mark.parametrize("with_bias", [True, False])
def test_fused_cosine_fb_matches_dense(variant, keep, with_bias):
    """The fixed-bound-softmax kernels are the same attention: uniform
    exp scaling cancels in the normalization (fb2 additionally swaps
    exp->exp2 with log2e folded host-side and sums the denominator on
    the MXU via a ones-column in V). Cover padding (M=300 -> Mp=384),
    the CFG keep scalar-add path, and bias=None (rowbound then
    collapses to the scalar cosine bound)."""
    q, k, v, nkv, qs, ks, bias = cosine_case(M=300)
    keep_arr = jnp.asarray([1, 0], jnp.int32) if keep else None
    b = bias if with_bias else None
    fwd = getattr(fa, FB_VARIANTS[variant])
    out = np.asarray(fwd(
        q, k, v, nkv, qs, ks, b, keep_arr, sm_scale=8.0, interpret=True))
    ref = np.asarray(dense_cosine_reference(
        q, k, v, nkv, qs, ks,
        bias if with_bias else jnp.zeros_like(bias), keep_arr))
    np.testing.assert_allclose(out, ref, atol=3e-4)


@pytest.mark.parametrize("variant", sorted(FB_VARIANTS))
def test_fused_cosine_fb_large_bias_range(variant):
    """Stress the fixed-bound gap: a bias with a large spread makes
    exp(s - rowbound) small for most entries — outputs must still match
    the max-subtracted softmax to fp32 accuracy."""
    q, k, v, nkv, qs, ks, bias = cosine_case(seed=7)
    bias = bias * 15.0  # spread ~ +-45 -> worst-case gap ~ 100
    fwd = getattr(fa, FB_VARIANTS[variant])
    out = np.asarray(fwd(
        q, k, v, nkv, qs, ks, bias, None, sm_scale=8.0, interpret=True))
    ref = np.asarray(dense_cosine_reference(q, k, v, nkv, qs, ks, bias,
                                            None))
    np.testing.assert_allclose(out, ref, atol=3e-4)


def test_fused_cosine_fb2c_large_bias_range():
    """fb2c under the same +-45 bias spread as the fb/fb2 stress test.
    fb2c's bf16 strip has absolute quantization error ~2^-9*|bias*log2e|
    — at spread 45 that perturbs dominant-column log-weights by up to
    ~0.13, i.e. softmax weights by several percent (measured max output
    delta 0.16 on this case), so the tolerance is necessarily looser
    than fb/fb2's fp32 strip. Lock (a) the observed bound vs the fp32
    dense reference and (b) near-exactness once the dense side sees the
    same bf16-quantized bias — proving the looser (a) tolerance is
    PURELY bias quantization, not kernel math. (The flagship's camera
    bias spans ~±6 where the strip error is ~1e-2 in log2 units — the
    8e-3 tolerance of the rounding-bounded test above.)"""
    q, k, v, nkv, qs, ks, bias = cosine_case(seed=7)
    bias = bias * 15.0  # spread ~ +-45 -> worst-case gap ~ 100
    out = np.asarray(fa.fused_cosine_attention_fwd_fb2c(
        q, k, v, nkv, qs, ks, bias, None, sm_scale=8.0, chunk=128,
        interpret=True))
    ref = np.asarray(dense_cosine_reference(q, k, v, nkv, qs, ks, bias,
                                            None))
    np.testing.assert_allclose(out, ref, atol=2.5e-1)
    bq = ((bias * fa.LOG2E).astype(jnp.bfloat16).astype(jnp.float32)
          / fa.LOG2E)
    refq = np.asarray(dense_cosine_reference(q, k, v, nkv, qs, ks, bq,
                                             None))
    np.testing.assert_allclose(out, refq, atol=4e-4)


@pytest.mark.parametrize("keep", [None, "flags"])
def test_fused_cosine_fb2c_matches_dense_no_bias(keep):
    """fb2c (chunked fixed-bound kernel) at bias=None is EXACTLY the
    fb2 math: the bf16-quantized uniform 2^-rb factor cancels in the
    normalization (rb and the constant strip quantize identically), so
    it must match the fp32 dense reference to fp accuracy. M=300 ->
    Mp=384, chunk=128 -> 3 chunks exercises the unrolled loop."""
    q, k, v, nkv, qs, ks, bias = cosine_case(M=300)
    keep_arr = jnp.asarray([1, 0], jnp.int32) if keep else None
    out = np.asarray(fa.fused_cosine_attention_fwd_fb2c(
        q, k, v, nkv, qs, ks, None, keep_arr, sm_scale=8.0, chunk=128,
        interpret=True))
    ref = np.asarray(dense_cosine_reference(
        q, k, v, nkv, qs, ks, jnp.zeros_like(bias), keep_arr))
    np.testing.assert_allclose(out, ref, atol=3e-4)


def test_fused_cosine_fb2c_bias_bf16_rounding_bounded():
    """With a bias, fb2c's strip is bf16: per-column bias rounding is
    the ONLY delta vs fb2 — bounded by the bf16 relative step on the
    (bias - rowbound) log2 gap, which for the softmax-dominant columns
    (gap near 0) is far below the pipeline's bf16 compute noise. Lock
    both the closeness to the fp32 dense reference and the exact
    equality once the dense path sees the same quantized bias."""
    q, k, v, nkv, qs, ks, bias = cosine_case(M=300)
    out = np.asarray(fa.fused_cosine_attention_fwd_fb2c(
        q, k, v, nkv, qs, ks, bias, None, sm_scale=8.0, chunk=128,
        interpret=True))
    ref = np.asarray(dense_cosine_reference(q, k, v, nkv, qs, ks, bias,
                                            None))
    # bf16 rounding of a ~N(0,1) bias perturbs weights by ~2^-9 * |bias|
    # in log2 units — the same order as the bf16 QK-dot noise the TPU
    # pipeline already carries
    np.testing.assert_allclose(out, ref, atol=8e-3)
    # the quantized-bias dense reference: the kernel stores ONLY the
    # centered bias in bf16 (the per-row bound stays fp32 and cancels
    # uniformly in the normalization), so the exact delta is
    # bf16(bias * log2e) / log2e
    bq = ((bias * fa.LOG2E).astype(jnp.bfloat16).astype(jnp.float32)
          / fa.LOG2E)
    refq = np.asarray(dense_cosine_reference(q, k, v, nkv, qs, ks, bq,
                                             None))
    np.testing.assert_allclose(out, refq, atol=4e-4)


def test_fused_cosine_chunked_equals_strip():
    """The chunked kernel and the original strip kernel are the same
    math — outputs must agree to fp rounding on identical inputs."""
    q, k, v, nkv, qs, ks, bias = cosine_case(M=300, N=130)
    a = np.asarray(fa.fused_cosine_attention_fwd(
        q, k, v, nkv, qs, ks, bias, None, sm_scale=8.0, chunk=128,
        interpret=True))
    b = np.asarray(fa.fused_cosine_attention_fwd_strip(
        q, k, v, nkv, qs, ks, bias, None, sm_scale=8.0, interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_cosine_dispatch_gradients_cpu():
    """make_cosine_attention's dense CPU path must be differentiable in
    all eight args and match the reference forward."""
    q, k, v, nkv, qs, ks, bias = cosine_case(N=64, M=40)
    cos = fa.make_cosine_attention(sm_scale=8.0, use_pallas=False)

    out = np.asarray(cos(q, k, v, nkv, qs, ks, bias))
    ref = np.asarray(dense_cosine_reference(q, k, v, nkv, qs, ks, bias,
                                            None))
    np.testing.assert_allclose(out, ref, atol=3e-4)

    def loss(q, k, v, nkv, qs, ks, bias):
        return jnp.sum(cos(q, k, v, nkv, qs, ks, bias) ** 2)

    grads = jax.grad(loss, argnums=tuple(range(7)))(q, k, v, nkv, qs, ks,
                                                    bias)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


@pytest.mark.parametrize("keep", [None, "flags"])
def test_fused_cosine_nhd_matches_dense(keep):
    """Copy-minimal (B, L, H, D) entry point: same numerics as the
    (B, H, L, D) kernel and the dense reference, output (B, N, H*D)."""
    q, k, v, nkv, qs, ks, bias = cosine_case(H=4)
    keep_arr = jnp.asarray([1, 0], jnp.int32) if keep else None
    B, H, N, D = q.shape
    out = np.asarray(fa.fused_cosine_attention_fwd_nhd(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), nkv, qs, ks, bias, keep_arr,
        sm_scale=8.0, head_group=2, interpret=True))
    ref = np.asarray(dense_cosine_reference(q, k, v, nkv, qs, ks, bias,
                                            keep_arr))
    ref = ref.transpose(0, 2, 1, 3).reshape(B, N, H * D)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=3e-4)


def test_cosine_nhd_dispatch_gradients_cpu():
    """make_cosine_attention_nhd dense path: differentiable, matches the
    reference, and grads are finite in all args."""
    q, k, v, nkv, qs, ks, bias = cosine_case(N=64, M=40)
    B, H, N, D = q.shape
    cos = fa.make_cosine_attention_nhd(sm_scale=8.0, use_pallas=False)
    qn, kn, vn = (t.transpose(0, 2, 1, 3) for t in (q, k, v))

    out = np.asarray(cos(qn, kn, vn, nkv, qs, ks, bias))
    ref = np.asarray(dense_cosine_reference(
        q, k, v, nkv, qs, ks, bias, None)).transpose(0, 2, 1, 3).reshape(
            B, N, H * D)
    np.testing.assert_allclose(out, ref, atol=3e-4)

    def loss(qn, kn, vn, nkv, qs, ks, bias):
        return jnp.sum(cos(qn, kn, vn, nkv, qs, ks, bias) ** 2)

    grads = jax.grad(loss, argnums=tuple(range(7)))(qn, kn, vn, nkv,
                                                    qs, ks, bias)
    for gi in grads:
        assert np.isfinite(np.asarray(gi)).all()
        assert np.abs(np.asarray(gi)).max() > 0


@pytest.mark.slow
def test_cosine_dispatch_gradients_no_bias_interpret(monkeypatch):
    """bias=None must thread through the custom_vjp (no zeros stand-in,
    no dead dbias pass) and still match the dense gradients."""
    monkeypatch.setattr(fa, "fused_cosine_attention_fwd",
                        partial(fa.fused_cosine_attention_fwd,
                                interpret=True))
    monkeypatch.setattr(fa, "fused_cosine_attention_fwd_strip",
                        partial(fa.fused_cosine_attention_fwd_strip,
                                interpret=True))
    monkeypatch.setattr(fa, "fused_cosine_attention_fwd_fb",
                        partial(fa.fused_cosine_attention_fwd_fb,
                                interpret=True))
    monkeypatch.setattr(fa, "fused_cosine_attention_fwd_fb2",
                        partial(fa.fused_cosine_attention_fwd_fb2,
                                interpret=True))
    monkeypatch.setattr(fa, "fused_cosine_attention_fwd_fb2c",
                        partial(fa.fused_cosine_attention_fwd_fb2c,
                                interpret=True))
    monkeypatch.setattr(fa, "fused_bias_attention_bwd",
                        partial(fa.fused_bias_attention_bwd,
                                interpret=True))
    q, k, v, null_kv, qs, ks, _ = cosine_case(B=1, H=2, N=64, M=33, D=64)
    attn = fa.make_cosine_attention(sm_scale=8.0, use_pallas=True)

    def loss(q, k, v, null_kv, qs, ks):
        return jnp.sum(jnp.square(
            attn(q, k, v, null_kv, qs, ks, bias=None, keep=None)))

    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, null_kv,
                                                   qs, ks)

    def dense_loss(q, k, v, null_kv, qs, ks):
        zero = jnp.zeros((q.shape[2], k.shape[2]), jnp.float32)
        return jnp.sum(jnp.square(dense_cosine_reference(
            q, k, v, null_kv, qs, ks, zero, None)))

    gr = jax.grad(dense_loss, argnums=(0, 1, 2, 3, 4, 5))(q, k, v,
                                                          null_kv, qs, ks)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3)


def test_fused_bwd_no_bias_returns_none_dbias():
    B, H, N, M, D = 1, 2, 64, 33, 64
    rng = np.random.default_rng(11)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    dq, dk, dv, dbias = fa.fused_bias_attention_bwd(
        mk(B, H, N, D), mk(B, H, M, D), mk(B, H, M, D), None, None,
        mk(B, H, N, D), sm_scale=2.0, interpret=True)
    assert dbias is None
    assert np.isfinite(np.asarray(dq)).all()
