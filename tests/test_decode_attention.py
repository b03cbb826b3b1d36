"""One-pass decode-attention kernel (ops/pallas/decode_attention.py):
equality with its jnp twin + the env-gated AR integration."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bevgen_tpu.ops.pallas.decode_attention import (
    decode_attention, decode_attention_reference)

NEG_INF = -1e9


@pytest.mark.parametrize("pl_len", [64, 192])
def test_kernel_matches_reference(pl_len):
    rng = np.random.default_rng(0)
    b, H, dh = 2, 4, 64
    q = jnp.asarray(rng.standard_normal((b, H, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, H, pl_len, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, H, pl_len, dh)), jnp.bfloat16)
    bias = rng.standard_normal((H, pl_len)).astype(np.float32)
    mask = rng.random((H, pl_len)) > 0.3
    mask[:, 0] = True  # at least one attendable column per row
    addend = jnp.asarray(np.where(mask, bias, NEG_INF))[:, :, None]
    out_k = decode_attention(q, k, v, addend, 0.125, interpret=True)
    out_r = decode_attention_reference(q, k, v, addend, 0.125)
    np.testing.assert_allclose(np.asarray(out_k, np.float32),
                               np.asarray(out_r, np.float32),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.slow
def test_ar_sample_kernel_path_matches_inline(monkeypatch):
    """BEVGEN_AR_ATTN=pallas must sample the same tokens as the inline
    path at the tiny config (fp-equivalent math; integer outputs are
    argmax-stable at these scales)."""
    from tests.test_ar_cached import gpt_cfg, make_inputs
    from bevgen_tpu.models.stage2 import ar_cached
    from bevgen_tpu.models.stage2.gpt import SparseGPT

    cfg = gpt_cfg(camera_bias=True)
    model = SparseGPT(cfg, use_pallas=False)
    ids, cond, ii, ei = make_inputs(cfg, seed=7)
    params = model.init(jax.random.PRNGKey(2), ids, cond, ii, ei)
    rng = jax.random.PRNGKey(5)

    base = np.asarray(ar_cached.ar_sample_cached(
        model, params, cond, ii, ei, rng, temperature=1e-8, top_k=1))
    monkeypatch.setenv("BEVGEN_AR_ATTN", "pallas")
    kern = np.asarray(ar_cached.ar_sample_cached(
        model, params, cond, ii, ei, rng, temperature=1e-8, top_k=1))
    # greedy decode: tiny fp deltas may flip a rare near-tie token and
    # compound; require near-total agreement rather than bitwise
    agree = (base == kern).mean()
    assert agree > 0.97, agree
