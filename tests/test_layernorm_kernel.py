"""Pallas single-pass LayerNorm (MXU reductions) vs flax nn.LayerNorm."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from bevgen_tpu.ops.pallas import layernorm as lnk


def flax_ref(x, scale):
    mod = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=True)
    return mod.apply({"params": {"scale": scale}}, x)


@pytest.mark.parametrize("shape,d", [
    ((2, 256, 1024), 1024),      # decode hot shape family
    ((3, 257, 512), 512),        # ragged row count
    ((2, 96, 2730), 2730),       # GEGLU mid width (non-128-divisible)
    ((1, 8, 128), 128),
])
def test_fused_layernorm_matches_flax(shape, d):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 3 + 1)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d).astype(np.float32))
    out = np.asarray(lnk.fused_layernorm(x, scale, interpret=True))
    ref = np.asarray(flax_ref(x, scale))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_fused_layernorm_bf16_io():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 256)), jnp.bfloat16)
    scale = jnp.ones((256,), jnp.float32)
    out = lnk.fused_layernorm(x, scale, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = flax_ref(x.astype(jnp.float32), scale)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=2e-2)


def test_make_layernorm_grads_and_dispatch():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32, 128)).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(128).astype(np.float32))
    ln = lnk.make_layernorm(use_pallas=False)
    np.testing.assert_allclose(np.asarray(ln(x, scale)),
                               np.asarray(flax_ref(x, scale)), atol=1e-5)

    def loss(x, scale):
        return jnp.sum(ln(x, scale) ** 2)

    dx, ds = jax.grad(loss, argnums=(0, 1))(x, scale)

    def loss_ref(x, scale):
        return jnp.sum(flax_ref(x, scale) ** 2)

    dx_r, ds_r = jax.grad(loss_ref, argnums=(0, 1))(x, scale)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(ds_r), atol=1e-4)


def test_transformer_layernorm_param_tree_stable():
    """LayerNormG param path is 'norm/scale' on both paths."""
    from bevgen_tpu.models.stage2.transformer import LayerNormG
    x = jnp.ones((1, 16, 32))
    for fused in (False, True):
        params = LayerNormG(use_fused=fused).init(jax.random.PRNGKey(0), x)
        assert "scale" in params["params"]["norm"], params
