"""Fused residual+LayerNorm and GEGLU+LayerNorm glue kernels
(ops/pallas/fused_glue.py) + the restructured transformer path that
consumes them (use_fused_glue)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevgen_tpu.ops.pallas import fused_glue as fg


def test_residual_layernorm_kernel_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 40, 256)), jnp.bfloat16)
    d = jnp.asarray(rng.standard_normal((2, 40, 256)), jnp.bfloat16)
    g = jnp.asarray(1 + 0.2 * rng.standard_normal(256), jnp.float32)
    xo, no = fg.residual_layernorm_fwd(x, d, g, tile=16, interpret=True)
    xr, nr = fg._res_ln_reference(x, d, g, x.dtype)
    np.testing.assert_array_equal(np.asarray(xo), np.asarray(xr))
    np.testing.assert_allclose(np.asarray(no, np.float32),
                               np.asarray(nr, np.float32), atol=2e-2)


def test_residual_layernorm_row_padding():
    # rows not a multiple of the tile exercise the pad/slice path
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((5, 13, 128)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((5, 13, 128)), jnp.float32)
    g = jnp.ones((128,), jnp.float32)
    xo, no = fg.residual_layernorm_fwd(x, d, g, tile=32, interpret=True)
    xr, nr = fg._res_ln_reference(x, d, g, x.dtype)
    np.testing.assert_allclose(np.asarray(xo), np.asarray(xr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(no), np.asarray(nr), atol=1e-5)


def test_residual_layernorm_grads_flow():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 16, 64)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((3, 16, 64)), jnp.float32)
    g = jnp.asarray(1 + 0.1 * rng.standard_normal(64), jnp.float32)
    fn = fg.make_residual_layernorm(use_pallas=False)

    def loss(x, d, g):
        xo, no = fn(x, d, g)
        return jnp.sum(no ** 2) + jnp.sum(xo ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(x, d, g)
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()
        assert np.abs(np.asarray(gr)).max() > 0


@pytest.mark.parametrize("f_real,fpad", [(96, 128), (2730, 2816)])
def test_geglu_layernorm_kernel_matches_reference(f_real, fpad):
    rng = np.random.default_rng(3)
    rows = 24
    # padded [a | gate] layout: zeros beyond f_real in each half
    a = np.zeros((rows, fpad), np.float32)
    gt = np.zeros((rows, fpad), np.float32)
    a[:, :f_real] = rng.standard_normal((rows, f_real))
    gt[:, :f_real] = rng.standard_normal((rows, f_real))
    y = jnp.asarray(np.concatenate([a, gt], -1), jnp.bfloat16)
    gamma = np.zeros((fpad,), np.float32)
    gamma[:f_real] = 1 + 0.2 * rng.standard_normal(f_real)
    out = fg.geglu_layernorm_fwd(y, jnp.asarray(gamma), f_real, tile=8,
                                 interpret=True)
    ref = fg._geglu_ln_reference(y, jnp.asarray(gamma), f_real, y.dtype)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)
    # padded output lanes are exact zeros (proj_out's zero rows rely
    # on nothing, but this pins the layout contract)
    assert np.abs(np.asarray(out, np.float32)[:, f_real:]).max() == 0.0


def test_geglu_reference_matches_unpadded_xla_chain():
    """The padded-layout reference == the plain XLA GEGLU+LN chain on
    the real features (what the unfused transformer path computes)."""
    rng = np.random.default_rng(4)
    f_real, fpad, rows = 96, 128, 16
    a = rng.standard_normal((rows, f_real)).astype(np.float32)
    gt = rng.standard_normal((rows, f_real)).astype(np.float32)
    gamma = (1 + 0.2 * rng.standard_normal(f_real)).astype(np.float32)
    ap = np.pad(a, ((0, 0), (0, fpad - f_real)))
    gp = np.pad(gt, ((0, 0), (0, fpad - f_real)))
    y = jnp.asarray(np.concatenate([ap, gp], -1))
    ref = fg._geglu_ln_reference(
        y, jnp.asarray(np.pad(gamma, (0, fpad - f_real))), f_real,
        jnp.float32)

    h = jnp.asarray(gt) * jax.nn.gelu(jnp.asarray(a), approximate=False)
    mu = h.mean(-1, keepdims=True)
    var = ((h - mu) ** 2).mean(-1, keepdims=True)
    xla = (h - mu) * jax.lax.rsqrt(var + 1e-5) * gamma
    np.testing.assert_allclose(np.asarray(ref)[:, :f_real], np.asarray(xla),
                               atol=1e-5)


def test_transformer_glue_path_matches_plain(tiny_cfg=None):
    """use_fused_glue=True (restructured blocks, padded projections;
    XLA fallback ops on CPU) must equal use_fused_glue=False to fp
    accuracy with the SAME params."""
    from bevgen_tpu.core.config import tiny_test_config
    from bevgen_tpu.models import geometry
    from bevgen_tpu.models.stage2.maskgit import MaskGit

    pipe_cfg = tiny_test_config()
    cfg_plain = pipe_cfg.transformer.replace(use_fused_glue=False)
    cfg_glue = pipe_cfg.transformer.replace(use_fused_glue=True)
    rng = np.random.default_rng(5)
    b = 2
    ids = jnp.asarray(rng.integers(
        0, cfg_plain.vocab_size,
        (b, cfg_plain.num_cams, cfg_plain.num_cam_tokens)), jnp.int32)
    cond = jnp.asarray(rng.integers(
        0, cfg_plain.cond_vocab_size, (b, cfg_plain.num_cond_tokens)),
        jnp.int32)
    ii, ei = map(jnp.asarray, geometry.canonical_rig_inverses(cfg_plain, b))

    m_plain = MaskGit(cfg_plain, pipe_cfg.muse)
    m_glue = MaskGit(cfg_glue, pipe_cfg.muse)
    params = m_plain.init(jax.random.PRNGKey(0), ids, cond, ii, ei,
                          method=MaskGit.init_all)
    # identical param trees across both paths (checkpoint compat)
    params2 = m_glue.init(jax.random.PRNGKey(0), ids, cond, ii, ei,
                          method=MaskGit.init_all)
    t1 = jax.tree_util.tree_structure(params)
    t2 = jax.tree_util.tree_structure(params2)
    assert t1 == t2

    out_p = m_plain.apply(params, ids, cond, ii, ei)
    out_g = m_glue.apply(params, ids, cond, ii, ei)
    np.testing.assert_allclose(np.asarray(out_g.logits),
                               np.asarray(out_p.logits), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_g.embed),
                               np.asarray(out_p.embed), atol=2e-4)


def test_transformer_glue_remat_grads_match_no_remat():
    """use_fused_glue=True + remat=True must trace (the glue convention
    passes Python bools through nn.remat — static_argnums fix) and
    produce the same gradients as the non-remat glue path (remat is a
    pure recompute schedule, not a numerics change)."""
    from bevgen_tpu.core.config import tiny_test_config
    from bevgen_tpu.models import geometry
    from bevgen_tpu.models.stage2.maskgit import MaskGit

    pipe_cfg = tiny_test_config()
    cfg_glue = pipe_cfg.transformer.replace(use_fused_glue=True,
                                            remat=False)
    cfg_remat = cfg_glue.replace(remat=True)
    rng = np.random.default_rng(11)
    b = 2
    ids = jnp.asarray(rng.integers(
        0, cfg_glue.vocab_size,
        (b, cfg_glue.num_cams, cfg_glue.num_cam_tokens)), jnp.int32)
    cond = jnp.asarray(rng.integers(
        0, cfg_glue.cond_vocab_size, (b, cfg_glue.num_cond_tokens)),
        jnp.int32)
    ii, ei = map(jnp.asarray, geometry.canonical_rig_inverses(cfg_glue, b))

    m_glue = MaskGit(cfg_glue, pipe_cfg.muse)
    m_remat = MaskGit(cfg_remat, pipe_cfg.muse)
    params = m_glue.init(jax.random.PRNGKey(0), ids, cond, ii, ei,
                         method=MaskGit.init_all)

    def loss(m):
        def f(p):
            out = m.apply(p, ids, cond, ii, ei)
            return (out.logits.astype(jnp.float32) ** 2).mean()
        return f

    v_g, g_g = jax.value_and_grad(loss(m_glue))(params)
    v_r, g_r = jax.value_and_grad(loss(m_remat))(params)
    np.testing.assert_allclose(np.asarray(v_r), np.asarray(v_g), rtol=1e-6)
    flat_g = jax.tree_util.tree_leaves(g_g)
    flat_r = jax.tree_util.tree_leaves(g_r)
    assert len(flat_g) == len(flat_r)
    for a, c in zip(flat_g, flat_r):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)
