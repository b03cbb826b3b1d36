"""Functional coverage for MUSE self-conditioning and the TokenCritic
(muse_maskgit_pytorch.py:212,240-241,356-359,423-426,677-692)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevgen_tpu.core.config import MultiViewConfig, MuseConfig
from bevgen_tpu.models import geometry
from bevgen_tpu.models.stage2 import maskgit as mg
from bevgen_tpu.models.stage2.maskgit import MaskGit


def cfg_small(**kw):
    return MultiViewConfig(
        num_layers=1, num_heads=2, num_embed=32, hidden_size=32,
        dim_head=16, vocab_size=12, cond_vocab_size=10, num_cams=3,
        cam_names="ARGOVERSE_FRONT_CAMERAS", dataset="argoverse",
        cam_res=(16, 16), cam_latent_res=(2, 2), bev_latent_res=(2, 2),
        window_len=2, **kw)


def _inputs(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(rng.integers(
        0, cfg.vocab_size, (b, cfg.num_cams, cfg.num_cam_tokens)), jnp.int32)
    cond = jnp.asarray(rng.integers(
        0, cfg.cond_vocab_size, (b, cfg.num_cond_tokens)), jnp.int32)
    ii, ei = geometry.canonical_rig_inverses(cfg, b)
    return tokens, cond, jnp.asarray(ii), jnp.asarray(ei)


@pytest.mark.slow
def test_self_cond_loss_and_generate():
    cfg = cfg_small(self_cond=True)
    muse = MuseConfig(sample_iterations=3)
    model = MaskGit(cfg, muse)
    tokens, cond, ii, ei = _inputs(cfg)
    params = model.init(jax.random.PRNGKey(0), tokens, cond, ii, ei,
                        method=MaskGit.init_all)
    assert "self_cond_to_init_embed" in params["params"]["transformer"]

    loss = mg.maskgit_loss(model, params, jax.random.PRNGKey(1), tokens,
                           cond, ii, ei)
    assert np.isfinite(float(loss.loss))

    out = mg.generate(model, params, cond, ii, ei, jax.random.PRNGKey(2))
    assert out.shape == (2, cfg.num_cams, *cfg.cam_latent_res)
    assert np.asarray(out).max() < cfg.vocab_size

    # self-conditioning actually changes the forward: nonzero embed
    # vs None must give different logits
    sc = jax.random.normal(jax.random.PRNGKey(5),
                           (2, cfg.num_img_tokens, cfg.num_embed),
                           jnp.float32)
    l0 = model.apply(params, tokens, cond, ii, ei).logits
    l1 = model.apply(params, tokens, cond, ii, ei,
                     self_cond_embed=sc).logits
    assert not np.allclose(np.asarray(l0), np.asarray(l1))


@pytest.mark.slow
def test_token_critic_loss_and_generate():
    cfg = cfg_small()
    muse = MuseConfig(self_token_critic=False, token_critic=True,
                      sample_iterations=3)
    model = MaskGit(cfg, muse)
    tokens, cond, ii, ei = _inputs(cfg, seed=1)
    params = model.init(jax.random.PRNGKey(0), tokens, cond, ii, ei,
                        method=MaskGit.init_all)
    tree = params["params"]
    assert "token_critic" in tree
    # separate transformer: no mask-id row, scalar head
    assert tree["token_critic"]["token_emb"]["embedding"].shape[0] == \
        cfg.vocab_size
    assert tree["token_critic"]["to_logits"]["kernel"].shape[-1] == 1

    loss = mg.maskgit_loss(model, params, jax.random.PRNGKey(1), tokens,
                           cond, ii, ei)
    assert np.isfinite(float(loss.loss))
    assert float(loss.critic_loss) > 0.0

    out = mg.generate(model, params, cond, ii, ei, jax.random.PRNGKey(2))
    assert out.shape == (2, cfg.num_cams, *cfg.cam_latent_res)


def test_both_critics_rejected():
    import pytest
    cfg = cfg_small()
    muse = MuseConfig(self_token_critic=True, token_critic=True)
    model = MaskGit(cfg, muse)
    tokens, cond, ii, ei = _inputs(cfg)
    with pytest.raises(AssertionError, match="mutually exclusive"):
        model.init(jax.random.PRNGKey(0), tokens, cond, ii, ei,
                   method=MaskGit.init_all)
