"""AR sparse GPT tests: shapes, causality in decode order, sampling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevgen_tpu.core.config import MultiViewConfig
from bevgen_tpu.models import geometry
from bevgen_tpu.models.stage2 import ar
from bevgen_tpu.models.stage2.gpt import SparseGPT


def gpt_cfg(**kw):
    base = dict(num_layers=2, num_heads=2, num_embed=64, hidden_size=64,
                vocab_size=32, cond_vocab_size=32, num_cams=3,
                cam_names="ARGOVERSE_FRONT_CAMERAS", dataset="argoverse",
                cam_res=(32, 32), cam_latent_res=(4, 4), bev_latent_res=(4, 4),
                window_len=4, sparse_block_size=8, density=0.8,
                causal_order=True, camera_bias=False, image_embed=True,
                bev_embed=False, legacy_prob_matrix=False)
    base.update(kw)
    return MultiViewConfig(**base)


def make_inputs(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, cfg.vocab_size,
                       (b, cfg.num_cams, cfg.num_cam_tokens)).astype(np.int32)
    cond = rng.integers(0, cfg.cond_vocab_size,
                        (b, cfg.num_cond_tokens)).astype(np.int32)
    intr, extr = geometry.canonical_camera_rig(cfg)
    ii = np.broadcast_to(np.linalg.inv(intr)[None],
                         (b, cfg.num_cams, 3, 3)).astype(np.float32)
    ei = np.broadcast_to(np.linalg.inv(extr)[None],
                         (b, cfg.num_cams, 4, 4)).astype(np.float32)
    return (jnp.asarray(ids), jnp.asarray(cond), jnp.asarray(ii),
            jnp.asarray(ei))


@pytest.fixture(scope="module")
def gpt_and_params():
    cfg = gpt_cfg()
    model = SparseGPT(cfg, use_pallas=False)
    ids, cond, ii, ei = make_inputs(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, cond, ii, ei)
    return cfg, model, params, (ids, cond, ii, ei)


def test_gpt_forward_shapes(gpt_and_params):
    cfg, model, params, (ids, cond, ii, ei) = gpt_and_params
    logits = model.apply(params, ids, cond, ii, ei, sampling=True)
    assert logits.shape == (2, cfg.num_img_tokens, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_gpt_pad_token_handling(gpt_and_params):
    """gpt_block_size padding: num tokens 48+16=64, block 8 -> no pad here;
    verify a config WITH pad tokens works too."""
    cfg = gpt_cfg(cam_latent_res=(4, 5), sparse_block_size=8)
    assert cfg.num_pad_tokens > 0
    model = SparseGPT(cfg, use_pallas=False)
    ids, cond, ii, ei = make_inputs(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, cond, ii, ei)
    logits = model.apply(params, ids, cond, ii, ei, sampling=True)
    assert logits.shape == (2, cfg.num_img_tokens, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_gpt_causality_in_decode_order(gpt_and_params):
    """Changing the token decoded at step t must not affect logits for
    steps <= t (strict causality in the outward order)."""
    cfg, model, params, (ids, cond, ii, ei) = gpt_and_params
    fwd, _ = geometry.decode_order(cfg)
    hw = cfg.num_cam_tokens
    t_change = 30
    raw = int(fwd[t_change])
    ids2 = ids.at[:, raw // hw, raw % hw].set(
        (ids[:, raw // hw, raw % hw] + 1) % cfg.vocab_size)
    la = np.asarray(model.apply(params, ids, cond, ii, ei, sampling=True))
    lb = np.asarray(model.apply(params, ids2, cond, ii, ei, sampling=True))
    # logits for decode steps <= t_change are unchanged
    for t in range(0, t_change + 1, 7):
        r = int(fwd[t])
        np.testing.assert_allclose(la[:, r], lb[:, r], atol=1e-5,
                                   err_msg=f"step {t} leaked")
    # ...and some later step sees the change
    later = [int(fwd[t]) for t in range(t_change + 1, cfg.num_img_tokens)]
    assert max(np.abs(la[:, later] - lb[:, later]).max(axis=(0, 2))) > 1e-6


def test_gpt_camera_bias_param():
    cfg = gpt_cfg(camera_bias=True, bev_embed=True)
    model = SparseGPT(cfg, use_pallas=False)
    ids, cond, ii, ei = make_inputs(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, cond, ii, ei)
    assert "camera_bias_emb" in params["params"]
    logits = model.apply(params, ids, cond, ii, ei, sampling=True)
    assert np.isfinite(np.asarray(logits)).all()


def test_ar_sample_and_partial(gpt_and_params):
    cfg, model, params, (ids, cond, ii, ei) = gpt_and_params
    out = ar.ar_sample(model, params, cond, ii, ei, jax.random.PRNGKey(1),
                       top_k=8)
    h, w = cfg.cam_latent_res
    assert out.shape == (2, cfg.num_cams, h, w)
    arr = np.asarray(out)
    assert (arr >= 0).all() and (arr < cfg.vocab_size).all()
    # deterministic in the key
    out2 = ar.ar_sample(model, params, cond, ii, ei, jax.random.PRNGKey(1),
                        top_k=8)
    np.testing.assert_array_equal(arr, np.asarray(out2))
    # partial decoding: camera 0 pinned
    init = jnp.full_like(ids, cfg.vocab_size)
    init = init.at[:, 0].set(ids[:, 0])
    out3 = ar.ar_sample(model, params, cond, ii, ei, jax.random.PRNGKey(2),
                        init_ids=init)
    np.testing.assert_array_equal(
        np.asarray(out3).reshape(ids.shape)[:, 0], np.asarray(ids[:, 0]))


@pytest.mark.slow
def test_ar_loss_and_grads(gpt_and_params):
    cfg, model, params, (ids, cond, ii, ei) = gpt_and_params

    def loss_fn(p):
        return ar.ar_loss(model, p, ids, cond, ii, ei, deterministic=True)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    g = np.asarray(grads["params"]["x_tok_emb"]["embedding"])
    assert np.abs(g).max() > 0
