"""Unit tests for attention masks / layouts / camera-bias matrices."""
import numpy as np

from bevgen_tpu.core.config import MultiViewConfig
from bevgen_tpu.models import masks


def cfg(**kw):
    base = dict(num_cams=3, cam_names="ARGOVERSE_FRONT_CAMERAS",
                dataset="argoverse", cam_latent_res=(4, 4),
                bev_latent_res=(4, 4), num_layers=1, num_heads=4,
                num_embed=32, hidden_size=32, vocab_size=16,
                cond_vocab_size=16, window_len=3, sparse_block_size=1)
    base.update(kw)
    return MultiViewConfig(**base)


def test_window_and_causal_patterns():
    c = cfg()
    win, allowed = masks.window_and_causal_patterns(c)
    n = c.num_img_tokens
    assert win.shape == allowed.shape == (n, n)
    # causality: strictly lower-triangular plus diagonal
    np.testing.assert_array_equal(allowed, np.tril(np.ones((n, n), bool)))
    # window: band of width window_len+1 on/below the diagonal
    assert win[10, 10] and win[10, 7] and not win[10, 6] and not win[10, 11]
    assert (win <= allowed).all()


def test_pad_with_cond():
    p = np.ones((2, 2), dtype=np.float32)
    out = masks.pad_with_cond(p, 1, 0.5)
    np.testing.assert_allclose(out, [[0.5, 0, 0], [0.5, 1, 1], [0.5, 1, 1]])


def test_layout_pattern_roundtrip():
    rng = np.random.default_rng(0)
    pat = rng.uniform(size=(8, 8)) < 0.3
    lay = masks.pattern_to_layout(pat, 4)
    assert lay.shape == (2, 2)
    big = masks.layout_to_pattern(lay, 4)
    # layout covers every positive of the pattern
    assert (big.astype(bool) >= pat).all()


def test_img_prob_matrix_properties():
    c = cfg()
    p = masks.img_prob_matrix(c)
    n = c.num_img_tokens
    assert p.shape == (n, n)
    # causally masked
    assert (p[np.triu_indices(n, k=1)] == 0).all()
    assert (p >= 0).all() and (p <= 1.00001).all()
    # self-similarity is maximal among allowed entries
    assert p[5, 5] >= p[5, :5].max() - 1e-6


def test_img_prob_matrix_legacy_runs():
    c = cfg(dataset="nuscenes", cam_names="NUSCENES_CAMERAS", num_cams=6,
            cam_latent_res=(2, 5), legacy_prob_matrix=True)
    p = masks.img_prob_matrix(c)
    assert p.shape == (c.num_img_tokens,) * 2
    assert np.isfinite(p).all() and (p >= 0).all()


def test_camera_bias_matrix_blocks():
    c = cfg()
    m = masks.camera_bias_matrix(c)
    L, nc = c.gpt_block_size, c.num_cond_tokens
    assert m.shape == (L, L)
    # cond rows: left block 1, right block 0
    np.testing.assert_allclose(m[:nc, :nc], 1.0)
    np.testing.assert_allclose(m[:nc, nc:], 0.0)
    # img/cond block is the bev similarity in [0,1]
    assert (m[nc:, :nc] >= 0).all() and (m[nc:, :nc] <= 1.0 + 1e-6).all()
    sim = masks.bev_cam_sim_matrix(c)
    np.testing.assert_allclose(m[nc:, :nc], sim)


def test_sparse_masks_padded_blocksparse():
    # nuScenes-ish: block 16 with pad tokens (14*25*6+256 = 2356 -> 2368)
    c = cfg(dataset="nuscenes", cam_names="NUSCENES_CAMERAS", num_cams=6,
            cam_latent_res=(2, 5), sparse_block_size=8, density=0.5,
            legacy_prob_matrix=True, num_heads=2)
    assert c.num_pad_tokens > 0
    sm = masks.sparse_masks(c)
    L = c.gpt_block_size
    nb = L // 8
    assert sm.layouts.shape == (2, nb, nb)
    assert sm.allowed.shape == (L, L)
    # pad rows attend only to the first element
    p = c.num_pad_tokens
    assert (sm.allowed[-p:, 1:] == 0).all() and (sm.allowed[-p:, 0] == 1).all()
    # every row of every head layout has at least one block (no NaN rows)
    assert (sm.layouts.sum(-1) > 0).all()
    # deterministic in the seed
    sm2 = masks.sparse_masks(c.replace(layout_seed=0))
    np.testing.assert_array_equal(sm.layouts, sm2.layouts)
    sm3 = masks.sparse_masks(c.replace(layout_seed=1))
    assert (sm3.layouts != sm.layouts).any()


def test_sparse_layout_contains_static_window():
    c = cfg(sparse_block_size=4, density=0.3, num_heads=2)
    sm = masks.sparse_masks(c)
    assert ((sm.layouts >= sm.static_layout[None]).all())
