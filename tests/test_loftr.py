"""LoFTR flax port (metrics/loftr.py) — architecture + plumbing tests.

The published outdoor weights are egress-gated, so these tests run the
full matcher on `init_random_params` trees (the exact converted-
checkpoint structure): shapes, masking of padded cells, mutual-NN
properties, and the consistency-metric dispatch
(metrics_consistency_sift.py:111-168 parity surface).
"""
import numpy as np
import pytest

from bevgen_tpu.metrics import consistency, loftr


@pytest.fixture(scope="module")
def rand_params():
    return loftr.init_random_params(np.random.default_rng(0))


def test_param_tree_matches_converter_contract(rand_params):
    # every key the forward pass reads exists in the random tree, with
    # the converted layout (conv HWIO, linear (I, O))
    assert rand_params["backbone.conv1.weight"].shape == (7, 7, 1, 128)
    assert rand_params["loftr_coarse.layers.0.q_proj.weight"].shape == \
        (256, 256)
    assert rand_params["fine_preprocess.down_proj.weight"].shape == \
        (256, 128)


def test_backbone_fpn_shapes(rand_params):
    import jax.numpy as jnp
    x = jnp.zeros((1, 64, 48, 1), jnp.float32)
    p = {k: jnp.asarray(v) for k, v in rand_params.items()}
    coarse, fine = loftr.backbone_fpn(p, x)
    assert coarse.shape == (1, 8, 6, 256)
    assert fine.shape == (1, 32, 24, 128)


def test_sine_position_encoding_structure():
    pe = loftr.sine_position_encoding(4, 6)
    assert pe.shape == (4, 6, 256)
    # x-frequency channels vary along w only, y channels along h only
    assert np.allclose(pe[0, :, 0], np.sin(np.arange(6) * 1.0), atol=1e-6)
    assert np.ptp(pe[:, 0, 0]) == 0.0          # x-channel constant in h
    assert np.ptp(pe[0, :, 2]) == 0.0          # y-channel constant in w


def test_mutual_nearest_matches_exact():
    import jax.numpy as jnp
    # a 3x3-coarse pair with one dominant mutual pair well inside the
    # border-removal margin requires bigger maps: use 6x6 (border 2)
    L = 36
    conf = np.full((L, L), 0.01, np.float32)
    inside = 2 * 6 + 2  # cell (2, 2) — inside the 2-cell border
    conf[inside, inside] = 0.9
    idx0, idx1, mconf, valid = loftr.mutual_nearest_matches(
        jnp.asarray(conf), (6, 6), (6, 6))
    v = np.asarray(valid)
    assert v.sum() == 1 and v[inside]
    assert int(np.asarray(idx1)[inside]) == inside
    assert np.asarray(mconf)[inside] == pytest.approx(0.9)


@pytest.mark.slow
def test_matcher_end_to_end_random_weights(rand_params):
    """Full pipeline on a 50-px strip pair (the metric's real shapes —
    non-multiple-of-8 width exercises the padding path)."""
    rng = np.random.default_rng(1)
    a = rng.random((96, 50), dtype=np.float32)
    b = np.roll(a, 3, axis=1)
    out = loftr.LoFTRMatcher(rand_params, use_fine=True)(a, b)
    assert set(out) == {"keypoints0", "keypoints1", "confidence"}
    n = len(out["confidence"])
    assert out["keypoints0"].shape == (n, 2)
    assert out["keypoints1"].shape == (n, 2)
    # keypoints must land inside the REAL (unpadded) images
    if n:
        assert out["keypoints0"][:, 0].max() < 50
        assert out["keypoints0"][:, 1].max() < 96


def test_consistency_dispatch_uses_loftr(tmp_path, monkeypatch,
                                         rand_params):
    """With BEVGEN_LOFTR_WEIGHTS set, match_strips routes through the
    LoFTR matcher; without it, the SIFT fallback answers."""
    npz = tmp_path / "loftr.npz"
    np.savez(npz, **rand_params)
    monkeypatch.setenv("BEVGEN_LOFTR_WEIGHTS", str(npz))
    monkeypatch.setattr(consistency, "_LOFTR_MATCHER", None)
    m = consistency.get_matcher()
    assert m is not None
    rng = np.random.default_rng(2)
    a = rng.random((64, 50, 3), dtype=np.float32)
    b = rng.random((64, 50, 3), dtype=np.float32)
    res = consistency.match_strips(a, b)
    assert set(res) == {"num_matches", "confidence", "inliers"}

    monkeypatch.delenv("BEVGEN_LOFTR_WEIGHTS")
    monkeypatch.setattr(consistency, "_LOFTR_MATCHER", None)
    assert consistency.get_matcher() is None
