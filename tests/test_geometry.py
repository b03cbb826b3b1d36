"""Unit tests for token/camera geometry (decode order, grids, rays)."""
import numpy as np
import pytest

from bevgen_tpu.core.config import MultiViewConfig
from bevgen_tpu.models import geometry


def cfg_argo(**kw):
    base = dict(num_cams=3, cam_names="ARGOVERSE_FRONT_CAMERAS",
                dataset="argoverse", cam_latent_res=(4, 4),
                bev_latent_res=(4, 4), num_layers=1, num_heads=2,
                num_embed=32, hidden_size=32, vocab_size=16,
                cond_vocab_size=16)
    base.update(kw)
    return MultiViewConfig(**base)


def cfg_nusc(**kw):
    base = dict(num_cams=6, cam_names="NUSCENES_CAMERAS", dataset="nuscenes",
                cam_latent_res=(2, 5), bev_latent_res=(4, 4), num_layers=1,
                num_heads=2, num_embed=32, hidden_size=32, vocab_size=16,
                cond_vocab_size=16)
    base.update(kw)
    return MultiViewConfig(**base)


def test_generate_grid():
    g = geometry.generate_grid(3, 5)
    assert g.shape == (3, 3, 5)
    np.testing.assert_allclose(g[0, 0], np.linspace(0, 1, 5), atol=1e-6)
    np.testing.assert_allclose(g[1, :, 0], np.linspace(0, 1, 3), atol=1e-6)
    np.testing.assert_allclose(g[2], 1.0)


def test_seq_pixel_roundtrip():
    cfg = cfg_argo()
    p2s, s2p = geometry.seq_pixel_mappings(cfg)
    n = cfg.num_img_tokens
    assert s2p.shape == (n, 3)
    # bijection
    assert sorted(p2s.reshape(-1).tolist()) == list(range(n))
    for t in range(0, n, 7):
        c, h, w = s2p[t]
        assert p2s[c, h, w] == t


def test_decode_order_argoverse_row_interleave():
    """Argoverse order: per latent row, all columns of cam0, then cam1,
    then cam2 (permuter.py:70-75)."""
    cfg = cfg_argo()
    fwd, bwd = geometry.decode_order(cfg)
    p2s, _ = geometry.seq_pixel_mappings(cfg)
    expect = []
    for i in range(4):
        for c in range(3):
            expect.extend(p2s[c, i, :].tolist())
    np.testing.assert_array_equal(fwd, expect)
    np.testing.assert_array_equal(fwd[bwd], np.arange(len(fwd)))


def test_decode_order_nuscenes_outward():
    """nuScenes order interleaves outward from each group's center camera."""
    cfg = cfg_nusc()
    fwd, bwd = geometry.decode_order(cfg)
    n = cfg.num_img_tokens
    assert sorted(fwd.tolist()) == list(range(n))
    np.testing.assert_array_equal(fwd[bwd], np.arange(n))
    p2s, s2p = geometry.seq_pixel_mappings(cfg)
    names = cfg.camera_names
    # odd width (5): first decoded token of row 0 is CAM_FRONT center col
    front = names.index("CAM_FRONT")
    assert fwd[0] == p2s[front, 0, 2]
    # second group center: CAM_BACK center col appears right after
    back = names.index("CAM_BACK")
    assert fwd[1] == p2s[back, 0, 2]


def test_decode_order_identity_when_not_causal():
    cfg = cfg_argo(causal_order=False)
    fwd, bwd = geometry.decode_order(cfg)
    np.testing.assert_array_equal(fwd, np.arange(cfg.num_img_tokens))


def test_bev_grid_metric_extent():
    cfg = cfg_argo(bev_latent_res=(16, 16))
    g = geometry.get_bev_grid(cfg)
    assert g.shape == (3, 16, 16)
    # the grid spans the 80m x 80m window around the ego
    assert abs(g[:2].max()) <= 45.0 and abs(g[:2].min()) >= 35.0


def test_col_angles_shape_and_range():
    cfg = cfg_nusc()
    a = geometry.col_angles(cfg)
    assert a.shape == (6, cfg.cam_latent_w)
    assert (a >= 0).all() and (a < 2 * np.pi).all()
    # CAM_FRONT columns look near angle 0 (mod 2pi)
    front = np.minimum(a[0], 2 * np.pi - a[0])
    assert front.max() < 0.6


def test_pixel_ray_directions_normalized():
    uv = np.array([[800.0, 450.0], [0.0, 0.0]])
    rays = geometry.compute_pixel_ray_directions(uv, 1266.0, 1266.0, 1600, 900)
    np.testing.assert_allclose(np.linalg.norm(rays, axis=1), 1.0, atol=1e-9)
    # center pixel looks straight ahead (+z)
    np.testing.assert_allclose(rays[0], [0, 0, 1], atol=1e-6)


def test_canonical_rig_invertible_and_forward():
    cfg = cfg_argo()
    intr, extr = geometry.canonical_camera_rig(cfg)
    assert intr.shape == (3, 3, 3) and extr.shape == (3, 4, 4)
    # stored convention is ego_SE3_cam (cam->ego), matching the
    # reference batch dict / cam_data artifact (argoverse.py:288,355):
    # ring_front_center optical axis (cam +z) maps to ego +x (forward)
    center = list(cfg.camera_names).index("ring_front_center")
    fwd_ego = extr[center, :3, :3] @ np.array([0, 0, 1.0])
    np.testing.assert_allclose(fwd_ego, [1, 0, 0], atol=1e-9)


def test_image_direction_vectors():
    cfg = cfg_argo()
    v = geometry.image_direction_vectors(cfg)
    assert v.shape == (cfg.num_img_tokens, 3)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
    # the reference multiplies CAMERA-frame points by inv(ego_SE3_cam)
    # (mask_generator.py:97-103), so the vectors live in the quirk frame
    # v = R^T p: mapping them back through R recovers the camera-frame
    # rays, which for every camera point mostly along the optical axis +z
    _, s2p = geometry.seq_pixel_mappings(cfg)
    _, extr = geometry.canonical_camera_rig(cfg)
    for ci in range(cfg.num_cams):
        sel = s2p[:, 0] == ci
        p = v[sel] @ extr[ci, :3, :3].T  # R @ v = camera-frame ray
        assert p[:, 2].mean() > 0.5, f"camera {ci}"
