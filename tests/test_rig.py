"""Measured camera-rig artifact path (VERDICT r1 missing item #1).

The reference builds its geometric camera-bias matrices from a measured
rig saved at `pretrained/cam_data_{dataset}.pt`
(mask_generator.py:89-110, saved by bev_utils/argoverse.py:355). Our
equivalent: MultiViewConfig.rig_path -> geometry.load_rig ->
image_direction_vectors -> masks.camera_bias_matrix.
"""
import numpy as np
import pytest

from bevgen_tpu.core.config import MultiViewConfig
from bevgen_tpu.models import geometry, masks


def cfg_geo(rig_path=None):
    return MultiViewConfig(
        num_layers=2, num_heads=2, num_embed=64, hidden_size=64,
        dim_head=32, vocab_size=24, cond_vocab_size=20, num_cams=3,
        cam_names="ARGOVERSE_FRONT_CAMERAS", dataset="argoverse",
        cam_res=(32, 32), cam_latent_res=(4, 4), bev_latent_res=(4, 4),
        window_len=4, camera_bias=True, image_embed=True, bev_embed=True,
        legacy_prob_matrix=False, rig_path=rig_path)


def measured_rig(cfg, seed=0):
    """A 'measured' rig: the canonical one with perturbed focals/yaws."""
    intr, extr = geometry.canonical_camera_rig(cfg)
    rng = np.random.default_rng(seed)
    intr = intr.copy()
    intr[:, 0, 0] *= 1.0 + 0.2 * rng.standard_normal(len(intr))
    intr[:, 1, 1] = intr[:, 0, 0]
    # extra yaw wiggle per camera (rotate the ego<-cam block)
    extr = extr.copy()
    for i in range(len(extr)):
        a = 0.15 * rng.standard_normal()
        c, s = np.cos(a), np.sin(a)
        rot = np.eye(4)
        rot[:2, :2] = [[c, -s], [s, c]]
        extr[i] = extr[i] @ rot
    return intr, extr


def test_npz_rig_round_trip(tmp_path):
    cfg0 = cfg_geo()
    intr, extr = measured_rig(cfg0)
    path = str(tmp_path / "cam_data.npz")
    # ArgoverseDataset.save_cam_data layout: batched row
    np.savez(path, intrinsics=intr[None], extrinsics=extr[None])
    cfg = cfg_geo(rig_path=path)
    li, le = geometry.load_rig(cfg)
    np.testing.assert_allclose(li, intr)
    np.testing.assert_allclose(le, extr)


def test_measured_rig_changes_bias_matrix(tmp_path):
    cfg0 = cfg_geo()
    intr, extr = measured_rig(cfg0)
    path = str(tmp_path / "cam_data.npz")
    np.savez(path, intrinsics=intr[None], extrinsics=extr[None])
    cfg = cfg_geo(rig_path=path)

    canon = masks.camera_bias_matrix(cfg0)
    measured = masks.camera_bias_matrix(cfg)
    assert canon.shape == measured.shape
    assert not np.allclose(canon, measured), \
        "measured rig must produce a different geometric bias prior"


def test_torch_pt_rig_artifact(tmp_path):
    """The reference's own cam_data_*.pt artifact format loads too."""
    torch = pytest.importorskip("torch")
    cfg0 = cfg_geo()
    intr, extr = measured_rig(cfg0)
    path = str(tmp_path / "cam_data_argoverse.pt")
    torch.save({"intrinsics": torch.tensor(intr[None]),
                "extrinsics": torch.tensor(extr[None])}, path)
    cfg = cfg_geo(rig_path=path)
    li, le = geometry.load_rig(cfg)
    np.testing.assert_allclose(li, intr, atol=1e-6)
    np.testing.assert_allclose(le, extr, atol=1e-6)


def test_nuscenes_rig_reordered_to_config_cameras(tmp_path):
    """nuScenes artifacts are stored in NUSCENES_CAMERAS order and must
    be reordered/selected to the config's camera set
    (mask_generator.py:91)."""
    full = MultiViewConfig(
        num_layers=1, num_heads=2, num_embed=64, hidden_size=64,
        vocab_size=8, cond_vocab_size=8, num_cams=6,
        cam_names="NUSCENES_CAMERAS", dataset="nuscenes",
        cam_res=(32, 32), cam_latent_res=(4, 4), bev_latent_res=(4, 4))
    intr, extr = measured_rig(full, seed=3)
    path = str(tmp_path / "cam_data_nuscenes.npz")
    np.savez(path, intrinsics=intr[None], extrinsics=extr[None])

    abl = MultiViewConfig(
        num_layers=1, num_heads=2, num_embed=64, hidden_size=64,
        vocab_size=8, cond_vocab_size=8, num_cams=3,
        cam_names="NUSCENES_ABLATION_CAMERAS", dataset="nuscenes",
        cam_res=(32, 32), cam_latent_res=(4, 4), bev_latent_res=(4, 4),
        rig_path=path)
    li, le = geometry.load_rig(abl)
    from bevgen_tpu.core.config import CAMERA_SETS
    stored = CAMERA_SETS["NUSCENES_CAMERAS"]
    for out_row, name in enumerate(CAMERA_SETS["NUSCENES_ABLATION_CAMERAS"]):
        src = stored.index(name)
        np.testing.assert_allclose(li[out_row], intr[src])
        np.testing.assert_allclose(le[out_row], extr[src])


def test_generation_runs_with_measured_rig(tmp_path):
    import jax
    import jax.numpy as jnp
    from bevgen_tpu.models.stage2.transformer import MultiViewTransformer

    cfg0 = cfg_geo()
    intr, extr = measured_rig(cfg0)
    path = str(tmp_path / "cam_data.npz")
    np.savez(path, intrinsics=intr[None], extrinsics=extr[None])
    cfg = cfg_geo(rig_path=path)

    model = MultiViewTransformer(cfg)
    b, cam, hw = 1, cfg.num_cams, cfg.num_cam_tokens
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, cam, hw)), jnp.int32)
    cond = jnp.asarray(
        rng.integers(0, cfg.cond_vocab_size, (b, cfg.num_cond_tokens)),
        jnp.int32)
    ii = jnp.asarray(np.broadcast_to(np.linalg.inv(intr)[None],
                                     (b, cam, 3, 3)), jnp.float32)
    ei = jnp.asarray(np.broadcast_to(np.linalg.inv(extr)[None],
                                     (b, cam, 4, 4)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, cond, ii, ei)
    out = model.apply(params, ids, cond, ii, ei).logits
    assert np.isfinite(np.asarray(out)).all()
