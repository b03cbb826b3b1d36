"""scripts/validate_data.py against a good synthetic AV2/nuScenes tree
and deliberately-corrupted variants (VERDICT r2 item 8: every schema
assumption the readers make gets an actionable per-file error)."""
import json
import shutil

import numpy as np
import pandas as pd
import pytest

from bevgen_tpu.scripts import validate_data as vd

CAMS = ("ring_front_left", "ring_front_center", "ring_front_right")


def _write_av2_tree(root, sweeps=3, log_id="LOG0"):
    """Tiny but schema-complete AV2 sensor tree + BEV npz."""
    import cv2
    log = root / "sensor" / "val" / log_id
    bev = root / "bev_seg_full_11_14" / "val" / log_id
    bev.mkdir(parents=True)
    (log / "sensors" / "lidar").mkdir(parents=True)
    (log / "calibration").mkdir(parents=True)
    land = np.zeros((48, 64, 3), np.uint8)
    port = np.zeros((64, 48, 3), np.uint8)
    rows_i, rows_e = [], []
    for cam in CAMS:
        d = log / "sensors" / "cameras" / cam
        d.mkdir(parents=True)
        img = port if cam == "ring_front_center" else land
        h, w = img.shape[:2]
        for s in range(sweeps):
            ts = 1_000_000_000 + s * 100_000_000
            cv2.imwrite(str(d / f"{ts}.jpg"), img)
        rows_i.append({"sensor_name": cam, "fx_px": 40.0, "fy_px": 40.0,
                       "cx_px": w / 2, "cy_px": h / 2,
                       "width_px": w, "height_px": h})
        rows_e.append({"sensor_name": cam, "qw": 1.0, "qx": 0.0,
                       "qy": 0.0, "qz": 0.0, "tx_m": 1.0, "ty_m": 0.0,
                       "tz_m": 1.5})
    for s in range(sweeps):
        ts = 1_000_000_000 + s * 100_000_000
        (log / "sensors" / "lidar" / f"{ts}.feather").touch()
        np.savez_compressed(
            bev / f"{ts}.npz",
            (np.arange(256 * 256 * 7).reshape(256, 256, 7) % 5 == 0
             ).astype(np.uint8))
    pd.DataFrame(rows_i).to_feather(
        log / "calibration" / "intrinsics.feather")
    pd.DataFrame(rows_e).to_feather(
        log / "calibration" / "egovehicle_SE3_sensor.feather")
    return log, bev


def test_av2_clean_tree_passes(tmp_path):
    _write_av2_tree(tmp_path)
    rep = vd.validate_argoverse(tmp_path, deep=True)
    assert rep.errors == [], [str(i) for i in rep.errors]
    assert rep.checked > 5


def test_av2_missing_calibration_column(tmp_path):
    log, _ = _write_av2_tree(tmp_path)
    f = log / "calibration" / "intrinsics.feather"
    df = pd.read_feather(f).rename(columns={"fx_px": "focal_x"})
    df.to_feather(f)
    rep = vd.validate_argoverse(tmp_path)
    assert any("fx_px" in i.message and "intrinsics" in i.path
               for i in rep.errors)


def test_av2_bad_timestamp_filename(tmp_path):
    log, _ = _write_av2_tree(tmp_path)
    d = log / "sensors" / "cameras" / "ring_front_left"
    (d / "notatimestamp.jpg").write_bytes(b"x")
    rep = vd.validate_argoverse(tmp_path)
    assert any("notatimestamp" in i.path and "integer" in i.message
               for i in rep.errors)


def test_av2_microsecond_stamps_break_sync(tmp_path):
    """Stamps in µs instead of ns make every cam<->lidar offset exceed
    the 25 ms tolerance scaled wrongly — the validator names the cause."""
    log, bev = _write_av2_tree(tmp_path, sweeps=2)
    for cam in CAMS:
        d = log / "sensors" / "cameras" / cam
        for i, f in enumerate(sorted(d.glob("*.jpg"))):
            # shift cameras 100 ms away from every lidar stamp
            f.rename(d / f"{int(f.stem) + 50_000_000}.jpg")
    rep = vd.validate_argoverse(tmp_path)
    assert any("0 of" in i.message and "ms" in i.message
               for i in rep.errors)


def test_av2_bev_wrong_shape_and_range(tmp_path):
    _, bev = _write_av2_tree(tmp_path, sweeps=2)
    files = sorted(bev.glob("*.npz"))
    np.savez_compressed(files[0], np.zeros((128, 128, 7), np.uint8))
    np.savez_compressed(files[1], np.full((256, 256, 7), 3.0, np.float32))
    rep = vd.validate_argoverse(tmp_path, deep=True)
    msgs = [i.message for i in rep.errors]
    assert any("shape" in m for m in msgs)
    assert any("[0,1]" in m for m in msgs)


def test_av2_bev_stamps_mismatch(tmp_path):
    _, bev = _write_av2_tree(tmp_path, sweeps=2)
    for f in bev.glob("*.npz"):
        f.rename(bev / f"{int(f.stem) + 7}.npz")
    rep = vd.validate_argoverse(tmp_path)
    assert any("no BEV npz matches" in i.message for i in rep.errors)


def test_av2_missing_camera_dir(tmp_path):
    log, _ = _write_av2_tree(tmp_path)
    shutil.rmtree(log / "sensors" / "cameras" / "ring_front_right")
    rep = vd.validate_argoverse(tmp_path)
    assert any("ring_front_right" in i.path and "missing" in i.message
               for i in rep.errors)


def test_av2_orientation_and_size_mismatch_deep(tmp_path):
    import cv2
    log, _ = _write_av2_tree(tmp_path)
    # front-center saved landscape: the reader's square-crop assumption
    d = log / "sensors" / "cameras" / "ring_front_center"
    for f in d.glob("*.jpg"):
        cv2.imwrite(str(f), np.zeros((48, 64, 3), np.uint8))
    rep = vd.validate_argoverse(tmp_path, deep=True)
    assert any("landscape" in i.message for i in rep.issues)
    assert any("calibration" in i.message and "scale" in i.message
               for i in rep.errors)


def test_nuscenes_clean_fixture_passes(tmp_path):
    from test_data import _write_nuscenes_fixture
    version = _write_nuscenes_fixture(tmp_path)
    rep = vd.validate_nuscenes(tmp_path, version=version, deep=True)
    assert rep.errors == [], [str(i) for i in rep.errors]


def test_nuscenes_missing_table_and_keys(tmp_path):
    from test_data import _write_nuscenes_fixture
    version = _write_nuscenes_fixture(tmp_path)
    tdir = tmp_path / version
    (tdir / "ego_pose.json").unlink()
    rows = json.loads((tdir / "sample_data.json").read_text())
    for r in rows:
        r.pop("is_key_frame")
    (tdir / "sample_data.json").write_text(json.dumps(rows))
    rep = vd.validate_nuscenes(tmp_path, version=version)
    assert any("ego_pose" in i.path for i in rep.errors)
    assert any("is_key_frame" in i.message for i in rep.errors)


def test_nuscenes_incomplete_keyframes(tmp_path):
    from test_data import _write_nuscenes_fixture
    version = _write_nuscenes_fixture(tmp_path)
    tdir = tmp_path / version
    rows = json.loads((tdir / "sample_data.json").read_text())
    rows = [r for r in rows if "CAM_BACK-" not in r["token"]
            and not r["token"].endswith("CAM_BACK")]
    (tdir / "sample_data.json").write_text(json.dumps(rows))
    rep = vd.validate_nuscenes(tmp_path, version=version)
    assert any("CAM_BACK" in i.message for i in rep.errors)


def test_nuscenes_missing_image_deep(tmp_path):
    from test_data import _write_nuscenes_fixture
    version = _write_nuscenes_fixture(tmp_path)
    victim = next((tmp_path / "samples" / "CAM_FRONT").glob("*.jpg"))
    victim.unlink()
    rep = vd.validate_nuscenes(tmp_path, version=version, deep=True)
    assert any("missing on disk" in i.message for i in rep.errors)


def test_cli_exit_codes(tmp_path, capsys):
    _write_av2_tree(tmp_path)
    with pytest.raises(SystemExit) as e:
        vd.main([f"root={tmp_path}", "dataset=argoverse"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["errors"] == 0
    shutil.rmtree(tmp_path / "sensor")
    with pytest.raises(SystemExit) as e:
        vd.main([f"root={tmp_path}", "dataset=argoverse"])
    assert e.value.code == 1
