"""Reference-EXECUTED data-layer equivalence (VERDICT r4 item 5).

Builds a synthetic AV2 log tree (jpgs + calibration feathers + lidar
stems + BEV npzs), pushes it through BOTH the real reference
`Argoverse.__getitem__` in multi_camera mode (bev_utils/argoverse.py:
220-305 executing unmodified, av2/torchvision deps stubbed faithfully —
tests/ref_harness.install_data_stubs) AND our devkit-free
`data/argoverse.py`, and compares the batch dicts sample-for-sample.

Parity surfaces executed on the reference side: the multi-sensor sync
cache (argoverse_multi_sensor_dataloader.py:454-508 merge_asof build +
lookup), per-camera square crops incl. the ring_front_center
transpose dance (argoverse.py:267,275-283), PIL-bicubic uint8 resize +
to_tensor + Normalize (argoverse.py:186-217), NusceneCamGeometry
intrinsic adjustment, and the K/E float32 inverse stacking
(argoverse.py:296-305).
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_harness  # noqa: E402

CAMS = ["ring_front_left", "ring_front_center", "ring_front_right"]
ALL_CAMS = CAMS + ["ring_rear_left", "ring_rear_right",
                   "ring_side_left", "ring_side_right"]
BASE_TS = 315971436000000000


def _write_jpg(path: Path, img_rgb: np.ndarray):
    import cv2
    path.parent.mkdir(parents=True, exist_ok=True)
    assert cv2.imwrite(str(path), cv2.cvtColor(img_rgb, cv2.COLOR_RGB2BGR),
                       [cv2.IMWRITE_JPEG_QUALITY, 92])


@pytest.fixture(scope="module")
def av2_tree(tmp_path_factory):
    """2 logs x 4 sweeps; ring_front_left (the reference's sync source
    camera) timestamped exactly at the lidar sweeps, the others +2 ms
    (inside every tolerance) so both data layers select identical
    frames and tokens."""
    import pandas as pd

    root = tmp_path_factory.mktemp("av2")
    rng = np.random.default_rng(42)
    for log_i in range(2):
        log = f"log-{log_i:02d}"
        log_dir = root / "sensor" / "val" / log
        # calibration feathers (all 7 ring cams)
        intr_rows, extr_rows = [], []
        for ci, cam in enumerate(ALL_CAMS):
            intr_rows.append({
                "sensor_name": cam,
                "fx_px": 60.0 + 3 * ci + log_i,
                "fy_px": 61.5 + 2 * ci,
                "cx_px": 24.0 + ci, "cy_px": 31.0 - ci,
                "width_px": 64, "height_px": 48,
            })
            q = rng.normal(size=4)
            q = q / np.linalg.norm(q)
            extr_rows.append({
                "sensor_name": cam, "qw": q[0], "qx": q[1], "qy": q[2],
                "qz": q[3], "tx_m": float(rng.normal()),
                "ty_m": float(rng.normal()), "tz_m": float(rng.normal()),
            })
        calib = log_dir / "calibration"
        calib.mkdir(parents=True)
        pd.DataFrame(intr_rows).to_feather(calib / "intrinsics.feather")
        pd.DataFrame(extr_rows).to_feather(
            calib / "egovehicle_SE3_sensor.feather")

        for i in range(4):
            lidar_ts = BASE_TS + log_i * 10 ** 13 + i * 100_000_000
            # lidar stems (content never read — record parsing only)
            lp = log_dir / "sensors" / "lidar" / f"{lidar_ts}.feather"
            lp.parent.mkdir(parents=True, exist_ok=True)
            lp.write_bytes(b"")
            for cam in ALL_CAMS:
                ts = lidar_ts if cam == "ring_front_left" \
                    else lidar_ts + 2_000_000
                if cam == "ring_front_center":
                    shape = (64, 48, 3)     # portrait, like the real rig
                elif cam in CAMS:
                    shape = (48, 64, 3)     # landscape
                else:
                    shape = (16, 16, 3)     # present only for sync columns
                img = rng.integers(0, 256, shape, dtype=np.uint8)
                _write_jpg(log_dir / "sensors" / "cameras" / cam /
                           f"{ts}.jpg", img)
            seg = (rng.random((32, 32, 7)) > 0.5).astype(np.uint8)
            bev = root / "bev" / "val" / log
            bev.mkdir(parents=True, exist_ok=True)
            np.savez(bev / f"{lidar_ts}.npz", seg)
    return root


def _load_reference_samples(root):
    argo_mod, _ = ref_harness.import_ref_argoverse()
    ds = argo_mod.Argoverse(
        split=1, multi_camera=True, return_cam_img=True,
        return_bev_img=True, dataset_dir=root, bev_dir_name="bev",
        cam_res=(64, 64), specific_cameras=CAMS, square_image=True,
        normalize_cam_img=True, augment_cam_img=False,
        augment_bev_img=False)
    out = {}
    for i in range(len(ds)):
        s = ds[i]
        out[s["sample_token"]] = s
    return out


def _load_our_samples(root):
    from bevgen_tpu.data.argoverse import ArgoverseDataset
    ds = ArgoverseDataset(
        split="val", dataset_dir=str(root), bev_dir_name="bev",
        cam_res=(64, 64), specific_cameras=CAMS, square_image=True,
        normalize_cam_img=True)
    out = {}
    for i in range(len(ds)):
        s = ds[i]
        out[s["sample_token"]] = s
    return out


@pytest.mark.slow
def test_reference_batch_dict_equivalence(av2_tree):
    ref = _load_reference_samples(av2_tree)
    ours = _load_our_samples(av2_tree)

    assert set(ref) == set(ours), (
        f"sample sets differ: ref-only {set(ref) - set(ours)}, "
        f"ours-only {set(ours) - set(ref)}")
    assert len(ref) == 8

    for token in sorted(ref):
        r, o = ref[token], ours[token]
        assert list(r["cam_name"]) == list(o["cam_name"]) == CAMS
        assert r["dataset"] == o["dataset"] == "argoverse"

        # image: identical jpg decode (cv2 both sides) -> identical
        # square crop -> identical PIL bicubic resize -> float32
        # normalize; the only tolerance is torch-vs-numpy float32
        # elementwise rounding
        assert r["image"].shape == o["image"].shape == (3, 64, 64, 3)
        np.testing.assert_allclose(o["image"], r["image"], atol=2e-6,
                                   err_msg=token)

        np.testing.assert_array_equal(o["segmentation"],
                                      r["segmentation"], err_msg=token)

        np.testing.assert_allclose(
            np.asarray(o["intrinsics"], np.float32), r["intrinsics"],
            rtol=1e-6, atol=1e-4, err_msg=token)
        np.testing.assert_allclose(
            np.asarray(o["extrinsics"], np.float32), r["extrinsics"],
            rtol=1e-6, atol=1e-6, err_msg=token)
        # the reference inverts the float32-cast K (argoverse.py:293);
        # we invert in float64 — compare at float32 resolution
        np.testing.assert_allclose(
            np.asarray(o["intrinsics_inv"], np.float32),
            r["intrinsics_inv"], rtol=1e-5, atol=1e-6, err_msg=token)
        np.testing.assert_allclose(
            np.asarray(o["extrinsics_inv"], np.float32),
            r["extrinsics_inv"], rtol=1e-5, atol=1e-6, err_msg=token)
