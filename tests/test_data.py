"""Data layer tests: rasterizer geometry, sync cache, camera geometry,
loader/collate, token shards."""
import numpy as np
import pytest

from bevgen_tpu.data import camera_geometry as cg
from bevgen_tpu.data import datamodule as dm
from bevgen_tpu.data import rasterize, sync


# ---------------------------------------------------------------------------
# rasterizer
# ---------------------------------------------------------------------------

def test_ego_to_bev_px_known_points():
    # ego origin maps to raster center (128, 128)
    px = rasterize.ego_to_bev_px(np.array([[0.0, 0.0, 0.0]]))
    np.testing.assert_array_equal(px[0], [128, 128])
    # 10m ahead (ego +x) -> bev cam z=10 -> pixel col offset +32
    px = rasterize.ego_to_bev_px(np.array([[10.0, 0.0, 0.0]]))
    np.testing.assert_array_equal(px[0], [128, 160])
    # 10m left (ego +y) -> cam x=-10 -> first coord 96
    px = rasterize.ego_to_bev_px(np.array([[0.0, 10.0, 0.0]]))
    np.testing.assert_array_equal(px[0], [96, 128])


def test_rasterize_scene_channels_and_flip():
    # a vehicle footprint 10m AHEAD of ego: after flipud it must be in
    # the TOP half of the raster (ego points up, README.md:97-101)
    quad = np.array([[8, -1, 0], [8, 1, 0], [12, 1, 0], [12, -1, 0]],
                    np.float64)
    drivable = [np.array([[-20, -20, 0], [-20, 20, 0], [20, 20, 0],
                          [20, -20, 0]], np.float64)]
    layers = rasterize.rasterize_scene(
        drivable_polygons_ego=drivable,
        cuboid_footprints_ego=[("REGULAR_VEHICLE", quad),
                               ("BUS", quad), ("DOG", quad)],
        lane_boundaries_ego=[np.array([[0, -5, 0], [20, -5, 0]])],
        stoplines_ego=[],
        ped_crossing_polygons_ego=[],
    )
    assert layers.shape == (256, 256, 7)
    veh, large, ped, other = layers[..., 0], layers[..., 1], layers[..., 2], layers[..., 3]
    assert veh.sum() > 0 and large.sum() > 0 and other.sum() > 0
    assert ped.sum() == 0
    # vehicle mass in the top half (row < 128) after flipud
    rows = np.nonzero(veh)[0]
    assert rows.max() < 128
    assert layers[..., 4].sum() > 1000          # drivable
    assert layers[..., 5].sum() > 0             # lane lines
    assert layers[..., 6].sum() == 0            # no stop/ped


def test_category_mapping():
    assert rasterize.standard_category("REGULAR_VEHICLE") == "VEHICLE"
    assert rasterize.standard_category("BOX_TRUCK") == "LARGE_VEHICLE"
    assert rasterize.standard_category("PEDESTRIAN") == "PEDESTRIAN"
    assert rasterize.standard_category("WHEELCHAIR") == "OTHER"


def test_raster_npz_roundtrip(tmp_path):
    layers = np.zeros((256, 256, 7), np.float32)
    layers[10, 20, 3] = 1
    p = tmp_path / "x.npz"
    rasterize.save_bev_raster(p, layers)
    back = rasterize.load_bev_raster(p)
    np.testing.assert_array_equal(back, layers)


# ---------------------------------------------------------------------------
# synchronization
# ---------------------------------------------------------------------------

def test_synchronize_nearest_and_tolerance():
    import pandas as pd
    rows = []
    # lidar at 0, 100ms, 200ms; camA near each; camB missing the last
    for t in [0, 100_000_000, 200_000_000]:
        rows.append(("val", "log1", "lidar", t))
    for t in [2_000_000, 98_000_000, 201_000_000]:
        rows.append(("val", "log1", "camA", t))
    for t in [1_000_000, 99_000_000]:
        rows.append(("val", "log1", "camB", t))
    rec = pd.DataFrame(rows, columns=["split", "log_id", "sensor_name",
                                      "timestamp_ns"])
    out = sync.synchronize(rec, "lidar", ["camA", "camB"])
    assert len(out) == 3
    assert out.camA.tolist() == [2_000_000, 98_000_000, 201_000_000]
    assert out.camB.tolist()[:2] == [1_000_000, 99_000_000]
    assert pd.isna(out.camB.iloc[2])
    full = sync.filter_complete(out, ["camA", "camB"])
    assert len(full) == 2


def test_build_sensor_records_paths():
    files = [
        "root/val/logX/sensors/cameras/ring_front_center/123.jpg",
        "root/val/logX/sensors/lidar/456.feather",
    ]
    df = sync.build_sensor_records(files, "val")
    assert set(df.sensor_name) == {"ring_front_center", "lidar"}
    assert set(df.log_id) == {"logX"}
    assert set(df.timestamp_ns) == {123, 456}


# ---------------------------------------------------------------------------
# camera geometry
# ---------------------------------------------------------------------------

def test_intrinsic_adjust_scale_then_crop_order():
    K = np.array([[1000.0, 0, 800], [0, 1000, 450], [0, 0, 1]])
    a = cg.CamIntrinsicAdjust(rescale_first=True)
    a.set_scale(0.5, 0.25)
    a.set_crop(10, 20)
    out = a.apply(K)
    np.testing.assert_allclose(out[0], [500, 0, 400 - 20])
    np.testing.assert_allclose(out[1], [0, 250, 112.5 - 10])
    b = cg.CamIntrinsicAdjust(rescale_first=False)
    b.set_scale(0.5, 0.25)
    b.set_crop(10, 20)
    out = b.apply(K)
    np.testing.assert_allclose(out[0], [500, 0, (800 - 20) * 0.5])
    np.testing.assert_allclose(out[1], [0, 250, (450 - 10) * 0.25])


def test_square_crops():
    img = np.arange(4 * 6 * 3).reshape(4, 6, 3)  # landscape h=4 w=6
    left = cg.square_crop(img, "ring_front_left")
    np.testing.assert_array_equal(left, img[:, 2:])
    right = cg.square_crop(img, "ring_front_right")
    np.testing.assert_array_equal(right, img[:, :4])


def test_normalize_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.uniform(0.05, 0.95, (8, 8, 3)).astype(np.float32)
    back = cg.denormalize_image(cg.normalize_image(img))
    np.testing.assert_allclose(back, img, atol=1e-5)


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------

class _ToyDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return {"image": np.full((2, 2), i, np.float32), "sample_token": f"t{i}"}


def test_dataloader_orders_and_shapes():
    dl = dm.DataLoader(_ToyDataset(), batch_size=3, shuffle=False,
                       num_workers=2)
    batches = list(dl)
    assert len(batches) == 3  # drop_last
    assert batches[0]["image"].shape == (3, 2, 2)
    assert batches[0]["sample_token"] == ["t0", "t1", "t2"]
    assert batches[2]["sample_token"] == ["t6", "t7", "t8"]


def test_dataloader_shuffle_deterministic():
    d1 = dm.DataLoader(_ToyDataset(), 3, shuffle=True, seed=5)
    d2 = dm.DataLoader(_ToyDataset(), 3, shuffle=True, seed=5)
    a = [b["sample_token"] for b in d1]
    b = [b["sample_token"] for b in d2]
    assert a == b
    # next epoch differs
    c = [b["sample_token"] for b in d1]
    assert c != a


def test_token_shards_roundtrip(tmp_path):
    from bevgen_tpu.data.tokens import TokenDataset
    n, cam, hw, nc = 5, 3, 16, 16
    rng = np.random.default_rng(0)
    np.savez_compressed(
        tmp_path / "shard_00000.npz",
        tokens=rng.integers(0, 100, (n, cam, hw)).astype(np.int16),
        cond_ids=rng.integers(0, 100, (n, nc)).astype(np.int16),
        intrinsics_inv=rng.standard_normal((n, cam, 3, 3)).astype(np.float32),
        extrinsics_inv=rng.standard_normal((n, cam, 4, 4)).astype(np.float32),
        sample_token=np.asarray([f"s{i}" for i in range(n)]),
    )
    ds = TokenDataset(tmp_path)
    assert len(ds) == 5
    s = ds[2]
    assert s["tokens"].shape == (cam, hw) and s["tokens"].dtype == np.int32
    assert s["sample_token"] == "s2"


def test_dataloader_propagates_worker_errors():
    """A failing __getitem__ in a worker thread must raise in the
    consumer, not hang the iteration forever."""
    import pytest
    from bevgen_tpu.data import datamodule as dm

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 3:
                raise ValueError("boom at 3")
            return {"x": np.zeros((2, 2), np.float32)}

    loader = dm.DataLoader(Bad(), batch_size=2, shuffle=False,
                           num_workers=2, drop_last=False)
    with pytest.raises(ValueError, match="boom at 3"):
        for _ in loader:
            pass


def test_square_crop_ring_side_rear_center_crop():
    """Side/rear ring cameras (7-cam rig, our extension — the reference
    raises): centered square crop, offsets consistent for intrinsics."""
    img = np.arange(4 * 6 * 3).reshape(4, 6, 3)  # landscape h=4 w=6
    for cam in ("ring_side_left", "ring_rear_right"):
        out = cg.square_crop(img, cam)
        np.testing.assert_array_equal(out, img[:, 1:5])
        top, left = cg.square_crop_offsets(cam, 4, 6)
        assert (top, left) == (0, 1)
    # portrait input
    imgp = np.arange(6 * 4 * 3).reshape(6, 4, 3)
    outp = cg.square_crop(imgp, "ring_rear_left")
    np.testing.assert_array_equal(outp, imgp[1:5])
    assert cg.square_crop_offsets("ring_rear_left", 6, 4) == (1, 0)


# ---------------------------------------------------------------------------
# nuScenes loader against a synthetic devkit-format fixture
# ---------------------------------------------------------------------------


def _write_nuscenes_fixture(root, n_samples=2, img_hw=(32, 48)):
    """Minimal v1.0-mini-shaped table tree + jpgs: 1 scene, n samples,
    6 cameras + LIDAR_TOP, one car annotation per sample."""
    import json
    import cv2
    from bevgen_tpu.data import nuscenes as ns

    version = "v1.0-mini"
    tdir = root / version
    tdir.mkdir(parents=True)
    h, w = img_hw

    sensors, calib, sample_data, ego_pose = [], [], [], []
    chans = list(ns.NUSCENES_CAMERAS) + ["LIDAR_TOP"]
    for ch in chans:
        sensors.append({"token": f"sen-{ch}", "channel": ch,
                        "modality": "lidar" if "LIDAR" in ch else "camera"})
        row = {"token": f"cal-{ch}", "sensor_token": f"sen-{ch}",
               "translation": [1.0, 0.0, 1.5],
               "rotation": [0.5, -0.5, 0.5, -0.5]}
        if "LIDAR" not in ch:
            row["camera_intrinsic"] = [[40.0, 0.0, w / 2],
                                       [0.0, 40.0, h / 2],
                                       [0.0, 0.0, 1.0]]
        calib.append(row)

    scene = [{"token": "scene0", "name": "scene-9999", "log_token": "log0"}]
    samples, anns, instances = [], [], []
    categories = [{"token": "cat-car", "name": "vehicle.car"}]
    rng = np.random.default_rng(0)
    for i in range(n_samples):
        tok = f"samp{i}"
        samples.append({"token": tok, "scene_token": "scene0",
                        "timestamp": 1000 + i})
        ego_pose.append({"token": f"pose{i}",
                         "translation": [100.0 + i, 200.0, 0.0],
                         "rotation": [1.0, 0.0, 0.0, 0.0],
                         "timestamp": 1000 + i})
        for ch in chans:
            fname = f"samples/{ch}/{tok}.jpg"
            if "LIDAR" not in ch:
                (root / "samples" / ch).mkdir(parents=True, exist_ok=True)
                img = rng.integers(0, 255, (h, w, 3), np.uint8)
                cv2.imwrite(str(root / fname), img)
            sample_data.append({
                "token": f"sd-{tok}-{ch}", "sample_token": tok,
                "ego_pose_token": f"pose{i}",
                "calibrated_sensor_token": f"cal-{ch}",
                "filename": fname, "is_key_frame": True})
        instances.append({"token": f"inst{i}", "category_token": "cat-car"})
        anns.append({"token": f"ann{i}", "sample_token": tok,
                     "instance_token": f"inst{i}",
                     "translation": [105.0 + i, 202.0, 0.5],
                     "size": [2.0, 4.5, 1.6],
                     "rotation": [0.924, 0.0, 0.0, 0.383]})

    tables = {"scene": scene, "sample": samples, "sample_data": sample_data,
              "calibrated_sensor": calib, "sensor": sensors,
              "ego_pose": ego_pose, "sample_annotation": anns,
              "instance": instances, "category": categories}
    for name, rows in tables.items():
        (tdir / f"{name}.json").write_text(json.dumps(rows))
    return version


def test_nuscenes_loader_synthetic_fixture(tmp_path):
    """End-to-end drive of the devkit-free loader on a synthetic
    v1.0-mini-shaped tree: schema, shapes, intrinsics rescale, raster."""
    from bevgen_tpu.data import nuscenes as ns

    version = _write_nuscenes_fixture(tmp_path)
    ds = ns.NuScenesDataset(version=version, dataset_dir=str(tmp_path),
                            cam_res=(16, 24), scene_names=["scene-9999"])
    assert len(ds) == 2
    item = ds[0]
    assert item["image"].shape == (6, 16, 24, 3)
    assert item["segmentation"].shape == (256, 256, 12)
    assert item["intrinsics"].shape == (6, 3, 3)
    assert item["extrinsics"].shape == (6, 4, 4)
    assert item["dataset"] == "nuscenes"
    assert item["sample_token"] == "samp0"
    # intrinsics rescaled to the target resolution: fx scaled by 24/48
    np.testing.assert_allclose(item["intrinsics"][0, 0, 0], 20.0)
    np.testing.assert_allclose(item["intrinsics"][0, 1, 1], 20.0)
    np.testing.assert_allclose(
        item["intrinsics_inv"][0] @ item["intrinsics"][0], np.eye(3),
        atol=1e-5)
    # the car annotation 5m ahead rasterizes into the car channel —
    # the reference CLASSES order puts dynamics right after the 2
    # static + 2 divider channels (nuscenes_helper.py:16-30)
    assert item["segmentation"][..., 2 + 2 + 0].sum() > 0
    # extrinsics: the reference nuScenes convention is cam_from_ego
    # (parse_sample_record, nuscenes_helper.py:281-312). The fixture's
    # ego poses are identity-rotation and shared across sensors, so
    # inv(E) is exactly ego_SE3_cam with the calibrated translation
    E = item["extrinsics"][0]
    np.testing.assert_allclose(np.linalg.inv(E)[:3, 3], [1.0, 0.0, 1.5],
                               atol=1e-6)
    np.testing.assert_allclose(np.abs(np.linalg.det(E[:3, :3])), 1.0,
                               atol=1e-6)


def test_nuscenes_quat_helpers_match_scipy():
    """quat_to_rotmat / quat_yaw vs scipy's Rotation (wxyz -> xyzw)."""
    from scipy.spatial.transform import Rotation
    from bevgen_tpu.data import nuscenes as ns

    rng = np.random.default_rng(3)
    for _ in range(10):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        R_ref = Rotation.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()
        np.testing.assert_allclose(ns.quat_to_rotmat(q), R_ref, atol=1e-12)
        yaw = ns.quat_yaw(q)
        np.testing.assert_allclose(
            [np.cos(yaw), np.sin(yaw)],
            [R_ref[0, 0], R_ref[1, 0]] /
            np.hypot(R_ref[0, 0], R_ref[1, 0]), atol=1e-12)
    # se3 inverse composes to identity
    q = rng.standard_normal(4); q /= np.linalg.norm(q)
    t = rng.standard_normal(3)
    np.testing.assert_allclose(ns.se3(q, t) @ ns.se3(q, t, inv=True),
                               np.eye(4), atol=1e-12)


def test_nuscenes_scene_splits_shipped():
    """The official nuScenes trainval scene lists ship as data files
    (reference bev_utils/splits/)."""
    from bevgen_tpu.data.nuscenes import scene_split
    train, val, test = (scene_split(s) for s in ("train", "val", "test"))
    assert len(train) == 700 and len(val) == 150 and len(test) == 6
    assert not set(train) & set(val)
    assert all(s.startswith("scene-") for s in train[:5] + val[:5])
    with pytest.raises(ValueError, match="unknown nuScenes split"):
        scene_split("bogus")


def test_small_val_subsets_validation():
    """small_val subsets validation to 2*batch_size samples
    (reference datamodule_from_config.py:58-62)."""
    from bevgen_tpu.data.datamodule import DataModule

    class Rng:
        def __len__(self):
            return 100

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32)}

    dm = DataModule(validation=Rng(), batch_size=3, num_workers=0,
                    small_val=True)
    batches = list(dm.val_dataloader())
    n = sum(b["x"].shape[0] for b in batches)
    assert n == 6
    # full validation keeps the partial final batch (drop_last=False)
    dm_full = DataModule(validation=Rng(), batch_size=3, num_workers=0)
    assert sum(b["x"].shape[0]
               for b in dm_full.val_dataloader()) == 100
