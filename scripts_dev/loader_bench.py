"""Host data-path throughput: can the loader feed the TPU?

Synthesizes an AV2-format log tree (7 ring cameras at full 2048x1550
jpgs + lidar stamps + calibration feathers + BEV npz), then measures
ArgoverseDataset -> DataLoader scenes/sec. TPU demand at the measured
serving optimum is ~1.43 scenes/sec (batch 2 / 1.4 s decode), so the
margin printed at the end is the answer to SURVEY §7 hard-part 4.

Run: python scripts_dev/loader_bench.py [sweeps] [workers]
"""
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

SWEEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
WORKERS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
CAMS = ("ring_rear_left", "ring_side_left", "ring_front_left",
        "ring_front_center", "ring_front_right", "ring_side_right",
        "ring_rear_right")
W, H = 2048, 1550

root = Path("/tmp/loader_bench_data")
shutil.rmtree(root, ignore_errors=True)
log = root / "sensor" / "val" / "LOG0"
bev = root / "bev_seg_full_11_14" / "val" / "LOG0"
bev.mkdir(parents=True)
(log / "sensors" / "lidar").mkdir(parents=True)
(log / "calibration").mkdir(parents=True)

import cv2

# structured content so jpeg encode/decode costs are realistic-ish
yy, xx = np.mgrid[0:H, 0:W]
base = ((np.sin(xx / 37.0) + np.cos(yy / 23.0)) * 60 + 128)
img = np.stack([base, base[::-1], base[:, ::-1]], axis=-1).astype(np.uint8)

t_build = time.perf_counter()
for cam in CAMS:
    d = log / "sensors" / "cameras" / cam
    d.mkdir(parents=True)
    for s in range(SWEEPS):
        ts = 1_000_000_000 + s * 100_000_000
        cv2.imwrite(str(d / f"{ts}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 85])
for s in range(SWEEPS):
    ts = 1_000_000_000 + s * 100_000_000
    (log / "sensors" / "lidar" / f"{ts}.feather").touch()
    np.savez_compressed(bev / f"{ts}.npz",
                        (np.random.default_rng(s).uniform(
                            0, 1, (256, 256, 7)) < 0.2).astype(np.uint8))
pd.DataFrame([{"sensor_name": c, "fx_px": 1500.0, "fy_px": 1500.0,
               "cx_px": W / 2, "cy_px": H / 2, "width_px": W,
               "height_px": H} for c in CAMS]).to_feather(
    log / "calibration" / "intrinsics.feather")
pd.DataFrame([{"sensor_name": c, "qw": 1.0, "qx": 0.0, "qy": 0.0,
               "qz": 0.0, "tx_m": 1.0, "ty_m": 0.0, "tz_m": 1.5}
              for c in CAMS]).to_feather(
    log / "calibration" / "egovehicle_SE3_sensor.feather")
print(f"built {SWEEPS} sweeps x {len(CAMS)} cams "
      f"({time.perf_counter() - t_build:.1f}s)")

from bevgen_tpu.data import datamodule as dm
from bevgen_tpu.data.argoverse import ArgoverseDataset

ds = ArgoverseDataset(split="val", dataset_dir=str(root),
                      specific_cameras=list(CAMS), cam_res=(256, 256))
assert len(ds) == SWEEPS, len(ds)

loader = dm.DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                       num_workers=WORKERS)
# warm one epoch (caches calibration), time the second
for _ in loader:
    pass
t0 = time.perf_counter()
n = 0
for b in loader:
    n += b["image"].shape[0]
dt = time.perf_counter() - t0
sps = n / dt
print(f"{n} scenes ({len(CAMS)} cams each) in {dt:.2f}s = "
      f"{sps:.2f} scenes/sec with {WORKERS} workers")
print(f"TPU demand at serving optimum ~1.43 scenes/sec -> "
      f"{sps / 1.43:.1f}x headroom")
shutil.rmtree(root, ignore_errors=True)
