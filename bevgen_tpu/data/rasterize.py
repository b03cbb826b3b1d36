"""BEV semantic rasterization — host-side preprocessing core.

Pure-numpy/cv2 re-implementation of the reference's offline BEV raster
generation (scripts/argoverse_preprocess.py:43-232): an 80m x 80m
ego-centered window rendered to 256x256 at 0.3125 m/px with 7 channels

    [VEHICLE, LARGE_VEHICLE, PEDESTRIAN, OTHER,
     drivable, lane_lines, stopline+ped_crossing]

flipped up-down so the ego points "up" (README.md:97-101).

This module is dataset-agnostic: it takes geometry already expressed in
the ego frame (or city frame + a city_SE3_ego pose). The av2-devkit
glue that extracts that geometry lives in bevgen_tpu.data.argoverse and
is import-gated; everything here is unit-testable without av2.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

# raster geometry (argoverse_preprocess.py:83-87)
IMG_RANGE_M = 40.0
RESOLUTION_PX = 256
METERS_PER_PIXEL = (2 * IMG_RANGE_M) / RESOLUTION_PX
EXTENTS = (-IMG_RANGE_M, -IMG_RANGE_M, IMG_RANGE_M, IMG_RANGE_M)

# fixed ego->"BEV cam" rotation (argoverse_preprocess.py:140):
# cam x = ego -y (left becomes right), cam y = ego -z, cam z = ego x.
EGO_R_CAM = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], dtype=np.float64)

# 4-class cuboid category mapping (argoverse_helper.py:20-51)
STANDARD_CATEGORIES = ("VEHICLE", "LARGE_VEHICLE", "PEDESTRIAN", "OTHER")
LARGE_VEHICLE_CATS = frozenset({
    "ARTICULATED_BUS", "BOX_TRUCK", "BUS", "LARGE_VEHICLE",
    "TRAFFIC_LIGHT_TRAILER", "TRUCK", "TRUCK_CAB", "VEHICULAR_TRAILER"})


def standard_category(raw: str) -> str:
    if raw == "REGULAR_VEHICLE":
        return "VEHICLE"
    if raw in LARGE_VEHICLE_CATS:
        return "LARGE_VEHICLE"
    if raw == "PEDESTRIAN":
        return "PEDESTRIAN"
    return "OTHER"


def ego_to_bev_px(points_ego: np.ndarray) -> np.ndarray:
    """Ego-frame 3D points -> integer BEV pixel coords (col-major x/z of
    the BEV cam frame; argoverse_preprocess.py:43-50)."""
    cam = (EGO_R_CAM.T @ np.asarray(points_ego, np.float64).T).T  # cam<-ego
    xy = cam[:, [0, 2]]
    px = (xy - np.array(EXTENTS[:2])) / METERS_PER_PIXEL
    return np.ascontiguousarray(np.round(px)).astype(np.int32)


def city_to_ego(points_city: np.ndarray, city_R_ego: np.ndarray,
                city_t_ego: np.ndarray) -> np.ndarray:
    """Invert a city_SE3_ego pose: p_ego = R^T (p_city - t)."""
    p = np.asarray(points_city, np.float64) - np.asarray(city_t_ego)
    return (np.asarray(city_R_ego).T @ p.T).T


def _use_native() -> bool:
    import os
    if os.environ.get("BEVGEN_NATIVE_RASTER") != "1":
        return False
    from bevgen_tpu import native
    return native.available()


def fill_polygons(polygons: Iterable[np.ndarray],
                  shape: Tuple[int, int] = (RESOLUTION_PX, RESOLUTION_PX)
                  ) -> np.ndarray:
    """Binary mask from int pixel polygons (av2 raster_utils
    get_mask_from_polygons equivalent). Routes through the native C++
    core when BEVGEN_NATIVE_RASTER=1 (bevgen_tpu.native)."""
    polys = [np.asarray(p, np.int32).reshape(-1, 2) for p in polygons]
    polys = [p for p in polys if len(p) >= 3]
    if _use_native():
        from bevgen_tpu import native
        return native.fill_polygons(polys, shape)
    img = np.zeros(shape, dtype=np.uint8)
    if polys and cv2 is not None:
        cv2.fillPoly(img, polys, 1)
    return img


def draw_polylines(polylines: Iterable[np.ndarray],
                   shape: Tuple[int, int] = (RESOLUTION_PX, RESOLUTION_PX),
                   thickness: int = 1) -> np.ndarray:
    """Binary mask of 1-px polylines (av2 draw_visible_polyline_segments
    equivalent)."""
    lines = [np.asarray(l, np.int32).reshape(-1, 2) for l in polylines]
    lines = [l for l in lines if len(l) >= 2]
    if thickness == 1 and _use_native():
        from bevgen_tpu import native
        return native.draw_polylines(lines, shape)
    img = np.zeros(shape, dtype=np.uint8)
    if cv2 is None:
        return img
    for pts in lines:
        cv2.polylines(img, [pts], isClosed=False, color=1,
                      thickness=thickness)
    return img


def rasterize_scene(
    drivable_polygons_ego: Sequence[np.ndarray],
    cuboid_footprints_ego: Sequence[Tuple[str, np.ndarray]],
    lane_boundaries_ego: Sequence[np.ndarray],
    stoplines_ego: Sequence[np.ndarray],
    ped_crossing_polygons_ego: Sequence[np.ndarray],
    resolution: int = RESOLUTION_PX,
) -> np.ndarray:
    """Produce the 7-channel BEV raster (resolution, resolution, 7)
    float32 in the reference channel order, flipped up-down
    (argoverse_preprocess.py:143-208).

    cuboid_footprints_ego: (raw_category_name, (4, 3) footprint quad in
    ego frame) per annotation.
    """
    shape = (resolution, resolution)

    drivable = fill_polygons(
        [ego_to_bev_px(p) for p in drivable_polygons_ego], shape)

    by_cat: Dict[str, List[np.ndarray]] = {c: [] for c in STANDARD_CATEGORIES}
    for raw_cat, quad in cuboid_footprints_ego:
        by_cat[standard_category(raw_cat)].append(ego_to_bev_px(quad))
    cat_imgs = [fill_polygons(by_cat[c], shape) for c in STANDARD_CATEGORIES]

    lanes = draw_polylines([ego_to_bev_px(l) for l in lane_boundaries_ego],
                           shape)
    stop = draw_polylines([ego_to_bev_px(s) for s in stoplines_ego], shape)
    ped = fill_polygons([ego_to_bev_px(p) for p in ped_crossing_polygons_ego],
                        shape)
    stop_ped = np.logical_or(stop, ped).astype(np.uint8)

    layers = np.stack([*cat_imgs, drivable, lanes, stop_ped], axis=-1)
    return np.flipud(layers).astype(np.float32)


def save_bev_raster(path, layers: np.ndarray):
    """npz layout matching the reference (`np.savez_compressed(f, arr)`
    read back via `next(iter(npz.values()))`)."""
    np.savez_compressed(path, layers)


def load_bev_raster(path) -> np.ndarray:
    with np.load(path) as f:
        return next(iter(f.values())).astype(np.float32)
