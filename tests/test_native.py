"""Native C++ rasterizer: build, parity with cv2, integration."""
import numpy as np
import pytest

from bevgen_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason=f"native build failed: "
                                       f"{native.build_error()}")


def _iou(a, b):
    a, b = a > 0, b > 0
    inter = (a & b).sum()
    union = (a | b).sum()
    return inter / max(union, 1)


def test_fill_polygons_parity_with_cv2():
    import cv2
    rng = np.random.default_rng(0)
    for trial in range(5):
        n = rng.integers(3, 8)
        center = rng.uniform(40, 216, 2)
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(10, 60, n)
        poly = np.stack([center[0] + r * np.cos(ang),
                         center[1] + r * np.sin(ang)], 1).astype(np.int32)
        ours = native.fill_polygons([poly], (256, 256))
        ref = np.zeros((256, 256), np.uint8)
        cv2.fillPoly(ref, [poly], 1)
        assert _iou(ours, ref) > 0.97, f"trial {trial}"


def test_draw_polylines_parity_with_cv2():
    import cv2
    line = np.array([[10, 10], [200, 50], [100, 240]], np.int32)
    ours = native.draw_polylines([line], (256, 256))
    ref = np.zeros((256, 256), np.uint8)
    cv2.polylines(ref, [line], False, 1, 1)
    # Bresenham vs cv2 LINE_8: near-identical pixels
    assert _iou(ours, ref) > 0.85
    assert abs(int(ours.sum()) - int(ref.sum())) < 30


def test_rasterize_scene_native_route(monkeypatch):
    from bevgen_tpu.data import rasterize
    monkeypatch.setenv("BEVGEN_NATIVE_RASTER", "1")
    quad = np.array([[8, -1, 0], [8, 1, 0], [12, 1, 0], [12, -1, 0]], float)
    layers = rasterize.rasterize_scene(
        drivable_polygons_ego=[np.array(
            [[-20, -20, 0], [-20, 20, 0], [20, 20, 0], [20, -20, 0]],
            float)],
        cuboid_footprints_ego=[("REGULAR_VEHICLE", quad)],
        lane_boundaries_ego=[np.array([[0, -5, 0], [20, -5, 0]])],
        stoplines_ego=[], ped_crossing_polygons_ego=[])
    assert layers[..., 0].sum() > 0
    assert layers[..., 4].sum() > 1000
    assert layers[..., 5].sum() > 0
    # parity with the cv2 route on the same scene
    monkeypatch.setenv("BEVGEN_NATIVE_RASTER", "0")
    ref = rasterize.rasterize_scene(
        drivable_polygons_ego=[np.array(
            [[-20, -20, 0], [-20, 20, 0], [20, 20, 0], [20, -20, 0]],
            float)],
        cuboid_footprints_ego=[("REGULAR_VEHICLE", quad)],
        lane_boundaries_ego=[np.array([[0, -5, 0], [20, -5, 0]])],
        stoplines_ego=[], ped_crossing_polygons_ego=[])
    for c in range(7):
        assert _iou(layers[..., c], ref[..., c]) > 0.95 or \
            ref[..., c].sum() == 0


def test_native_city_scale_geometry_is_bounded_and_correct():
    """City-scale (unculled) geometry must not stall the native path.

    preprocess.py passes whole-city lane boundaries/drivable areas in
    ego pixels (coords up to ~+-30000); every fully-off-raster segment
    is rejected exactly (Bresenham pixels never leave the endpoint
    bbox) and far-reaching visible segments are Liang-Barsky clipped.
    """
    import time

    from bevgen_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(0)
    # 5000 segments kilometres away + one crossing the window
    far = rng.integers(5_000, 30_000, (5000, 2, 2)).astype(np.int32)
    crossing = np.array([[-20_000, 128], [20_000, 128]], np.int32)
    lines = [s for s in far] + [crossing]
    t0 = time.perf_counter()
    img = native.draw_polylines(lines, (256, 256))
    dt = time.perf_counter() - t0
    assert dt < 1.0, f"native polylines took {dt:.2f}s on culled-free input"
    # only the crossing line lands in-raster: exactly row 128
    assert img.sum() == 256
    assert img[128].sum() == 256

    # off-raster polygons write nothing and cost ~nothing
    polys = [s.reshape(-1, 2) for s in
             rng.integers(5_000, 30_000, (2000, 3, 2)).astype(np.int32)]
    t0 = time.perf_counter()
    pimg = native.fill_polygons(polys, (256, 256))
    assert time.perf_counter() - t0 < 1.0
    assert pimg.sum() == 0

    # a clipped long segment matches cv2's clipped drawing on-raster
    import cv2
    ref = np.zeros((256, 256), np.uint8)
    cv2.polylines(ref, [crossing], isClosed=False, color=1, thickness=1)
    ours = native.draw_polylines([crossing], (256, 256))
    assert (ours == ref).mean() > 0.999
