"""Tests for image utils, viz, output writer, metrics, preprocess."""
import json

import numpy as np
import pytest

from bevgen_tpu.metrics import consistency, fid, quality
from bevgen_tpu.utils.image import Im, make_grid
from bevgen_tpu.utils.outputs import GenerationWriter
from bevgen_tpu.utils.viz import viz_bev


def test_im_roundtrip_and_ops():
    a = np.random.default_rng(0).uniform(size=(8, 8, 3)).astype(np.float32)
    im = Im(a)
    assert im.uint8.dtype == np.uint8
    assert im.pil.size == (8, 8)
    chw = Im(a.transpose(2, 0, 1))
    np.testing.assert_array_equal(chw.np, a)
    bordered = im.add_border(1, (255, 0, 0))
    np.testing.assert_array_equal(bordered.np[0, 0], [255, 0, 0])
    assert im.resize(4, 4).np.shape == (4, 4, 3)


def test_make_grid():
    imgs = [np.full((4, 4, 3), i * 50, np.uint8) for i in range(3)]
    g = make_grid(imgs, nrow=2, pad=1)
    assert g.shape == (9, 9, 3)
    assert g[0, 0, 0] == 0 and g[0, 5, 0] == 50


def test_viz_bev_colors():
    bev = np.zeros((16, 16, 7), np.float32)
    bev[2:6, 2:6, 0] = 1.0   # vehicle
    bev[:, :, 4] = 1.0       # drivable everywhere
    img = viz_bev(bev).np
    assert img.shape == (16, 16, 3)
    # vehicle cells orange (255,158,0); elsewhere drivable grey
    np.testing.assert_array_equal(img[3, 3], [255, 158, 0])
    np.testing.assert_array_equal(img[10, 10], [110, 110, 110])


def test_generation_writer_tree(tmp_path):
    rng = np.random.default_rng(0)
    b, cam = 2, 3
    gen = rng.standard_normal((b, cam, 16, 16, 3)).astype(np.float32)
    gt = rng.standard_normal((b, cam, 16, 16, 3)).astype(np.float32)
    batch = {
        "segmentation": rng.uniform(size=(b, 32, 32, 7)).astype(np.float32),
        "cam_name": [["ring_front_left"] * b, ["ring_front_center"] * b,
                     ["ring_front_right"] * b],
        "sample_token": ["tok_a", "tok_b"],
    }
    w = GenerationWriter(tmp_path)
    w.write_batch(gen, batch, gt_images=gt)
    for tok in ("tok_a", "tok_b"):
        for cam_name in ("ring_front_left", "ring_front_center",
                         "ring_front_right"):
            assert (tmp_path / "sample" / tok / f"{cam_name}.jpg").exists()
            assert (tmp_path / "sample_gt" / tok / f"{cam_name}.jpg").exists()
        assert (tmp_path / "sample" / tok / "bev.npz").exists()
        assert (tmp_path / "sample" / tok / "bev.png").exists()
        assert (tmp_path / "viz" / f"{tok}.png").exists()


def test_psnr_ssim_basic():
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(64, 64, 3))
    assert quality.psnr(a, a) == float("inf")
    assert quality.ssim(a, a) == pytest.approx(1.0, abs=1e-6)
    noisy = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1)
    p = quality.psnr(a, noisy)
    assert 15 < p < 30
    s = quality.ssim(a, noisy)
    assert 0.1 < s < 0.99


def test_fid_statistics():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (500, 8))
    b = rng.normal(0, 1, (500, 8))
    c = rng.normal(2, 1, (500, 8))
    near = fid.fid_from_features(a, b)
    far = fid.fid_from_features(a, c)
    assert near < 0.5
    assert far > 10
    # identical distributions -> ~0
    assert fid.fid_from_features(a, a) == pytest.approx(0.0, abs=1e-6)


def test_frechet_matches_scipy_on_hard_covariances():
    """The scipy-free eigh-based sqrtm-product must agree with
    scipy.linalg.sqrtm on the cases where eigh shortcuts classically go
    wrong: rank-deficient (near-singular) and severely ill-conditioned
    covariance pairs (eigenvalues spanning ~16 decades)."""
    import scipy.linalg
    rng = np.random.default_rng(42)
    d = 32

    def rand_cov(eigvals):
        q, _ = np.linalg.qr(rng.normal(size=(d, d)))
        return (q * eigvals) @ q.T

    cases = [
        # rank-deficient: half the spectrum exactly zero
        (rand_cov(np.r_[np.zeros(d // 2), np.linspace(0.5, 2.0, d // 2)]),
         rand_cov(np.linspace(0.1, 1.0, d))),
        # ill-conditioned: 1e-12 .. 1e4
        (rand_cov(np.logspace(-12, 4, d)),
         rand_cov(np.logspace(-10, 2, d))),
        # both near-singular
        (rand_cov(np.r_[np.full(d - 2, 1e-14), [1.0, 2.0]]),
         rand_cov(np.r_[np.full(d - 2, 1e-13), [0.5, 3.0]])),
    ]
    for c1, c2 in cases:
        mu1 = rng.normal(size=d)
        mu2 = rng.normal(size=d)
        ours = fid.frechet_distance(mu1, c1, mu2, c2)
        covmean, _ = scipy.linalg.sqrtm(c1 @ c2, disp=False)
        covmean = np.real(covmean)
        ref = (np.sum((mu1 - mu2) ** 2) + np.trace(c1) + np.trace(c2)
               - 2.0 * np.trace(covmean))
        assert ours == pytest.approx(ref, rel=1e-6, abs=1e-8)


def test_fid_between_dirs(tmp_path):
    import cv2
    rng = np.random.default_rng(0)
    for name, shift in (("a", 0), ("b", 100)):
        d = tmp_path / name / "sample" / "tok"
        d.mkdir(parents=True)
        for i in range(4):
            img = np.clip(rng.uniform(0, 155, (32, 32, 3)) + shift,
                          0, 255).astype(np.uint8)
            cv2.imwrite(str(d / f"c{i}.jpg"), img)
    same = fid.fid_between_dirs(tmp_path / "a", tmp_path / "a")
    diff = fid.fid_between_dirs(tmp_path / "a", tmp_path / "b")
    assert same == pytest.approx(0.0, abs=1e-6)
    assert diff > same


def test_consistency_metric_self_agreement():
    rng = np.random.default_rng(0)
    # textured image: shifted crops of the same panorama agree at edges
    pano = rng.uniform(size=(128, 400, 3)).astype(np.float32)
    import cv2
    pano = cv2.GaussianBlur((pano * 255).astype(np.uint8), (5, 5), 0) / 255.0
    left = pano[:, :160]
    right = pano[:, 110:270]   # 50px overlap
    imgs = {"ring_front_left": left, "ring_front_center": right,
            "ring_front_right": pano[:, 240:400]}
    out = consistency.scene_consistency(imgs)
    assert out["num_matches"] >= 0  # runs; matches depend on texture
    ratio = consistency.consistency_ratio(imgs, imgs)
    if ratio["gt_confidence"] > 0:
        assert ratio["ratio"] == pytest.approx(1.0, abs=1e-6)


def test_preprocess_synthetic_log(tmp_path):
    """Full devkit-free preprocess over a synthetic AV2-format log."""
    import pandas as pd
    from bevgen_tpu.scripts import preprocess

    log = tmp_path / "val" / "LOG1"
    (log / "sensors" / "lidar").mkdir(parents=True)
    (log / "map").mkdir(parents=True)
    ts = 1000
    (log / "sensors" / "lidar" / f"{ts}.feather").touch()
    pd.DataFrame([{"timestamp_ns": ts, "qw": 1.0, "qx": 0, "qy": 0,
                   "qz": 0, "tx_m": 100.0, "ty_m": 200.0, "tz_m": 0.0}]
                 ).to_feather(log / "city_SE3_egovehicle.feather")
    # AV2 annotations are EGO-frame: vehicle 10m ahead of the ego
    pd.DataFrame([{"timestamp_ns": ts, "category": "REGULAR_VEHICLE",
                   "length_m": 4.0, "width_m": 2.0, "height_m": 1.6,
                   "qw": 1.0, "qx": 0, "qy": 0, "qz": 0,
                   "tx_m": 10.0, "ty_m": 0.0, "tz_m": 0.0}]
                 ).to_feather(log / "annotations.feather")
    amap = {
        "drivable_areas": {"1": {"area_boundary": [
            {"x": 80, "y": 180, "z": 0}, {"x": 80, "y": 220, "z": 0},
            {"x": 120, "y": 220, "z": 0}, {"x": 120, "y": 180, "z": 0}]}},
        "lane_segments": {"2": {
            "left_lane_boundary": [{"x": 90, "y": 195, "z": 0},
                                   {"x": 115, "y": 195, "z": 0}],
            "right_lane_boundary": [{"x": 90, "y": 205, "z": 0},
                                    {"x": 115, "y": 205, "z": 0}],
            "is_intersection": True}},
        "pedestrian_crossings": {},
    }
    with open(log / "map" / "log_map_archive_LOG1.json", "w") as f:
        json.dump(amap, f)

    save = tmp_path / "bev_out"
    n = preprocess.process_log(log, save, "val")
    assert n == 1
    from bevgen_tpu.data.rasterize import load_bev_raster
    layers = load_bev_raster(save / "val" / "LOG1" / f"{ts}.npz")
    assert layers.shape == (256, 256, 7)
    assert layers[..., 0].sum() > 0      # vehicle drawn
    assert layers[..., 4].sum() > 1000   # drivable area
    assert layers[..., 5].sum() > 0      # lane lines
    assert layers[..., 6].sum() > 0      # stopline
    # vehicle ahead of ego -> top half after flipud
    assert np.nonzero(layers[..., 0])[0].max() < 128


def test_generation_writer_background(tmp_path):
    """background=True queues IO to a writer thread; flush() completes
    the tree identically to the synchronous path."""
    import numpy as np
    from bevgen_tpu.utils.outputs import GenerationWriter

    rng = np.random.default_rng(0)
    gen = rng.uniform(0, 1, (2, 3, 16, 16, 3)).astype(np.float32)
    batch = {
        "sample_token": ["tok_a", "tok_b"],
        "cam_name": [["c0", "c0"], ["c1", "c1"], ["c2", "c2"]],
        "segmentation": rng.uniform(0, 1, (2, 8, 8, 7)).astype(np.float32),
    }
    w = GenerationWriter(str(tmp_path), denormalize=False, save_viz=False,
                         background=True)
    assert w.write_batch(gen, batch) == []   # queued, not yet written
    w.flush()
    for tok in ("tok_a", "tok_b"):
        assert (tmp_path / "sample" / tok / "c0.jpg").exists()
        assert (tmp_path / "sample" / tok / "bev.npz").exists()
    # errors surface on flush
    bad = dict(batch)
    bad.pop("segmentation")
    w.write_batch(gen, bad)
    import pytest
    with pytest.raises(KeyError):
        w.flush()


def test_ssim_matches_torchmetrics_kernel():
    """Our gaussian-window SSIM vs a direct implementation of the
    torchmetrics defaults (11-tap gaussian, sigma 1.5, valid interior)
    built independently with explicit separable convolution."""
    from bevgen_tpu.metrics import quality

    rng = np.random.default_rng(0)
    a = rng.uniform(size=(40, 56, 3)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1)

    # explicit torchmetrics-style kernel
    r = 5
    xs = np.arange(-r, r + 1, dtype=np.float64)
    g = np.exp(-(xs ** 2) / (2 * 1.5 ** 2))
    g /= g.sum()

    def filt(x):
        x = np.apply_along_axis(
            lambda v: np.convolve(v, g, mode="same"), 0, x)
        return np.apply_along_axis(
            lambda v: np.convolve(v, g, mode="same"), 1, x)

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    vals = []
    for c in range(3):
        x, y = a[..., c], b[..., c]
        mx, my = filt(x), filt(y)
        xx = filt(x * x) - mx ** 2
        yy = filt(y * y) - my ** 2
        xy = filt(x * y) - mx * my
        m = ((2 * mx * my + c1) * (2 * xy + c2) /
             ((mx ** 2 + my ** 2 + c1) * (xx + yy + c2)))
        vals.append(m[r:-r, r:-r].mean())
    expect = float(np.mean(vals))
    np.testing.assert_allclose(quality.ssim(a, b), expect, atol=1e-6)


def test_metrics_eval_nuscenes_tree_parsing(tmp_path, capsys):
    """Underscored camera names (CAM_FRONT_LEFT / ring_front_center)
    must parse into (token, cam) correctly so scenes group by token and
    the consistency pair table matches the rig."""
    import cv2
    from bevgen_tpu.scripts import metrics_eval

    rng = np.random.default_rng(1)
    for tree in ("gen", "gt"):
        d = tmp_path / tree
        d.mkdir()
        for tok in ("tokA", "tokB"):
            for cam in ("CAM_FRONT", "CAM_FRONT_LEFT", "CAM_FRONT_RIGHT"):
                img = rng.integers(0, 255, (32, 32, 3), np.uint8)
                cv2.imwrite(str(d / f"{tok}_{cam}.jpg"), img)

    gen, gt, scenes = metrics_eval.load_pairs(tmp_path)
    assert len(gen) == 6 and len(scenes) == 2
    for cams_g, cams_t in scenes:
        assert set(cams_g) == {"CAM_FRONT", "CAM_FRONT_LEFT",
                               "CAM_FRONT_RIGHT"}

    metrics_eval.main([f"dir={tmp_path}", "consistency=true"])
    import json as _json
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "psnr" in out and "ssim" in out


def test_metrics_eval_sha1_mismatch_fails(tmp_path, capsys):
    """sha1-verified pairing (reference metrics_eval.py:52-74): a
    partially-written tree must fail strict mode loudly and only
    intersect under strict=false."""
    import cv2
    import pytest
    from bevgen_tpu.scripts import metrics_eval

    rng = np.random.default_rng(2)
    for tree in ("gen", "gt"):
        d = tmp_path / tree
        d.mkdir()
        for tok in ("tokA", "tokB"):
            cv2.imwrite(str(d / f"{tok}_CAM_FRONT.jpg"),
                        rng.integers(0, 255, (32, 32, 3), np.uint8))
    # equal trees: verification passes and prints the hash
    h = metrics_eval.verify_tree_hashes(tmp_path, ["gen", "gt"])
    assert h and "hash" in capsys.readouterr().out
    # corrupt: one extra file in gen only
    cv2.imwrite(str(tmp_path / "gen" / "tokC_CAM_FRONT.jpg"),
                rng.integers(0, 255, (32, 32, 3), np.uint8))
    with pytest.raises(SystemExit):
        metrics_eval.load_pairs(tmp_path)
    # strict=false warns and pairs the intersection
    gen, gt, _ = metrics_eval.load_pairs(tmp_path, strict=False)
    assert len(gen) == len(gt) == 2
    assert "WARNING" in capsys.readouterr().out


def test_writer_flush_settles_all_futures_and_clears_queue(tmp_path):
    """A failed background write must not leave stale futures behind:
    flush() awaits everything, raises the FIRST error once, and later
    flushes are clean (utils/outputs.py)."""
    from concurrent.futures import ThreadPoolExecutor

    from bevgen_tpu.utils.outputs import GenerationWriter

    w = GenerationWriter(str(tmp_path), background=True)
    done = []

    def boom():
        raise RuntimeError("disk full")

    def ok(i):
        done.append(i)

    # inject futures directly (the queue mechanics are what's under test)
    w._pending = [w._executor.submit(boom), w._executor.submit(ok, 1),
                  w._executor.submit(ok, 2)]
    import pytest
    with pytest.raises(RuntimeError, match="disk full"):
        w.flush()
    # every future settled, queue cleared, next flush is a no-op
    assert sorted(done) == [1, 2]
    assert w._pending == []
    w.flush()
