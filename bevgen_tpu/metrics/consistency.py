"""Cross-camera overlap consistency metric.

Reference: scripts/metrics_consistency_sift.py:111-181 and
metrics_consistency_sift_argo.py:87 — match features in the 50-px
adjacent-edge windows of neighboring cameras and compare summed match
confidence between GT and generated imagery (+ MAGSAC fundamental-
matrix inlier counting in the argo variant).

The reference uses kornia LoFTR. Two matchers are available here:

  * LoFTR (metrics/loftr.py — flax port of the same architecture):
    engaged automatically when converted weights exist, making the
    numbers comparable to the paper's tables. Point
    ``BEVGEN_LOFTR_WEIGHTS`` at the npz produced by
    ``loftr.convert_loftr_weights`` (zero egress in this image — the
    converter + self-check are gated-but-runnable).
  * SIFT + Lowe ratio test + USAC_MAGSAC: the weight-less classical
    fallback measuring the same quantity — whether adjacent cameras
    agree in their overlap region.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

EDGE_PX = 50  # overlap window width (metrics_consistency_sift.py)

# adjacent (left_cam, right_cam) pairs: right edge of A overlaps left
# edge of B
ARGOVERSE_PAIRS = (
    ("ring_front_left", "ring_front_center"),
    ("ring_front_center", "ring_front_right"),
)
NUSCENES_PAIRS = (
    ("CAM_FRONT_LEFT", "CAM_FRONT"),
    ("CAM_FRONT", "CAM_FRONT_RIGHT"),
)


def _to_gray_u8(img01: np.ndarray) -> np.ndarray:
    import cv2
    u8 = (np.clip(img01, 0, 1) * 255).astype(np.uint8)
    return cv2.cvtColor(u8, cv2.COLOR_RGB2GRAY)


def edge_windows(left_img: np.ndarray, right_img: np.ndarray,
                 edge_px: int = EDGE_PX) -> Tuple[np.ndarray, np.ndarray]:
    """(right strip of the left camera, left strip of the right camera)."""
    return left_img[:, -edge_px:], right_img[:, :edge_px]


_LOFTR_MATCHER = None


def get_matcher() -> Optional[Callable]:
    """The LoFTR matcher when weights are available, else None (SIFT).

    Weights come from ``BEVGEN_LOFTR_WEIGHTS`` (npz path). Cached —
    the backbone+transformer jit is paid once per strip shape."""
    global _LOFTR_MATCHER
    if _LOFTR_MATCHER is not None:
        return _LOFTR_MATCHER or None
    path = os.environ.get("BEVGEN_LOFTR_WEIGHTS", "")
    if path and os.path.exists(path):
        from bevgen_tpu.metrics.loftr import LoFTRMatcher
        _LOFTR_MATCHER = LoFTRMatcher.from_npz(path)
        return _LOFTR_MATCHER
    _LOFTR_MATCHER = False  # resolved: no weights
    return None


def match_strips_loftr(a01: np.ndarray, b01: np.ndarray,
                       matcher: Callable) -> Dict[str, float]:
    """LoFTR matches between two overlap strips — the reference's
    protocol verbatim (metrics_consistency_sift.py:151-168): run the
    matcher on the grayscale windows, report match count and summed
    dual-softmax confidence; inliers via the same MAGSAC fundamental-
    matrix check the argo variant applies."""
    import cv2
    ga = _to_gray_u8(a01).astype(np.float32) / 255.0
    gb = _to_gray_u8(b01).astype(np.float32) / 255.0
    out = matcher(ga, gb)
    conf = out["confidence"]
    inliers = 0.0
    if len(conf) >= 8:
        try:
            _, mask = cv2.findFundamentalMat(
                out["keypoints0"], out["keypoints1"], cv2.USAC_MAGSAC,
                1.0, 0.999, 10000)
            inliers = float(mask.sum()) if mask is not None else 0.0
        except Exception:
            inliers = 0.0
    return {"num_matches": float(len(conf)),
            "confidence": float(conf.sum()), "inliers": inliers}


def match_strips(a01: np.ndarray, b01: np.ndarray,
                 ratio: float = 0.75,
                 matcher: Optional[Callable] = None) -> Dict[str, float]:
    """Match two overlap strips: LoFTR when weights are present (see
    get_matcher), else SIFT + Lowe + MAGSAC."""
    matcher = matcher if matcher is not None else get_matcher()
    if matcher is not None:
        return match_strips_loftr(a01, b01, matcher)
    return match_strips_sift(a01, b01, ratio)


def match_strips_sift(a01: np.ndarray, b01: np.ndarray,
                      ratio: float = 0.75) -> Dict[str, float]:
    """SIFT matches + MAGSAC inliers between two overlap strips."""
    import cv2
    ga, gb = _to_gray_u8(a01), _to_gray_u8(b01)
    sift = cv2.SIFT_create()
    ka, da = sift.detectAndCompute(ga, None)
    kb, db = sift.detectAndCompute(gb, None)
    if da is None or db is None or len(ka) < 2 or len(kb) < 2:
        return {"num_matches": 0.0, "confidence": 0.0, "inliers": 0.0}
    bf = cv2.BFMatcher()
    raw = bf.knnMatch(da, db, k=2)
    good = [m for pair in raw if len(pair) == 2
            for m, n in [pair] if m.distance < ratio * n.distance]
    conf = float(sum(1.0 / (1.0 + m.distance) for m in good))
    inliers = 0.0
    if len(good) >= 8:
        pa = np.float32([ka[m.queryIdx].pt for m in good])
        pb = np.float32([kb[m.trainIdx].pt for m in good])
        try:
            _, mask = cv2.findFundamentalMat(pa, pb, cv2.USAC_MAGSAC,
                                             1.0, 0.999, 10000)
            inliers = float(mask.sum()) if mask is not None else 0.0
        except Exception:
            inliers = 0.0
    return {"num_matches": float(len(good)), "confidence": conf,
            "inliers": inliers}


def scene_consistency(images01: Dict[str, np.ndarray],
                      pairs: Sequence[Tuple[str, str]] = ARGOVERSE_PAIRS
                      ) -> Dict[str, float]:
    """Sum the overlap agreement over all adjacent camera pairs of one
    scene. images01: cam_name -> (h, w, 3) in [0,1]."""
    total = {"num_matches": 0.0, "confidence": 0.0, "inliers": 0.0}
    for left, right in pairs:
        if left not in images01 or right not in images01:
            continue
        a, b = edge_windows(images01[left], images01[right])
        m = match_strips(a, b)
        for k in total:
            total[k] += m[k]
    return total


def consistency_ratio(gen: Dict[str, np.ndarray],
                      gt: Dict[str, np.ndarray],
                      pairs: Sequence[Tuple[str, str]] = ARGOVERSE_PAIRS
                      ) -> Dict[str, float]:
    """Generated-vs-GT consistency: the reference reports summed match
    confidence for both and their ratio."""
    g = scene_consistency(gen, pairs)
    t = scene_consistency(gt, pairs)
    return {
        "gen_confidence": g["confidence"],
        "gt_confidence": t["confidence"],
        "ratio": g["confidence"] / t["confidence"] if t["confidence"] else 0.0,
        "gen_inliers": g["inliers"],
        "gt_inliers": t["inliers"],
    }
