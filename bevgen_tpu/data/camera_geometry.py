"""Camera-intrinsics bookkeeping for crops/resizes + image ops.

Pure-numpy equivalents of the reference's `NusceneCamGeometry`
(nuscenes_helper.py:66-135), the per-camera square-crop rules
(argoverse.py:275-283) and the Argoverse normalization
(argoverse.py:158-161, util.py denormalize_tensor).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

ARGOVERSE_MEAN = np.array([0.4265, 0.4489, 0.4769], np.float32)
ARGOVERSE_STD = np.array([0.2053, 0.2206, 0.2578], np.float32)


class CamIntrinsicAdjust:
    """Track how crop+rescale augmentation changes K
    (NusceneCamGeometry, nuscenes_helper.py:66). `rescale_first` selects
    whether the crop offset is applied before or after scaling — the
    Argoverse loader uses crop-first (argoverse.py:186)."""

    def __init__(self, rescale_first: bool = True):
        self.x_scale = 0.0
        self.y_scale = 0.0
        self.top_crop = 0.0
        self.left_crop = 0.0
        self.rescale_first = rescale_first

    def set_scale(self, x_scale: float, y_scale: float):
        self.x_scale = x_scale
        self.y_scale = y_scale

    def set_crop(self, top: float, left: float):
        self.top_crop = top
        self.left_crop = left

    def apply(self, K: np.ndarray) -> np.ndarray:
        K = np.array(K, np.float64, copy=True)
        if self.rescale_first:
            K[0, 0] *= self.x_scale
            K[0, 2] *= self.x_scale
            K[1, 1] *= self.y_scale
            K[1, 2] *= self.y_scale
            K[1, 2] -= self.top_crop
            K[0, 2] -= self.left_crop
        else:
            K[1, 2] -= self.top_crop
            K[0, 2] -= self.left_crop
            K[0, 0] *= self.x_scale
            K[0, 2] *= self.x_scale
            K[1, 1] *= self.y_scale
            K[1, 2] *= self.y_scale
        return K.astype(np.float32)


def square_crop(img: np.ndarray, cam_name: str) -> np.ndarray:
    """Per-camera square-crop rules (argoverse.py:275-283). `img` is
    (h, w, 3); for ring_front_center the raw image arrives transposed
    (w, h, 3) and is un-transposed then cropped from the top.

    The front-left/right crops keep the half adjacent to the center
    camera (maximizing overlap). The reference raises for every other
    camera (argoverse.py:283 `raise Exception()` — its shipped config
    uses only the 3 front cams); the side/rear ring cameras of the
    7-cam rig get a CENTER crop here, the neutral extension."""
    h, w = img.shape[:2]
    if cam_name == "ring_front_left":
        return img[:, w - h:]
    if cam_name == "ring_front_right":
        return img[:, : -(w - h)]
    if cam_name == "ring_front_center":
        img = img.transpose(1, 0, 2)
        return img[(img.shape[0] - img.shape[1]):]
    if w > h:
        left = (w - h) // 2
        return img[:, left:left + h]
    if h > w:
        top = (h - w) // 2
        return img[top:top + w]
    return img


def square_crop_offsets(cam_name: str, h: int, w: int) -> Tuple[int, int]:
    """(top, left) pixel offsets the square crop introduces, for
    intrinsics adjustment. (h, w) is the RAW stored image shape."""
    if cam_name == "ring_front_left":
        return 0, w - h
    if cam_name == "ring_front_right":
        return 0, 0
    if cam_name == "ring_front_center":
        # transposed: original (h, w) swaps; crop from top
        return w - h, 0
    if w > h:
        return 0, (w - h) // 2
    if h > w:
        return (h - w) // 2, 0
    return 0, 0


def resize_bicubic(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    import cv2
    return cv2.resize(img, (out_hw[1], out_hw[0]),
                      interpolation=cv2.INTER_CUBIC)


def normalize_image(img01: np.ndarray) -> np.ndarray:
    """[0,1] float image -> normalized (argoverse.py:158-161)."""
    return ((img01 - ARGOVERSE_MEAN) / ARGOVERSE_STD).astype(np.float32)


def denormalize_image(img: np.ndarray) -> np.ndarray:
    """Inverse of normalize_image, clipped to [0,1]
    (util.py denormalize_tensor)."""
    out = img * ARGOVERSE_STD + ARGOVERSE_MEAN
    return np.clip(out, 0.0, 1.0).astype(np.float32)
