"""Paired image-quality metrics: PSNR, SSIM, LPIPS.

Reference: scripts/metrics_eval.py:115-132 (torchmetrics LPIPS / SSIM /
PSNR over generated-vs-GT pairs). PSNR/SSIM are exact re-implementations
(numpy); LPIPS uses bevgen_tpu.models.lpips when its converted weights
are available.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

try:
    from scipy.ndimage import gaussian_filter  # noqa: F401 (probe)
except Exception:  # pragma: no cover
    gaussian_filter = None


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Peak signal-to-noise ratio over [0, data_range] images."""
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0,
         win_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> float:
    """Mean structural similarity, per channel, GAUSSIAN window (size
    11, sigma 1.5) over the valid interior — torchmetrics
    StructuralSimilarityIndexMeasure defaults (gaussian_kernel=True),
    the metric the reference evaluates with (metrics_eval.py:115-132)."""
    from scipy.ndimage import gaussian_filter
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    r = win_size // 2
    # truncate so the kernel support is exactly win_size taps
    filt = lambda x: gaussian_filter(x, sigma, truncate=r / sigma)
    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c], b[..., c]
        mu_x = filt(x)
        mu_y = filt(y)
        xx = filt(x * x) - mu_x ** 2
        yy = filt(y * y) - mu_y ** 2
        xy = filt(x * y) - mu_x * mu_y
        num = (2 * mu_x * mu_y + c1) * (2 * xy + c2)
        den = (mu_x ** 2 + mu_y ** 2 + c1) * (xx + yy + c2)
        vals.append((num / den)[r:-r, r:-r].mean())
    return float(np.mean(vals))


class LPIPSMetric:
    """Batched LPIPS using our flax VGG16 head; requires converted
    weights (models/lpips.py) — `available` is False otherwise."""

    def __init__(self, weights_npz: Optional[str] = None):
        from bevgen_tpu.models.lpips import LPIPS, load_lpips_params
        self.params = (load_lpips_params(weights_npz)
                       if weights_npz else None)
        self.model = LPIPS() if self.params is not None else None

    @property
    def available(self) -> bool:
        return self.params is not None

    def __call__(self, a01: np.ndarray, b01: np.ndarray) -> np.ndarray:
        """a01, b01: (b, h, w, 3) in [0, 1]. Returns (b,) distances."""
        import jax.numpy as jnp
        assert self.available
        x = jnp.asarray(a01) * 2.0 - 1.0
        y = jnp.asarray(b01) * 2.0 - 1.0
        return np.asarray(self.model.apply(self.params, x, y))
