"""Structural similarity (SSIM) for golden-image comparison.

Used by the render-vs-reference tests that compare our frames against the
reference's published sample renders (``/root/reference/Samples/*.png``,
``README.md:5-7``) — the only ground-truth images the reference ships.
Pure numpy (separable Gaussian window, standard Wang et al. constants);
no scipy/skimage dependency.
"""

from __future__ import annotations

import numpy as np

_C1 = (0.01) ** 2
_C2 = (0.03) ** 2


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return k / k.sum()


def _blur(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 'valid' convolution along the two leading (H, W) axes."""
    pad = len(k) // 2
    out = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 0, img)
    out = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 1, out)
    return out[pad:-pad, pad:-pad]


def ssim(
    a: np.ndarray,
    b: np.ndarray,
    mask: np.ndarray | None = None,
    size: int = 11,
    sigma: float = 1.5,
) -> float:
    """Mean SSIM between two (H, W, C) float images in [0, 1].

    ``mask`` (H, W) bool restricts the mean to windows centered on masked
    pixels — used to compare only the foreground when the reference image
    contains content we cannot reproduce (e.g. an environment backdrop whose
    sIBL set isn't shipped in the asset tree)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    k = _gaussian_kernel(size, sigma)
    pad = size // 2

    mu_a = _blur(a, k)
    mu_b = _blur(b, k)
    mu_a2 = mu_a * mu_a
    mu_b2 = mu_b * mu_b
    mu_ab = mu_a * mu_b
    var_a = _blur(a * a, k) - mu_a2
    var_b = _blur(b * b, k) - mu_b2
    cov = _blur(a * b, k) - mu_ab

    num = (2 * mu_ab + _C1) * (2 * cov + _C2)
    den = (mu_a2 + mu_b2 + _C1) * (var_a + var_b + _C2)
    smap = num / den
    if mask is not None:
        m = np.asarray(mask, bool)[pad:-pad, pad:-pad]
        if smap.ndim == 3:
            m = m[..., None] & np.ones(smap.shape, bool)
        return float(smap[m].mean())
    return float(smap.mean())
