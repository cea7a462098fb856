"""Structural Similarity (SSIM) in JAX.

Replaces torchmetrics' SSIM used by the reconstruction evaluator
(reference ``src/multivae/metrics/reconstruction/reconstruction.py:36``).
Standard Wang et al. formulation: 11x11 gaussian window (sigma 1.5),
K1=0.01, K2=0.03.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(preds, target, data_range: float = 1.0, kernel_size: int = 11,
         sigma: float = 1.5, reduce: bool = True):
    """Mean SSIM over a batch of images.

    Args:
        preds / target: (B, C, H, W) arrays (channels-first, matching the
            dataset conventions used across the framework).
        data_range: dynamic range of the inputs.
        reduce: return the scalar batch mean (default); ``False`` returns
            per-sample SSIM values (B,) — used by the fused subset-sweep
            evaluators to weight out loader-padding rows in-graph.

    Returns:
        scalar mean SSIM, or (B,) per-sample SSIM when ``reduce=False``.
    """
    preds = jnp.asarray(preds, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    if preds.ndim == 3:
        preds = preds[:, None]
        target = target[:, None]

    B, C, H, W = preds.shape
    kernel = jnp.asarray(_gaussian_kernel(kernel_size, sigma))
    kernel = kernel[None, None].repeat(C, axis=0)  # (C, 1, k, k)

    def filt(x):
        return lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=C,
        )

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    mu_x = filt(preds)
    mu_y = filt(target)
    mu_xx = filt(preds * preds)
    mu_yy = filt(target * target)
    mu_xy = filt(preds * target)

    sigma_x = mu_xx - mu_x**2
    sigma_y = mu_yy - mu_y**2
    sigma_xy = mu_xy - mu_x * mu_y

    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    ssim_map = num / den
    if reduce:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))
