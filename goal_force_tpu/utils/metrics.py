"""Fidelity metrics: PSNR / SSIM per frame and clip comparison.

The BASELINE north star is per-frame PSNR parity against the reference's CUDA renders;
this module is the measuring stick (the reference's ImageQualityMetric extension covers
learned scorers — CLIP/BLIP based — which are round-2+; PSNR/SSIM cover the parity use).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Peak signal-to-noise ratio in dB; inputs same shape, float."""
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range**2 / mse)


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Global-window SSIM (channel-averaged; 8x8 windowed mean/var via box filter)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    def box(x):
        # 8x8 box filter over (H, W, C)
        k = 8
        c = np.cumsum(np.cumsum(x, axis=0), axis=1)
        c = np.pad(c, ((1, 0), (1, 0), (0, 0)))
        h, w = x.shape[:2]
        hh, ww = h - k + 1, w - k + 1
        return (c[k:k + hh, k:k + ww] - c[:hh, k:k + ww]
                - c[k:k + hh, :ww] + c[:hh, :ww]) / (k * k)

    mu_a, mu_b = box(a), box(b)
    var_a = box(a * a) - mu_a**2
    var_b = box(b * b) - mu_b**2
    cov = box(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return float(np.mean(s))


def compare_videos(ours: np.ndarray, reference: np.ndarray) -> Dict:
    """Per-frame PSNR/SSIM of two (F, H, W, 3) float [0,1] clips + aggregates."""
    assert ours.shape == reference.shape, (ours.shape, reference.shape)
    per_frame = [
        {"frame": i, "psnr": psnr(ours[i], reference[i]), "ssim": ssim(ours[i], reference[i])}
        for i in range(ours.shape[0])
    ]
    psnrs = [f["psnr"] for f in per_frame]
    ssims = [f["ssim"] for f in per_frame]
    return {
        "per_frame": per_frame,
        "psnr_mean": float(np.mean(psnrs)),
        "psnr_min": float(np.min(psnrs)),
        "ssim_mean": float(np.mean(ssims)),
    }
