"""PSNR/SSIM sanity."""

import numpy as np

from goal_force_tpu.utils.metrics import compare_videos, psnr, ssim


def test_psnr_identity_and_noise():
    a = np.random.default_rng(0).uniform(size=(16, 24, 3)).astype(np.float32)
    assert psnr(a, a) == float("inf")
    noisy = np.clip(a + 0.1, 0, 1)
    p = psnr(a, noisy)
    assert 15 < p < 25  # ~0.1 offset -> ~20 dB


def test_ssim_bounds():
    a = np.random.default_rng(1).uniform(size=(32, 32, 3)).astype(np.float32)
    assert ssim(a, a) > 0.999
    b = 1 - a
    assert ssim(a, b) < 0.3


def test_compare_videos_report():
    rng = np.random.default_rng(2)
    ours = rng.uniform(size=(3, 32, 32, 3)).astype(np.float32)
    rep = compare_videos(ours, np.clip(ours + 0.02, 0, 1))
    assert len(rep["per_frame"]) == 3
    assert rep["psnr_mean"] > 30
    assert 0 < rep["ssim_mean"] <= 1
