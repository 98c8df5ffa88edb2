"""Regional prompting ("local prompts") shared by the SD/SDXL/SD3/HunyuanDiT
pipelines.

Reference mechanism (diffsynth/pipelines/base.py:51-76): each local prompt gets
its own full denoiser pass; the global positive prediction is then blended with
the local predictions through per-pixel weights derived from the user masks —
resize to latent geometry, threshold (>0.5 in [0,1] terms), Gaussian-blur
(kernel 33, sigma 10), scale:

    merged = (pred_global + sum_i pred_i * w_i) / (1 + sum_i w_i)

TPU-first: the masks are static across denoise steps, so the blur runs ONCE on
host (numpy) and the per-step blend is a weighted sum fused into the jitted CFG
step; the local passes ride the same merged batch as the CFG pair — one XLA
call of batch (2 + L) per step instead of the reference's 2 + L sequential
model invocations.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def _gaussian_kernel1d(kernel_size: int, sigma: float) -> np.ndarray:
    half = (kernel_size - 1) / 2
    x = np.arange(kernel_size, dtype=np.float64) - half
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur_reflect(img: np.ndarray, kernel_size: int, sigma: float) -> np.ndarray:
    """Separable Gaussian blur with reflect padding, matching torchvision
    GaussianBlur semantics (base.py:53 GaussianBlur(33, 10))."""
    if kernel_size <= 1:
        return img
    pad = kernel_size // 2
    if pad >= min(img.shape):
        raise ValueError(
            f"blur kernel {kernel_size} too large for mask geometry "
            f"{img.shape}; pass a smaller blur_kernel_size")
    k = _gaussian_kernel1d(kernel_size, sigma)
    out = np.pad(img, ((pad, pad), (0, 0)), mode="reflect")
    out = np.stack([np.convolve(out[:, j], k, mode="valid")
                    for j in range(out.shape[1])], axis=1)
    out = np.pad(out, ((0, 0), (pad, pad)), mode="reflect")
    out = np.stack([np.convolve(out[i, :], k, mode="valid")
                    for i in range(out.shape[0])], axis=0)
    return out.astype(np.float32)


def local_prompt_weights(masks: Sequence[np.ndarray],
                         mask_scales: Sequence[float],
                         height: int, width: int,
                         blur_kernel_size: int = 33,
                         blur_sigma: float = 10.0) -> np.ndarray:
    """masks: list of (H, W) or (H, W, C) float arrays in [0, 1] ->
    (L, height, width, 1) float32 blend weights (already x scale), the
    reference's blur(mask > 0) * scale (base.py:57-62)."""
    import jax

    ws = []
    for mask, scale in zip(masks, mask_scales):
        m = np.asarray(mask, np.float32)
        if m.ndim == 3:
            m = m.mean(axis=-1)
        m = np.asarray(jax.image.resize(m, (height, width), "bilinear"))
        m = (m > 0.5).astype(np.float32)
        m = _blur_reflect(m, blur_kernel_size, blur_sigma)
        ws.append(m * float(scale))
    return np.stack(ws, axis=0)[..., None]


def blend_local_predictions(pred_global, pred_locals, weights):
    """Jit-safe blend: (1, h, w, C) global + (L, h, w, C) locals +
    (L, h, w, 1) weights -> (1, h, w, C) (base.py merge_latents :51-63)."""
    num = pred_global + (pred_locals * weights).sum(axis=0, keepdims=True)
    den = 1.0 + weights.sum(axis=0, keepdims=True)
    return num / den
