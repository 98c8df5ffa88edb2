"""Spatially tiled inference over 2D feature maps.

Behavioral parity with /root/reference/diffsynth/models/tiler.py TileWorker:
overlapping tiles, linear border masks min(x+1, H-x, y+1, W-y)/border clipped
to [0, 1] (:10-17), weighted blend normalized by the mask sum (:52-77). Used
for large-resolution SD/SDXL VAE encode/decode where the full activation
would not fit.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax.numpy as jnp


def tile_mask(height: int, width: int, border_width: int) -> np.ndarray:
    """(H, W) blend mask: 1 in the centre, linear ramp at the borders (:10-17)."""
    x = np.arange(height)[:, None] * np.ones((1, width))
    y = np.ones((height, 1)) * np.arange(width)[None]
    m = np.stack([x + 1, height - x, y + 1, width - y]).min(axis=0)
    return (m / border_width).clip(0, 1).astype(np.float32)


def tiled_forward_2d(forward_fn: Callable, x: jnp.ndarray, tile_size: int,
                     tile_stride: int, scale: int = 1,
                     out_channels: int = None,
                     border_width: int = None) -> jnp.ndarray:
    """Run forward_fn on overlapping (tile_size x tile_size) crops of the NHWC
    map x and blend the outputs (reference tiled_forward :52-77; scale is the
    output/input resolution ratio, e.g. 8 for a VAE decoder, 1/8 encode is
    expressed by calling with scale handled by forward_fn's own geometry).
    """
    b, h, w, c = x.shape
    border_width = (tile_size - tile_stride) * scale if border_width is None \
        else border_width
    probe = None
    tasks = []
    for hi in range(0, h, tile_stride):
        if hi - tile_stride >= 0 and hi - tile_stride + tile_size >= h:
            continue
        for wi in range(0, w, tile_stride):
            if wi - tile_stride >= 0 and wi - tile_stride + tile_size >= w:
                continue
            tasks.append((hi, min(hi + tile_size, h),
                          wi, min(wi + tile_size, w)))

    values = None
    weight = None
    for (h0, h1, w0, w1) in tasks:
        out = forward_fn(x[:, h0:h1, w0:w1])
        if values is None:
            oc = out.shape[-1] if out_channels is None else out_channels
            values = jnp.zeros((b, h * scale, w * scale, oc), out.dtype)
            weight = jnp.zeros((1, h * scale, w * scale, 1), out.dtype)
        th, tw = out.shape[1], out.shape[2]
        m = jnp.asarray(tile_mask(th, tw, max(border_width, 1)))[None, :, :, None]
        values = values.at[:, h0 * scale:h0 * scale + th,
                           w0 * scale:w0 * scale + tw].add(out * m)
        weight = weight.at[:, h0 * scale:h0 * scale + th,
                           w0 * scale:w0 * scale + tw].add(m)
    return values / jnp.maximum(weight, 1e-6)
