"""Spatial tiling for 2D image models (VAEs, UNets, image DiTs).

TPU-native port of the reference's three tilers (diffsynth/models/tiler.py):

- `tiled_forward_2d`     == TileWorker.tiled_forward (tiler.py:82-105): overlapping
  unfold/fold with a border-ramp blend mask. Used by the reference on SD/SDXL/SD3/
  Flux VAE encoders+decoders, the SD UNet, SD3/Flux DiTs, and the SD(XL) ControlNets.
- `tiled_forward_2d_shift` == FastTileWorker.tiled_forward (tiler.py:133-160):
  edge-clamped tile tasks with an is_bound-aware mask; forward_fn sees tile coords.
- `tiled_forward_2d_to_3d` == TileWorker2Dto3D.tiled_forward (tiler.py:192-236):
  spatial tiles over full-temporal 3D tensors with per-axis output scales. Used by
  the reference CogVideoX DiT + VAE.

Layout: all functions take channel-last tensors — (B, H, W, C) for 2D and
(B, T, H, W, C) for 3D — the repo-wide TPU-friendly layout (the reference is NCHW /
NCTHW; the tile/blend math is layout-independent). Per-tile `fn` calls run under the
caller's jit (tiles share a static shape so XLA compiles each tile geometry once);
accumulation stays on device, mirroring models/vae.py::tiled_apply.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _unfold_positions(extent: int, size: int, stride: int) -> list:
    """torch.nn.Unfold tile origins: 0, stride, ... while origin+size <= extent.

    The reference silently leaves a ragged edge uncovered (fold then divides
    0/0 there); we raise instead — callers must pick compatible geometry.
    """
    if size > extent:
        raise ValueError(f"tile size {size} exceeds extent {extent}")
    if (extent - size) % stride != 0:
        raise ValueError(
            f"extent {extent} is not covered by tiles of size {size} at stride "
            f"{stride}: (extent - size) must be a multiple of stride (the "
            "reference TileWorker produces NaNs on this geometry)")
    return list(range(0, extent - size + 1, stride))


def _ramp_mask(h: int, w: int, border_width: int) -> np.ndarray:
    """Reference TileWorker.mask (tiler.py:10-17): min distance to any tile edge,
    scaled by border_width, clipped to (0, 1]."""
    x = np.arange(h)[:, None]
    y = np.arange(w)[None, :]
    m = np.minimum(np.minimum(x + 1, h - x), np.minimum(y + 1, w - y))
    return np.clip(m / max(border_width, 1), 0.0, 1.0).astype(np.float32)


def _bound_mask(h: int, w: int, is_bound, border_width=None) -> np.ndarray:
    """Reference FastTileWorker.build_mask (tiler.py:114-130): ramp that is flat
    (= border_width) on sides flagged as the tensor boundary; clip(1, border)."""
    border_width = (h + w) // 4 if border_width is None else border_width
    x = np.arange(h)[:, None] * np.ones((1, w), np.int64)
    y = np.ones((h, 1), np.int64) * np.arange(w)[None, :]
    pad = np.full((h, w), border_width, np.int64)
    mask = np.stack([
        pad if is_bound[0] else x + 1,
        pad if is_bound[1] else h - x,
        pad if is_bound[2] else y + 1,
        pad if is_bound[3] else w - y,
    ]).min(axis=0)
    mask = np.clip(mask, 1, max(border_width, 1))
    return (mask / max(border_width, 1)).astype(np.float32)


def _clamped_tasks(H: int, W: int, th: int, tw: int, sh: int, sw: int) -> list:
    """Reference FastTileWorker/2Dto3D task list (tiler.py:141-149,211-219):
    origins on the stride grid, final tile shifted back to end at the boundary,
    redundant fully-interior-after-the-edge tiles skipped."""
    tasks = []
    for h in range(0, H, sh):
        for w in range(0, W, sw):
            if ((h - sh >= 0 and h - sh + th >= H)
                    or (w - sw >= 0 and w - sw + tw >= W)):
                continue
            h0, h1 = h, h + th
            w0, w1 = w, w + tw
            if h1 > H:
                h0, h1 = max(H - th, 0), H
            if w1 > W:
                w0, w1 = max(W - tw, 0), W
            tasks.append((h0, h1, w0, w1))
    return tasks


def tiled_forward_2d(fn, x, tile_size: int, tile_stride: int,
                     border_width=None):
    """TileWorker parity: x (B, H, W, C) -> fn applied per overlapping tile,
    blended with the ramp mask through fold normalization.

    fn: (B, th, tw, C) -> (B, th*s, tw*s, C') for a uniform io scale s (the
    reference infers s from the first output, tiler.py:59-63). Returns
    (B, H*s, W*s, C') in float32.
    """
    B, H, W, C = x.shape
    border_width = int(tile_stride * 0.5) if border_width is None else border_width

    hs = _unfold_positions(H, tile_size, tile_stride)
    ws = _unfold_positions(W, tile_size, tile_stride)

    out0 = fn(x[:, hs[0]:hs[0] + tile_size, ws[0]:ws[0] + tile_size, :])
    io_scale = out0.shape[1] / tile_size
    oth = int(tile_size * io_scale)
    oH, oW = int(H * io_scale), int(W * io_scale)
    c_out = out0.shape[-1]

    mask = jnp.asarray(
        _ramp_mask(oth, oth, int(border_width * io_scale))[None, :, :, None])
    values = jnp.zeros((B, oH, oW, c_out), jnp.float32)
    weight = jnp.zeros((1, oH, oW, 1), jnp.float32)
    for i, h0 in enumerate(hs):
        for j, w0 in enumerate(ws):
            out = out0 if (i == 0 and j == 0) else \
                fn(x[:, h0:h0 + tile_size, w0:w0 + tile_size, :])
            out = out.astype(jnp.float32)
            to_h, to_w = int(h0 * io_scale), int(w0 * io_scale)
            values = values.at[:, to_h:to_h + oth, to_w:to_w + oth].add(out * mask)
            weight = weight.at[:, to_h:to_h + oth, to_w:to_w + oth].add(mask)
    return values / weight


def tiled_forward_2d_shift(fn, shape, tile_size: int, tile_stride: int,
                           border_width=None, io_scale: float = 1.0):
    """FastTileWorker parity: edge-clamped tasks, is_bound-aware masks.

    fn(h0, h1, w0, w1) -> (B, (h1-h0)*s, (w1-w0)*s, C') computes the model on
    the given input-space tile (the reference passes coordinates so per-layer
    callers can slice internal states). shape = (B, H, W) in INPUT space.
    """
    B, H, W = shape
    tasks = _clamped_tasks(H, W, tile_size, tile_size, tile_stride, tile_stride)
    values = weight = None
    for (h0, h1, w0, w1) in tasks:
        out = fn(h0, h1, w0, w1).astype(jnp.float32)
        if values is None:
            oH, oW = int(H * io_scale), int(W * io_scale)
            values = jnp.zeros((B, oH, oW, out.shape[-1]), jnp.float32)
            weight = jnp.zeros((1, oH, oW, 1), jnp.float32)
        mask = jnp.asarray(_bound_mask(
            out.shape[1], out.shape[2],
            (h0 == 0, h1 >= H, w0 == 0, w1 >= W),
            border_width)[None, :, :, None])
        th, tw = int(h0 * io_scale), int(w0 * io_scale)
        values = values.at[:, th:th + out.shape[1], tw:tw + out.shape[2]].add(out * mask)
        weight = weight.at[:, th:th + out.shape[1], tw:tw + out.shape[2]].add(mask)
    return values / weight


def _bound_mask_3d(t: int, h: int, w: int, is_bound, border_width) -> np.ndarray:
    """Reference TileWorker2Dto3D.build_mask (tiler.py:172-189)."""
    border_width = (h + w) // 4 if border_width is None else border_width
    tt = np.broadcast_to(np.arange(t)[:, None, None], (t, h, w))
    hh = np.broadcast_to(np.arange(h)[None, :, None], (t, h, w))
    ww = np.broadcast_to(np.arange(w)[None, None, :], (t, h, w))
    pad = np.full((t, h, w), border_width, np.int64)
    mask = np.stack([
        pad if is_bound[0] else tt + 1,
        pad if is_bound[1] else t - tt,
        pad if is_bound[2] else hh + 1,
        pad if is_bound[3] else h - hh,
        pad if is_bound[4] else ww + 1,
        pad if is_bound[5] else w - ww,
    ]).min(axis=0)
    mask = np.clip(mask, 1, max(border_width, 1))
    return (mask / max(border_width, 1)).astype(np.float32)


def tiled_forward_2d_to_3d(fn, x, tile_size, tile_stride,
                           border_width=None, scales=(1.0, 1.0, 1.0, 1.0)):
    """TileWorker2Dto3D parity: x (B, T, H, W, C); spatial tiles, full temporal
    extent per tile. scales = (scale_C, scale_T, scale_H, scale_W) describe fn's
    output geometry (reference passes e.g. (16/... , 1/4, 1/8, 1/8) for a VAE
    encode). Returns (B, T*sT, H*sH, W*sW, C*sC) in float32.
    """
    B, T, H, W, C = x.shape
    sC, sT, sH, sW = scales
    th, tw = tile_size
    sh, sw = tile_stride
    values = jnp.zeros((B, int(T * sT), int(H * sH), int(W * sW), int(C * sC)),
                       jnp.float32)
    weight = jnp.zeros((1, int(T * sT), int(H * sH), int(W * sW), 1), jnp.float32)
    for (h0, h1, w0, w1) in _clamped_tasks(H, W, th, tw, sh, sw):
        out = fn(x[:, :, h0:h1, w0:w1, :]).astype(jnp.float32)
        mask = jnp.asarray(_bound_mask_3d(
            int(T * sT), int((h1 - h0) * sH), int((w1 - w0) * sW),
            (True, True, h0 == 0, h1 >= H, w0 == 0, w1 >= W),
            border_width)[None, :, :, :, None])
        ph, pw = int(h0 * sH), int(w0 * sW)
        values = values.at[:, :, ph:ph + out.shape[2],
                           pw:pw + out.shape[3]].add(out * mask)
        weight = weight.at[:, :, ph:ph + out.shape[2],
                           pw:pw + out.shape[3]].add(mask)
    return values / weight
