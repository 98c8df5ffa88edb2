"""FastBlend: model-free deflickering / video style-coherence smoother.

Re-implements the reference's FastBlend extension
(reference: diffsynth/extensions/FastBlend/__init__.py, patch_match.py,
cupy_kernels.py, runners/{fast,accurate,balanced,interpolation}.py) as a pure
numpy library. The reference requires **cupy** (hand-written CUDA RawKernels)
which rules out golden parity tests in this environment and rules out TPU
execution entirely; the algorithm is a host-side post-process (gather-heavy,
data-dependent indexing — a poor fit for XLA), so the TPU-native answer is a
host implementation with two interchangeable backends (`backend=` on every
class): "numpy" turns each CUDA kernel into a loop over patch offsets of
whole-image fancy-indexed gathers, and "native" (the "auto" default when g++
is available) calls multithreaded C++ kernels (native/patchmatch.cpp) that
are bit-compatible with the numpy path and ~27x faster end-to-end.

Algorithm (PatchMatch, Barnes et al. 2009, as specialised by the reference):
  * A nearest-neighbour field (NNF) maps every pixel of a *target* guide frame
    to a pixel of a *source* guide frame. Patch error is the SSD between the
    target patch and the source patch at the mapped position, computed on
    zero-padded images (reference: cupy_kernels.py:46-82, `patch_error`);
    total error = guide_error * guide_weight + style_error
    (reference: patch_match.py:80-91, `get_error`).
  * The NNF is refined over `num_iter` decreasing patch sizes
    [min + 2i][::-1] (reference: patch_match.py:30), each round running
    neighbour propagation (4 shifted candidates in random order), random
    search (+-range, `random_search_steps` rounds), and optional batch-axis
    tracking (reference: patch_match.py:166-189).
  * `apply_nnf_to_image` (reference: cupy_kernels.py:3-43, `remap`) renders
    the remapped style: each output pixel averages source-style pixels voted
    for by every in-bounds neighbour whose patch covers it, i.e.
    mean over valid offsets p of style[nnf(x+p) - p].
  * A coarse-to-fine pyramid (reference: patch_match.py:207-299) halves the
    resolution `log2(min(H,W)/max_patch)` times, area-resamples images, and
    upscales the NNF by pixel duplication (odd rows/cols +1), falling back to
    bilinear resize when a level is not an exact 2x.
  * Fast mode (reference: runners/fast.py) blends each style frame with
    remapped versions of the other frames in a window using a binary-lifting
    ("sparse table") scheme so only O(n log n) NNF estimations are needed,
    runs it left-to-right and right-to-left, and merges with weight -1 on the
    middle frame (so the original style frame is *subtracted* once — it is
    counted once in each of the left/right tables).

The smoother's public contract matches the reference's
`FastBlendSmoother.__call__(rendered_frames, original_frames)`
(reference: diffsynth/extensions/FastBlend/__init__.py:55-64).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Resampling helpers (host-side; replace the reference's torch.cuda resizes)
# ---------------------------------------------------------------------------


def area_resize(images: np.ndarray, height: int, width: int) -> np.ndarray:
    """(B, H, W, C) -> (B, height, width, C) area resample.

    Matches torch `F.interpolate(mode="area")` == adaptive average pooling:
    output cell i averages input rows [floor(i*H/h), ceil((i+1)*H/h))
    (reference: patch_match.py:217-224 uses mode='area').
    """
    b, h, w, c = images.shape
    if (h, w) == (height, width):
        return images.astype(np.float32, copy=False)
    out = np.empty((b, height, w, c), np.float32)
    for i in range(height):
        lo, hi = (i * h) // height, -((-(i + 1) * h) // height)
        out[:, i] = images[:, lo:hi].mean(axis=1)
    out2 = np.empty((b, height, width, c), np.float32)
    for j in range(width):
        lo, hi = (j * w) // width, -((-(j + 1) * w) // width)
        out2[:, :, j] = out[:, :, lo:hi].mean(axis=2)
    return out2


def bilinear_resize(images: np.ndarray, height: int, width: int) -> np.ndarray:
    """(B, H, W, C) bilinear resize, align_corners=False (torch semantics).

    Only used for NNF upscaling at non-exact-2x pyramid steps
    (reference: patch_match.py:266-273).
    """
    b, h, w, c = images.shape
    ys = (np.arange(height, dtype=np.float64) + 0.5) * (h / height) - 0.5
    xs = (np.arange(width, dtype=np.float64) + 0.5) * (w / width) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[None, :, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, None, :, None]
    v00 = images[:, y0][:, :, x0]
    v01 = images[:, y0][:, :, x1]
    v10 = images[:, y1][:, :, x0]
    v11 = images[:, y1][:, :, x1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).astype(np.float32)


# ---------------------------------------------------------------------------
# PatchMatcher: single-resolution NNF estimation
# ---------------------------------------------------------------------------


def _resolve_backend(backend: str):
    """Return the native ctypes lib for "auto"/"native", None for "numpy"."""
    if backend == "numpy":
        return None
    lib = None
    try:
        from goal_force_tpu.native import patchmatch_native
        lib = patchmatch_native()
    except Exception:
        lib = None
    if backend == "native" and lib is None:
        raise RuntimeError("native patchmatch backend requested but unavailable "
                           "(g++ missing or build failed)")
    return lib


class PatchMatcher:
    """Batched PatchMatch at a fixed resolution (reference: patch_match.py:8-206).

    All images are (B, H, W, C) float32, NNFs are (B, H, W, 2) int32 with
    channel 0 = row, channel 1 = column, always clamped in-bounds.
    """

    def __init__(
        self,
        height: int,
        width: int,
        channel: int,
        minimum_patch_size: int,
        num_iter: int = 5,
        guide_weight: float = 10.0,
        random_search_steps: int = 3,
        random_search_range: int = 4,
        use_mean_target_style: bool = False,
        use_pairwise_patch_error: bool = False,
        tracking_window_size: int = 0,
        rng: Optional[np.random.Generator] = None,
        backend: str = "auto",  # "auto" | "native" (C++ kernels) | "numpy"
        threads_per_block: int = 8,  # accepted for config-compat; no-op here
        gpu_id: int = 0,             # accepted for config-compat; no-op here
    ):
        del threads_per_block, gpu_id
        self._lib = _resolve_backend(backend)
        self.height = height
        self.width = width
        self.channel = channel
        self.guide_weight = float(guide_weight)
        self.random_search_steps = random_search_steps
        self.random_search_range = random_search_range
        self.use_mean_target_style = use_mean_target_style
        self.use_pairwise_patch_error = use_pairwise_patch_error
        self.tracking_window_size = tracking_window_size
        self.rng = rng if rng is not None else np.random.default_rng(0)
        # decreasing patch sizes; pad by the largest radius once
        # (reference: patch_match.py:30-31)
        self.patch_size_list = [minimum_patch_size + 2 * i for i in range(num_iter)][::-1]
        self.pad_size = self.patch_size_list[0] // 2
        self.patch_size = self.patch_size_list[0]

    # -- padding ------------------------------------------------------------

    def pad_image(self, image: np.ndarray) -> np.ndarray:
        p = self.pad_size
        return np.pad(image.astype(np.float32, copy=False),
                      ((0, 0), (p, p), (p, p), (0, 0)))

    # -- the three "kernels" -------------------------------------------------

    def _gather(self, flat: np.ndarray, xs: np.ndarray, ys: np.ndarray, wp: int) -> np.ndarray:
        """flat (B, Hp*Wp, C) gathered at padded coords -> (B, H, W, C)."""
        b = flat.shape[0]
        idx = (xs * wp + ys).reshape(b, -1, 1)
        out = np.take_along_axis(flat, idx, axis=1)
        return out.reshape(b, self.height, self.width, flat.shape[-1])

    def apply_nnf_to_image(self, nnf: np.ndarray, source_pad: np.ndarray) -> np.ndarray:
        """Remap kernel (reference: cupy_kernels.py:3-43): average the votes
        style[nnf(x+p) - p] over every neighbour offset p whose neighbour is
        in-bounds and whose voted coordinate is in-bounds. Returns UNPADDED
        (B, H, W, C); offset (0,0) always votes (NNFs are clamped), so the
        count is >= 1 everywhere."""
        h, w, p = self.height, self.width, self.pad_size
        r = self.patch_size // 2
        b = nnf.shape[0]
        c = source_pad.shape[-1]
        if self._lib is not None:
            out = np.empty((b, h, w, c), np.float32)
            self._lib.gf_pm_remap(
                b, h, w, c, self.patch_size, p,
                np.ascontiguousarray(source_pad, np.float32),
                np.ascontiguousarray(nnf, np.int32), out)
            return out
        wp = w + 2 * p
        flat = source_pad.reshape(b, -1, source_pad.shape[-1])
        nnf_pad = np.pad(nnf, ((0, 0), (r, r), (r, r), (0, 0)))
        yy, xx = np.mgrid[0:h, 0:w]
        acc = np.zeros((b, h, w, source_pad.shape[-1]), np.float32)
        cnt = np.zeros((b, h, w), np.int32)
        for px in range(-r, r + 1):
            row_ok = (yy + px >= 0) & (yy + px < h)
            for py in range(-r, r + 1):
                valid_n = row_ok & (xx + py >= 0) & (xx + py < w)
                nn = nnf_pad[:, r + px:r + px + h, r + py:r + py + w]
                cx = nn[..., 0] - px
                cy = nn[..., 1] - py
                valid = valid_n[None] & (cx >= 0) & (cx < h) & (cy >= 0) & (cy < w)
                votes = self._gather(flat, np.clip(cx, 0, h - 1) + p,
                                     np.clip(cy, 0, w - 1) + p, wp)
                acc += votes * valid[..., None]
                cnt += valid
        return acc / np.maximum(cnt, 1)[..., None]

    def get_patch_error(self, source_pad: np.ndarray, nnf: np.ndarray,
                        target_pad: np.ndarray) -> np.ndarray:
        """Patch SSD kernel (reference: cupy_kernels.py:46-82): full
        (unclipped) window on zero-padded images -> (B, H, W) float32."""
        h, w, p = self.height, self.width, self.pad_size
        r = self.patch_size // 2
        b = nnf.shape[0]
        if self._lib is not None:
            err = np.empty((b, h, w), np.float32)
            self._lib.gf_pm_patch_error(
                b, h, w, source_pad.shape[-1], self.patch_size, p,
                np.ascontiguousarray(source_pad, np.float32),
                np.ascontiguousarray(nnf, np.int32),
                np.ascontiguousarray(target_pad, np.float32), err)
            return err
        wp = w + 2 * p
        flat = source_pad.reshape(b, -1, source_pad.shape[-1])
        xs = nnf[..., 0] + p
        ys = nnf[..., 1] + p
        err = np.zeros((b, h, w), np.float32)
        for px in range(-r, r + 1):
            for py in range(-r, r + 1):
                t = target_pad[:, p + px:p + px + h, p + py:p + py + w]
                s = self._gather(flat, xs + px, ys + py, wp)
                d = t - s
                err += np.einsum("bhwc,bhwc->bhw", d, d)
        return err

    def get_pairwise_patch_error(self, source_pad: np.ndarray,
                                 nnf: np.ndarray) -> np.ndarray:
        """Interleaved-pair patch SSD (reference: cupy_kernels.py:85-125 +
        patch_match.py:66-79): compare source[0::2] at nnf[0::2] against
        source[1::2] at nnf[1::2], repeat each error twice on the batch axis."""
        h, w, p = self.height, self.width, self.pad_size
        r = self.patch_size // 2
        wp = w + 2 * p
        sa, na = source_pad[0::2], nnf[0::2]
        sb, nb = source_pad[1::2], nnf[1::2]
        b = sa.shape[0]
        if self._lib is not None:
            err = np.empty((b, h, w), np.float32)
            self._lib.gf_pm_pairwise_error(
                b, h, w, source_pad.shape[-1], self.patch_size, p,
                np.ascontiguousarray(sa, np.float32),
                np.ascontiguousarray(na, np.int32),
                np.ascontiguousarray(sb, np.float32),
                np.ascontiguousarray(nb, np.int32), err)
            return np.repeat(err, 2, axis=0)
        fa = sa.reshape(b, -1, sa.shape[-1])
        fb = sb.reshape(b, -1, sb.shape[-1])
        xa, ya = na[..., 0] + p, na[..., 1] + p
        xb, yb = nb[..., 0] + p, nb[..., 1] + p
        err = np.zeros((b, h, w), np.float32)
        for px in range(-r, r + 1):
            for py in range(-r, r + 1):
                va = self._gather(fa, xa + px, ya + py, wp)
                vb = self._gather(fb, xb + px, yb + py, wp)
                d = va - vb
                err += np.einsum("bhwc,bhwc->bhw", d, d)
        return np.repeat(err, 2, axis=0)

    # -- error / candidate machinery -----------------------------------------

    def get_error(self, source_guide, target_guide, source_style, target_style, nnf):
        """guide SSD * guide_weight + style SSD (reference: patch_match.py:80-91)."""
        error_guide = self.get_patch_error(source_guide, nnf, target_guide)
        if self.use_mean_target_style:
            ts = self.apply_nnf_to_image(nnf, source_style)
            ts = ts.mean(axis=0, keepdims=True)
            ts = np.broadcast_to(ts, (nnf.shape[0],) + ts.shape[1:])
            target_style = self.pad_image(ts)
        if self.use_pairwise_patch_error:
            error_style = self.get_pairwise_patch_error(source_style, nnf)
        else:
            error_style = self.get_patch_error(source_style, nnf, target_style)
        return error_guide * self.guide_weight + error_style

    def clamp_bound(self, nnf: np.ndarray) -> np.ndarray:
        nnf[..., 0] = np.clip(nnf[..., 0], 0, self.height - 1)
        nnf[..., 1] = np.clip(nnf[..., 1], 0, self.width - 1)
        return nnf

    def random_step(self, nnf: np.ndarray, r: int) -> np.ndarray:
        step = self.rng.integers(-r, r + 1, size=nnf.shape, dtype=np.int32)
        return self.clamp_bound(nnf + step)

    def neighboor_step(self, nnf: np.ndarray, d: int) -> np.ndarray:
        """Propagate from the 4 neighbours: shift the field by one pixel and
        adjust the mapped coordinate the opposite way
        (reference: patch_match.py:105-119)."""
        upd = nnf.copy()
        if d == 0:
            upd[:, 1:] = nnf[:, :-1]
            upd[..., 0] += 1
        elif d == 1:
            upd[:, :, 1:] = nnf[:, :, :-1]
            upd[..., 1] += 1
        elif d == 2:
            upd[:, :-1] = nnf[:, 1:]
            upd[..., 0] -= 1
        elif d == 3:
            upd[:, :, :-1] = nnf[:, :, 1:]
            upd[..., 1] -= 1
        return self.clamp_bound(upd)

    def shift_nnf(self, nnf: np.ndarray, d: int) -> np.ndarray:
        """Shift along the batch (time) axis with edge replication
        (reference: patch_match.py:121-130)."""
        if d > 0:
            d = min(nnf.shape[0], d)
            return np.concatenate([nnf[d:]] + [nnf[-1:]] * d, axis=0)
        d = max(-nnf.shape[0], d)
        return np.concatenate([nnf[:1]] * (-d) + [nnf[:d]], axis=0)

    def track_step(self, nnf: np.ndarray, d: int) -> np.ndarray:
        if self.use_pairwise_patch_error:
            upd = np.zeros_like(nnf)
            upd[0::2] = self.shift_nnf(nnf[0::2], d)
            upd[1::2] = self.shift_nnf(nnf[1::2], d)
            return upd
        return self.shift_nnf(nnf, d)

    def update(self, source_guide, target_guide, source_style, target_style,
               nnf, err, upd_nnf):
        upd_err = self.get_error(source_guide, target_guide, source_style,
                                 target_style, upd_nnf)
        better = upd_err < err
        nnf = np.where(better[..., None], upd_nnf, nnf)
        err = np.where(better, upd_err, err)
        return nnf, err

    def iteration(self, source_guide, target_guide, source_style, target_style,
                  nnf, err):
        for d in self.rng.permutation(4):
            nnf, err = self.update(source_guide, target_guide, source_style,
                                   target_style, nnf, err,
                                   self.neighboor_step(nnf, int(d)))
        for _ in range(self.random_search_steps):
            nnf, err = self.update(source_guide, target_guide, source_style,
                                   target_style, nnf, err,
                                   self.random_step(nnf, self.random_search_range))
        for d in range(1, self.tracking_window_size + 1):
            nnf, err = self.update(source_guide, target_guide, source_style,
                                   target_style, nnf, err, self.track_step(nnf, d))
            nnf, err = self.update(source_guide, target_guide, source_style,
                                   target_style, nnf, err, self.track_step(nnf, -d))
        return nnf, err

    def estimate_nnf(self, source_guide, target_guide, source_style, nnf):
        """Refine `nnf` over the decreasing patch-size schedule and return
        (nnf, remapped_style) — images come in UNPADDED
        (reference: patch_match.py:191-205)."""
        source_guide = self.pad_image(source_guide)
        target_guide = self.pad_image(target_guide)
        source_style = self.pad_image(source_style)
        for patch_size in self.patch_size_list:
            self.patch_size = patch_size
            target_style = self.pad_image(self.apply_nnf_to_image(nnf, source_style))
            err = self.get_error(source_guide, target_guide, source_style,
                                 target_style, nnf)
            nnf, err = self.iteration(source_guide, target_guide, source_style,
                                      target_style, nnf, err)
        return nnf, self.apply_nnf_to_image(nnf, source_style)


# ---------------------------------------------------------------------------
# PyramidPatchMatcher: coarse-to-fine
# ---------------------------------------------------------------------------


class PyramidPatchMatcher:
    """Coarse-to-fine PatchMatch (reference: patch_match.py:207-299).

    Pyramid depth is log2(min(H, W) / maximum_patch_size) as in the reference,
    clamped to >= 1 so tiny images still work (the reference would crash).
    """

    def __init__(
        self,
        image_height: int,
        image_width: int,
        channel: int,
        minimum_patch_size: int,
        num_iter: int = 5,
        guide_weight: float = 10.0,
        use_mean_target_style: bool = False,
        use_pairwise_patch_error: bool = False,
        tracking_window_size: int = 0,
        initialize: str = "identity",
        seed: int = 0,
        backend: str = "auto",
        threads_per_block: int = 8,  # config-compat no-op
        gpu_id: int = 0,             # config-compat no-op
    ):
        del threads_per_block, gpu_id
        maximum_patch_size = minimum_patch_size + (num_iter - 1) * 2
        self.pyramid_level = max(
            1, int(math.log2(min(image_height, image_width) / maximum_patch_size)))
        self.initialize = initialize
        self.rng = np.random.default_rng(seed)
        self.pyramid_heights: List[int] = []
        self.pyramid_widths: List[int] = []
        self.patch_matchers: List[PatchMatcher] = []
        for level in range(self.pyramid_level):
            h = image_height // (2 ** (self.pyramid_level - 1 - level))
            w = image_width // (2 ** (self.pyramid_level - 1 - level))
            self.pyramid_heights.append(h)
            self.pyramid_widths.append(w)
            self.patch_matchers.append(PatchMatcher(
                h, w, channel, minimum_patch_size=minimum_patch_size,
                num_iter=num_iter, guide_weight=guide_weight,
                use_mean_target_style=use_mean_target_style,
                use_pairwise_patch_error=use_pairwise_patch_error,
                tracking_window_size=tracking_window_size, rng=self.rng,
                backend=backend))

    def initialize_nnf(self, batch_size: int) -> np.ndarray:
        h, w = self.pyramid_heights[0], self.pyramid_widths[0]
        if self.initialize == "random":
            return np.stack([
                self.rng.integers(0, h, (batch_size, h, w), dtype=np.int32),
                self.rng.integers(0, w, (batch_size, h, w), dtype=np.int32),
            ], axis=3)
        if self.initialize == "identity":
            yy, xx = np.mgrid[0:h, 0:w]
            nnf = np.stack([yy, xx], axis=2).astype(np.int32)
            return np.broadcast_to(nnf, (batch_size,) + nnf.shape).copy()
        raise NotImplementedError(self.initialize)

    def update_nnf(self, nnf: np.ndarray, level: int) -> np.ndarray:
        """Upscale an NNF to the next pyramid level: duplicate each entry 2x2,
        double the coordinates, +1 on odd rows/columns; bilinear-resize when
        the next level is not an exact 2x. (The reference's exact-2x test
        reads the wrong axes — nnf.shape[0]/[1] are batch/height — so it
        always takes the resize path, which is an identity resize when sizes
        match; behaviour is equivalent. reference: patch_match.py:260-274.)"""
        nnf = nnf.repeat(2, axis=1).repeat(2, axis=2) * 2
        nnf[:, 1::2, :, 0] += 1
        nnf[:, :, 1::2, 1] += 1
        h, w = self.pyramid_heights[level], self.pyramid_widths[level]
        if (nnf.shape[1], nnf.shape[2]) != (h, w):
            nnf = bilinear_resize(nnf.astype(np.float32), h, w).astype(np.int32)
        return self.patch_matchers[level].clamp_bound(nnf)

    def estimate_nnf(self, source_guide, target_guide, source_style):
        """(B, H, W, C) uint8/float arrays -> (nnf, remapped_style) at full res
        (reference: patch_match.py:283-299)."""
        source_guide = np.asarray(source_guide, np.float32)
        target_guide = np.asarray(target_guide, np.float32)
        source_style = np.asarray(source_style, np.float32)
        nnf = None
        target_style = None
        for level in range(self.pyramid_level):
            nnf = (self.initialize_nnf(source_guide.shape[0]) if level == 0
                   else self.update_nnf(nnf, level))
            h, w = self.pyramid_heights[level], self.pyramid_widths[level]
            sg = area_resize(source_guide, h, w)
            tg = area_resize(target_guide, h, w)
            ss = area_resize(source_style, h, w)
            nnf, target_style = self.patch_matchers[level].estimate_nnf(sg, tg, ss, nnf)
        return nnf, target_style


# ---------------------------------------------------------------------------
# Fast-mode sparse-table blending
# ---------------------------------------------------------------------------


class TableManager:
    """Binary-lifting blending tables (reference: runners/fast.py:8-107).

    `table[i][v]` holds (frame, weight): the weighted mean of style frames
    {j : j obtained from i by clearing the low `v` bits... } remapped into
    frame i's geometry; `tree_query` decomposes any window [l, r] into
    O(log n) such nodes.
    """

    def task_list(self, n: int) -> List[Dict[str, int]]:
        max_level = 1
        while (1 << max_level) <= n:
            max_level += 1
        tasks = []
        for i in range(n):
            j = i
            for level in range(max_level):
                if i & (1 << level):
                    continue
                j |= 1 << level
                if j >= n:
                    break
                tasks.append({"source": i, "target": j, "level": level + 1})
        tasks.sort(key=lambda t: t["level"])
        return tasks

    def build_remapping_table(self, frames_guide, frames_style, engine,
                              batch_size: int, desc: str = ""):
        del desc
        n = len(frames_guide)
        tasks = self.task_list(n)
        table = [[(np.asarray(frames_style[i], np.float32), 1)] for i in range(n)]
        for start in range(0, len(tasks), batch_size):
            batch = tasks[start:start + batch_size]
            sg = np.stack([frames_guide[t["source"]] for t in batch])
            tg = np.stack([frames_guide[t["target"]] for t in batch])
            ss = np.stack([frames_style[t["source"]] for t in batch])
            _, remapped = engine.estimate_nnf(sg, tg, ss)
            for t, result in zip(batch, remapped):
                target, level = t["target"], t["level"]
                if len(table[target]) == level:
                    table[target].append((result, 1))
                else:
                    frame, weight = table[target][level]
                    table[target][level] = (
                        frame * (weight / (weight + 1)) + result / (weight + 1),
                        weight + 1)
        return table

    def remapping_table_to_blending_table(self, table):
        """Prefix-merge each frame's levels: level v becomes the mean of
        levels v-1 and v with summed weights (reference: runners/fast.py:56-64)."""
        for row in table:
            for v in range(1, len(row)):
                f1, w1 = row[v - 1]
                f2, w2 = row[v]
                row[v] = ((f1 + f2) / 2, w1 + w2)
        return table

    def tree_query(self, leftbound: int, rightbound: int) -> List[Tuple[int, int]]:
        nodes = []
        idx = rightbound
        while idx >= leftbound:
            level = 0
            while (1 << level) & idx and idx - (1 << (level + 1)) + 1 >= leftbound:
                level += 1
            nodes.append((idx, level))
            idx -= 1 << level
        return nodes

    def process_window_sum(self, frames_guide, blending_table, engine,
                           window_size: int, batch_size: int, desc: str = ""):
        del desc
        n = len(blending_table)
        tasks = []
        result = []
        for target in range(n):
            for source, level in self.tree_query(max(target - window_size, 0), target):
                if source != target:
                    tasks.append({"source": source, "target": target, "level": level})
                else:
                    result.append(blending_table[target][level])
        for start in range(0, len(tasks), batch_size):
            batch = tasks[start:start + batch_size]
            sg = np.stack([frames_guide[t["source"]] for t in batch])
            tg = np.stack([frames_guide[t["target"]] for t in batch])
            ss = np.stack([blending_table[t["source"]][t["level"]][0] for t in batch])
            _, remapped = engine.estimate_nnf(sg, tg, ss)
            for t, frame_2 in zip(batch, remapped):
                frame_1, w1 = result[t["target"]]
                w2 = blending_table[t["source"]][t["level"]][1]
                w = w1 + w2
                result[t["target"]] = (frame_1 * (w1 / w) + frame_2 * (w2 / w), w)
        return result


def _fast_mode_pass(frames_guide, frames_style, engine, batch_size, window_size):
    tm = TableManager()
    table = tm.build_remapping_table(frames_guide, frames_style, engine, batch_size)
    table = tm.remapping_table_to_blending_table(table)
    return tm.process_window_sum(frames_guide, table, engine, window_size, batch_size)


# ---------------------------------------------------------------------------
# Runners (reference: runners/{fast,accurate,balanced,interpolation}.py)
# ---------------------------------------------------------------------------


def fast_mode_blend(frames_guide: Sequence[np.ndarray],
                    frames_style: Sequence[np.ndarray],
                    engine: PyramidPatchMatcher,
                    batch_size: int = 8,
                    window_size: int = 64) -> List[np.ndarray]:
    """Two-sided sparse-table blend; weight -1 on the middle frame removes the
    double-counted original (reference: runners/fast.py:113-139). Returns
    float32 frames (not clipped)."""
    frames_guide = [np.asarray(f, np.float32) for f in frames_guide]
    frames_style = [np.asarray(f, np.float32) for f in frames_style]
    left = _fast_mode_pass(frames_guide, frames_style, engine, batch_size, window_size)
    right = _fast_mode_pass(frames_guide[::-1], frames_style[::-1], engine,
                            batch_size, window_size)[::-1]
    out = []
    for (fl, wl), fm, (fr, wr) in zip(left, frames_style, right):
        wm = -1
        w = wl + wm + wr
        out.append(fl * (wl / w) + fm * (wm / w) + fr * (wr / w))
    return out


def accurate_mode_blend(frames_guide, frames_style, engine,
                        batch_size: int = 8, window_size: int = 8) -> List[np.ndarray]:
    """Mean of remapped neighbours over a dense window; the engine should be
    built with use_mean_target_style=True (reference: runners/accurate.py)."""
    frames_guide = [np.asarray(f, np.float32) for f in frames_guide]
    frames_style = [np.asarray(f, np.float32) for f in frames_style]
    n = len(frames_style)
    out = []
    for target in range(n):
        lo, hi = max(target - window_size, 0), min(target + window_size + 1, n)
        remapped = []
        for i in range(lo, hi, batch_size):
            j = min(i + batch_size, hi)
            sg = np.stack(frames_guide[i:j])
            tg = np.stack([frames_guide[target]] * (j - i))
            ss = np.stack(frames_style[i:j])
            _, ts = engine.estimate_nnf(sg, tg, ss)
            remapped.append(ts)
        out.append(np.concatenate(remapped, axis=0).mean(axis=0))
    return out


def balanced_mode_blend(frames_guide, frames_style, engine,
                        batch_size: int = 8, window_size: int = 8) -> List[np.ndarray]:
    """Running mean over every (source, target) pair in the window, seeded with
    the original style frame (reference: runners/balanced.py)."""
    frames_guide = [np.asarray(f, np.float32) for f in frames_guide]
    frames_style = [np.asarray(f, np.float32) for f in frames_style]
    n = len(frames_style)
    tasks = [(s, t) for t in range(n)
             for s in range(t - window_size, t + window_size + 1)
             if 0 <= s < n and s != t]
    frames: List[Tuple[np.ndarray, int]] = [(frames_style[i], 1) for i in range(n)]
    for start in range(0, len(tasks), batch_size):
        batch = tasks[start:start + batch_size]
        sg = np.stack([frames_guide[s] for s, _ in batch])
        tg = np.stack([frames_guide[t] for _, t in batch])
        ss = np.stack([frames_style[s] for s, _ in batch])
        _, remapped = engine.estimate_nnf(sg, tg, ss)
        for (s, t), result in zip(batch, remapped):
            frame, weight = frames[t]
            frames[t] = (frame * (weight / (weight + 1)) + result / (weight + 1),
                         weight + 1)
    return [f for f, _ in frames]


def interpolation_mode_blend(frames_guide, frames_style, index_style,
                             engine, batch_size: int = 8) -> List[np.ndarray]:
    """Propagate sparse styled keyframes to every frame, blending the left and
    right keyframes by inverse distance; the engine should be built with
    use_pairwise_patch_error=True (reference: runners/interpolation.py:8-85)."""
    frames_guide = [np.asarray(f, np.float32) for f in frames_guide]
    frames_style = [np.asarray(f, np.float32) for f in frames_style]
    n = len(frames_guide)
    index_style = sorted(index_style)
    index_dict = {idx: i for i, idx in enumerate(index_style)}

    tasks: List[Tuple[int, int, int]] = []
    if index_style[0] > 0:
        tasks += [(index_style[0], m, index_style[0]) for m in range(index_style[0])]
    for l, r in zip(index_style[:-1], index_style[1:]):
        tasks += [(l, m, r) for m in range(l, r)]
    tasks += [(index_style[-1], m, index_style[-1]) for m in range(index_style[-1], n)]

    out: List[Optional[np.ndarray]] = [None] * n
    for start in range(0, len(tasks), batch_size):
        batch = tasks[start:start + batch_size]
        sg, tg, ss = [], [], []
        for l, m, r in batch:
            sg += [frames_guide[l], frames_guide[r]]
            tg += [frames_guide[m], frames_guide[m]]
            ss += [frames_style[index_dict[l]], frames_style[index_dict[r]]]
        _, ts = engine.estimate_nnf(np.stack(sg), np.stack(tg), np.stack(ss))
        for frame_l, frame_r, (l, m, r) in zip(ts[0::2], ts[1::2], batch):
            wl, wr = abs(m - r), abs(m - l)
            if wl + wr == 0:
                wl = wr = 0.5
            else:
                wl, wr = wl / (wl + wr), wr / (wl + wr)
            out[m] = frame_l * wl + frame_r * wr
    return out  # type: ignore[return-value]


# ---------------------------------------------------------------------------
# The smoother (pipeline-facing API)
# ---------------------------------------------------------------------------


@dataclass
class FastBlendSmoother:
    """Deflicker rendered frames against the original (guide) frames.

    `smoother(rendered_frames, original_frames)` -> list of uint8 (H, W, 3)
    frames, matching the reference's call contract
    (reference: diffsynth/extensions/FastBlend/__init__.py:7-64). Defaults
    mirror the reference: batch 8, window 64, min patch 5, 5 iterations,
    guide weight 10, identity init, no tracking.
    """

    batch_size: int = 8
    window_size: int = 64
    minimum_patch_size: int = 5
    num_iter: int = 5
    guide_weight: float = 10.0
    initialize: str = "identity"
    tracking_window_size: int = 0
    seed: int = 0
    backend: str = "auto"

    def run(self, frames_guide, frames_style) -> List[np.ndarray]:
        frames_guide = [np.asarray(f) for f in frames_guide]
        frames_style = [np.asarray(f) for f in frames_style]
        if len(frames_guide) != len(frames_style):
            raise ValueError(
                f"FastBlend needs one guide frame per styled frame, got "
                f"{len(frames_guide)} guide vs {len(frames_style)} styled")
        if frames_guide[0].shape != frames_style[0].shape:
            raise ValueError(
                f"guide/style frame shapes differ: {frames_guide[0].shape} vs "
                f"{frames_style[0].shape}")
        h, w, c = frames_style[0].shape
        engine = PyramidPatchMatcher(
            image_height=h, image_width=w, channel=c,
            minimum_patch_size=self.minimum_patch_size, num_iter=self.num_iter,
            guide_weight=self.guide_weight, initialize=self.initialize,
            tracking_window_size=self.tracking_window_size, seed=self.seed,
            backend=self.backend)
        frames = fast_mode_blend(frames_guide, frames_style, engine,
                                 self.batch_size, self.window_size)
        return [f.clip(0, 255).astype(np.uint8) for f in frames]

    def __call__(self, rendered_frames, original_frames, **kwargs):
        del kwargs
        return self.run(original_frames, rendered_frames)
