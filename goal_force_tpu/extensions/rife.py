"""RIFE video frame interpolation (IFNet).

Parity with /root/reference/diffsynth/extensions/RIFE/__init__.py: 3 coarse-to-fine
IFBlocks predict bidirectional flow + blend mask; frames are backward-warped
(grid_sample bilinear, border padding, align_corners=True — implemented manually) and
blended. Channels-last; f32 (the reference notes IFNet does not support fp16).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp


def _prelu(a, x):
    return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


def _conv(p, x, stride: int = 1):
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(x.dtype)


def _conv_prelu(p, x, stride: int = 1):
    return _prelu(p["a"], _conv(p, x, stride))


def _deconv(p, x):
    """torch ConvTranspose2d(k=4, s=2, p=1): conv with 2x input dilation, flipped kernel,
    padding k-1-p = 2 per side (output doubles)."""
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), ((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(x.dtype)


def resize_bilinear(x, h, w):
    """align_corners=False bilinear, NO antialias on downscale (matches F.interpolate)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="linear",
                            antialias=False)


def warp(img, flow):
    """Backward warp: grid_sample(bilinear, border, align_corners=True).

    img: (B, H, W, C); flow: (B, H, W, 2) pixel offsets (x, y)."""
    b, h, w, _ = img.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    px = xs + flow[..., 0]
    py = ys + flow[..., 1]
    px = jnp.clip(px, 0.0, w - 1.0)   # border padding
    py = jnp.clip(py, 0.0, h - 1.0)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    wx = (px - x0)[..., None]
    wy = (py - y0)[..., None]

    def gather(yi, xi):
        idx = (yi * w + xi).astype(jnp.int32)
        flat = img.reshape(b, h * w, -1)
        return jnp.take_along_axis(flat, idx.reshape(b, -1, 1), axis=1).reshape(
            b, h, w, img.shape[-1])

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _ifblock(p, x, flow, scale: float):
    b, h, w, _ = x.shape
    hs, ws = int(h / scale), int(w / scale)
    x = resize_bilinear(x, hs, ws)
    flow = resize_bilinear(flow, hs, ws) * (1.0 / scale)
    feat = _conv_prelu(p["conv0_0"], jnp.concatenate([x, flow], -1), stride=2)
    feat = _conv_prelu(p["conv0_1"], feat, stride=2)
    for blk in ("convblock0", "convblock1", "convblock2", "convblock3"):
        feat = _conv_prelu(p[blk + "_1"], _conv_prelu(p[blk + "_0"], feat)) + feat
    fl = _deconv(p["conv1_2"], _prelu(p["conv1_a"], _deconv(p["conv1_0"], feat)))
    mk = _deconv(p["conv2_2"], _prelu(p["conv2_a"], _deconv(p["conv2_0"], feat)))
    fl = resize_bilinear(fl, h, w) * scale
    mk = resize_bilinear(mk, h, w)
    return fl, mk


def ifnet_apply(params: Dict, img0, img1, scale_list=(4.0, 2.0, 1.0)):
    """img0/img1: (B, H, W, 3) [0,1] -> interpolated middle frame (B, H, W, 3).

    Mirrors IFNet.forward (:71-103) inference path."""
    b, h, w, _ = img0.shape
    flow = jnp.zeros((b, h, w, 4), img0.dtype)
    mask = jnp.zeros((b, h, w, 1), img0.dtype)
    warped0, warped1 = img0, img1
    for i, blk_name in enumerate(("block0", "block1", "block2")):
        p = params[blk_name]
        f0, m0 = _ifblock(p, jnp.concatenate([warped0, warped1, mask], -1), flow,
                          scale_list[i])
        swap = jnp.concatenate([flow[..., 2:4], flow[..., :2]], -1)
        f1, m1 = _ifblock(p, jnp.concatenate([warped1, warped0, -mask], -1), swap,
                          scale_list[i])
        f1s = jnp.concatenate([f1[..., 2:4], f1[..., :2]], -1)
        flow = flow + (f0 + f1s) / 2
        mask = mask + (m0 - m1) / 2
        warped0 = warp(img0, flow[..., :2])
        warped1 = warp(img1, flow[..., 2:4])
    m = jax.nn.sigmoid(mask)
    return warped0 * m + warped1 * (1 - m)


def ifnet_params_from_torch(sd) -> Dict:
    sd = {k.replace("module.", ""): v for k, v in sd.items()}

    def conv(name, prelu_name=None):
        p = {"w": np.ascontiguousarray(sd[name + ".weight"].transpose(2, 3, 1, 0)),
             "b": sd[name + ".bias"]}
        if prelu_name is not None:
            p["a"] = sd[prelu_name + ".weight"].reshape(-1)
        return p

    def deconv(name):
        # torch ConvTranspose2d weight (in, out, kh, kw) -> flip spatial -> (kh, kw, in, out)
        w = sd[name + ".weight"][:, :, ::-1, ::-1]
        return {"w": np.ascontiguousarray(w.transpose(2, 3, 0, 1)),
                "b": sd[name + ".bias"]}

    def block(prefix):
        p = {
            "conv0_0": conv(f"{prefix}.conv0.0.0", f"{prefix}.conv0.0.1"),
            "conv0_1": conv(f"{prefix}.conv0.1.0", f"{prefix}.conv0.1.1"),
        }
        for i in range(4):
            p[f"convblock{i}_0"] = conv(f"{prefix}.convblock{i}.0.0",
                                        f"{prefix}.convblock{i}.0.1")
            p[f"convblock{i}_1"] = conv(f"{prefix}.convblock{i}.1.0",
                                        f"{prefix}.convblock{i}.1.1")
        p["conv1_0"] = deconv(f"{prefix}.conv1.0")
        p["conv1_a"] = sd[f"{prefix}.conv1.1.weight"].reshape(-1)
        p["conv1_2"] = deconv(f"{prefix}.conv1.2")
        p["conv2_0"] = deconv(f"{prefix}.conv2.0")
        p["conv2_a"] = sd[f"{prefix}.conv2.1.weight"].reshape(-1)
        p["conv2_2"] = deconv(f"{prefix}.conv2.2")
        return p

    return {b: block(b) for b in ("block0", "block1", "block2")}


class RIFEInterpolater:
    """Frame doubling: each num_iter doubles the frame count (reference :170-197).

    Frames are (F, H, W, 3) float [0,1]; H/W padded by resize to multiples of 32 and
    restored, as the reference does (:131-137)."""

    def __init__(self, params: Dict):
        self.params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)
        self._fn = jax.jit(lambda p, a, b: ifnet_apply(p, a, b))

    @classmethod
    def from_torch_checkpoint(cls, path: str) -> "RIFEInterpolater":
        from goal_force_tpu.io.safetensors_io import load_safetensors, load_torch_pth

        sd = (load_torch_pth(path) if path.endswith((".pth", ".pt", ".pkl"))
              else load_safetensors(path))
        return cls(ifnet_params_from_torch(sd))

    def interpolate(self, frames: np.ndarray, num_iter: int = 1,
                    batch_size: int = 4) -> np.ndarray:
        import cv2

        f, h, w, _ = frames.shape
        h32, w32 = -(-h // 32) * 32, -(-w // 32) * 32
        work = frames
        if (h, w) != (h32, w32):
            work = np.stack([cv2.resize(fr, (w32, h32)) for fr in frames])
        work = work.astype(np.float32)
        for _ in range(num_iter):
            mids = []
            for i in range(0, work.shape[0] - 1, batch_size):
                a = jnp.asarray(work[i:i + batch_size])
                b = jnp.asarray(work[i + 1:i + 1 + batch_size])
                n = min(a.shape[0], b.shape[0])
                mids.append(np.asarray(self._fn(self.params, a[:n], b[:n])))
            mids = np.clip(np.concatenate(mids), 0, 1)
            out = np.empty((work.shape[0] * 2 - 1, *work.shape[1:]), np.float32)
            out[0::2] = work
            out[1::2] = mids
            work = out
        if (h, w) != (h32, w32):
            work = np.stack([cv2.resize(fr, (w, h)) for fr in work])
        return np.clip(work, 0, 1)

    def smooth(self, frames: np.ndarray, batch_size: int = 4,
               interpolate: bool = True) -> np.ndarray:
        """Temporal deflicker (reference RIFESmoother,
        diffsynth/processors/RIFE.py:55-77): for each interior frame, predict
        the midpoint of its neighbors; with interpolate=True replace the frame
        by mid(frame, prediction), else by their average. First/last frames
        pass through."""
        import cv2

        f, h, w, _ = frames.shape
        if f < 3:
            return np.asarray(frames, np.float32)
        h32, w32 = -(-h // 32) * 32, -(-w // 32) * 32
        work = frames
        if (h, w) != (h32, w32):
            work = np.stack([cv2.resize(fr, (w32, h32)) for fr in frames])
        work = work.astype(np.float32)

        def mids(a_all, b_all):
            out = []
            for i in range(0, a_all.shape[0], batch_size):
                a = jnp.asarray(a_all[i:i + batch_size])
                b = jnp.asarray(b_all[i:i + batch_size])
                out.append(np.asarray(self._fn(self.params, a, b)))
            return np.clip(np.concatenate(out), 0, 1)

        pred = mids(work[:-2], work[2:])
        if interpolate:
            work[1:-1] = mids(work[1:-1], pred)
        else:
            work[1:-1] = (work[1:-1] + pred) / 2
        if (h, w) != (h32, w32):
            work = np.stack([cv2.resize(fr, (w, h)) for fr in work])
        return np.clip(work, 0, 1)


class RIFESmoother:
    """VideoProcessor-shaped wrapper over RIFEInterpolater.smooth (the
    reference's processors/RIFE.py contract)."""

    def __init__(self, interpolater: "RIFEInterpolater" = None, path: str = None,
                 batch_size: int = 4, interpolate: bool = True):
        if interpolater is None:
            if path is None:
                raise ValueError("RIFESmoother needs an interpolater or a checkpoint path")
            interpolater = RIFEInterpolater.from_torch_checkpoint(path)
        self.interpolater = interpolater
        self.batch_size = batch_size
        self.interpolate = interpolate

    def __call__(self, frames: np.ndarray, **kwargs) -> np.ndarray:
        return self.interpolater.smooth(frames, batch_size=self.batch_size,
                                        interpolate=self.interpolate)
