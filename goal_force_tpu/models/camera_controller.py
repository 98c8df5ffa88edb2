"""Wan camera controller: Plücker ray embeddings + SimpleAdapter.

Reference /root/reference/diffsynth/models/wan_video_camera_controller.py:
- generate_camera_coordinates (:186-206): walk a 19-number pose entry by a
  per-frame speed along the chosen direction.
- process_pose_file / ray_condition (:114-181): aspect-corrected intrinsics,
  first-frame-relative c2w poses, normalized pixel ray directions, Plücker
  (o x d, d) 6-vector per pixel.
- SimpleAdapter (:8-44): per-frame pixel-unshuffle x8, stride conv,
  ReLU-conv residual blocks.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

DEFAULT_ORIGIN = (0, 0.532139961, 0.946026558, 0.5, 0.5, 0, 0, 1, 0, 0, 0, 0,
                  1, 0, 0, 0, 0, 1, 0)


def generate_camera_coordinates(direction: str, length: int,
                                speed: float = 1 / 54,
                                origin=DEFAULT_ORIGIN) -> List[List[float]]:
    coords = [list(origin)]
    while len(coords) < length:
        c = coords[-1].copy()
        if "Left" in direction:
            c[9] += speed
        if "Right" in direction:
            c[9] -= speed
        if "Up" in direction:
            c[13] += speed
        if "Down" in direction:
            c[13] -= speed
        if "In" in direction:
            c[18] -= speed
        if "Out" in direction:
            c[18] += speed
        coords.append(c)
    return coords


def _relative_poses(entries: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(V, 19) pose entries -> (intrinsics (V, 4), first-frame-relative c2w
    (V, 4, 4)) (reference Camera/get_relative_pose :77-107)."""
    fxy = entries[:, 1:5].astype(np.float64)
    w2c = np.tile(np.eye(4)[None], (len(entries), 1, 1))
    w2c[:, :3, :] = entries[:, 7:].reshape(-1, 3, 4)
    c2w = np.linalg.inv(w2c)
    abs2rel = w2c[0]
    rel = np.concatenate([np.eye(4)[None],
                          np.einsum("ij,vjk->vik", abs2rel, c2w[1:])], axis=0)
    return fxy, rel.astype(np.float64)


def plucker_embedding(entries: Sequence[Sequence[float]], width: int,
                      height: int, original_pose_width: int = 1280,
                      original_pose_height: int = 720) -> np.ndarray:
    """(V, 19) pose entries -> (V, H, W, 6) Plücker embedding (reference
    process_pose_file/ray_condition :114-181)."""
    entries = np.asarray(entries, np.float64)
    fxy, c2w = _relative_poses(entries)
    fx, fy, cx, cy = fxy[:, 0].copy(), fxy[:, 1].copy(), fxy[:, 2], fxy[:, 3]
    sample_ratio = width / height
    pose_ratio = original_pose_width / original_pose_height
    if pose_ratio > sample_ratio:
        fx = height * pose_ratio * fx / width
    else:
        fy = (width / pose_ratio) * fy / height
    fx, fy = fx * width, fy * height
    cxp, cyp = cx * width, cy * height

    j, i = np.meshgrid(np.arange(height, dtype=np.float64),
                       np.arange(width, dtype=np.float64), indexing="ij")
    i = i.reshape(-1) + 0.5
    j = j.reshape(-1) + 0.5
    xs = (i[None] - cxp[:, None]) / fx[:, None]
    ys = (j[None] - cyp[:, None]) / fy[:, None]
    zs = np.ones_like(xs)
    d = np.stack([xs, ys, zs], axis=-1)                    # (V, HW, 3)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    rays_d = np.einsum("vpj,vkj->vpk", d, c2w[:, :3, :3])
    rays_o = np.broadcast_to(c2w[:, None, :3, 3], rays_d.shape)
    dxo = np.cross(rays_o, rays_d)
    plucker = np.concatenate([dxo, rays_d], axis=-1)
    return plucker.reshape(len(entries), height, width, 6).astype(np.float32)


def camera_control_embedding(direction: str, length: int, height: int,
                             width: int, speed: float = 1 / 54,
                             origin=DEFAULT_ORIGIN) -> np.ndarray:
    """SimpleAdapter.process_camera_coordinates (:46-59)."""
    coords = generate_camera_coordinates(direction, length, speed, origin)
    return plucker_embedding(coords, width, height)


# ---------------------------------------------------------------------------
# SimpleAdapter
# ---------------------------------------------------------------------------

def _pixel_unshuffle(x, factor):
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    # torch PixelUnshuffle channel order: (c, fh, fw)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


def simple_adapter_apply(params: Dict, x: jnp.ndarray,
                         stride: int) -> jnp.ndarray:
    """(V, H, W, C) control frames -> (V, H', W', out_dim) features
    (reference SimpleAdapter.forward :24-44, frames as batch)."""
    x = _pixel_unshuffle(x, 8)
    x = jax.lax.conv_general_dilated(
        x, params["conv"]["w"].astype(x.dtype), (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["conv"]["b"]
    for blk in params["res_blocks"]:
        h = jax.nn.relu(jax.lax.conv_general_dilated(
            jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)]),
            blk["conv1"]["w"].astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + blk["conv1"]["b"])
        h = jax.lax.conv_general_dilated(
            jnp.pad(h, [(0, 0), (1, 1), (1, 1), (0, 0)]),
            blk["conv2"]["w"].astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + blk["conv2"]["b"]
        x = x + h
    return x


def init_simple_adapter(key, out_dim: int, in_dim: int = 24, kernel: int = 2,
                        num_residual_blocks: int = 1, dtype=jnp.float32) -> Dict:
    """Random SimpleAdapter params (reference wan_video_camera_controller.py:12-23:
    conv after PixelUnshuffle(8) so its input channels are in_dim*64)."""
    ks = jax.random.split(key, 1 + 2 * num_residual_blocks)

    def conv(k, kh, kw, ci, co):
        s = 1.0 / np.sqrt(ci * kh * kw)
        return {"w": jax.random.uniform(k, (kh, kw, ci, co), dtype, -s, s),
                "b": jnp.zeros((co,), dtype)}

    blocks = [{"conv1": conv(ks[1 + 2 * i], 3, 3, out_dim, out_dim),
               "conv2": conv(ks[2 + 2 * i], 3, 3, out_dim, out_dim)}
              for i in range(num_residual_blocks)]
    return {"conv": conv(ks[0], kernel, kernel, in_dim * 64, out_dim),
            "res_blocks": blocks}


def simple_adapter_params_from_torch(sd) -> Dict:
    g = lambda k: np.asarray(sd[k])
    c = lambda pre: {"w": jnp.asarray(g(pre + ".weight").transpose(2, 3, 1, 0)),
                     "b": jnp.asarray(g(pre + ".bias"))}
    blocks = []
    i = 0
    while f"residual_blocks.{i}.conv1.weight" in sd:
        blocks.append({"conv1": c(f"residual_blocks.{i}.conv1"),
                       "conv2": c(f"residual_blocks.{i}.conv2")})
        i += 1
    return {"conv": c("conv"), "res_blocks": blocks}
