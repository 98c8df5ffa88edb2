"""Wan adapter models: motion controller, VACE editing hints, camera control.

Parity targets:
  - WanMotionControllerModel (/root/reference/diffsynth/models/wan_video_motion_controller
    .py): motion_bucket_id*10 -> sinusoidal embed -> 3-layer SiLU MLP -> 6*dim t_mod offset.
  - VaceWanModel (/root/reference/diffsynth/models/wan_video_vace.py): a hint stack of
    DiT-block copies over selected layers; hint i is added to x after block vace_layers[i]
    scaled by vace_scale (injection at src/goal_force/wan_video_new.py:1572-1577).
  - Camera control adapter (SimpleAdapter,
    /root/reference/diffsynth/models/wan_video_camera_controller.py): Plücker-embedded
    camera rays -> 2D conv patch embed added to the DiT patch embedding.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.configs import WanDiTConfig
from goal_force_tpu.models.wan_dit import (
    dit_block,
    init_block,
    linear,
    patchify,
    sinusoidal_embedding,
)


# ---------------------------------------------------------------------------
# Motion controller
# ---------------------------------------------------------------------------

def motion_controller_apply(params: Dict, motion_bucket_id: jnp.ndarray, freq_dim: int = 256):
    """motion_bucket_id (B,) -> (B, 6*dim) t_mod offset."""
    emb = sinusoidal_embedding(freq_dim, motion_bucket_id * 10).astype(
        params["fc0"]["w"].dtype
    )
    h = jax.nn.silu(linear(params["fc0"], emb).astype(jnp.float32)).astype(emb.dtype)
    h = jax.nn.silu(linear(params["fc1"], h).astype(jnp.float32)).astype(emb.dtype)
    return linear(params["fc2"], h)


def init_motion_controller(key, freq_dim: int = 256, dim: int = 1536, dtype=jnp.float32):
    ks = jax.random.split(key, 3)

    def lin(k, i, o):
        s = 1 / math.sqrt(i)
        return {"w": jax.random.uniform(k, (i, o), dtype, -s, s), "b": jnp.zeros((o,), dtype)}

    p = {"fc0": lin(ks[0], freq_dim, dim), "fc1": lin(ks[1], dim, dim),
         "fc2": lin(ks[2], dim, dim * 6)}
    # reference zero-inits the last layer (init(), :24-27)
    p["fc2"]["w"] = jnp.zeros_like(p["fc2"]["w"])
    return p


def motion_controller_from_torch(sd) -> Dict:
    import numpy as _np

    def lin(i):
        return {"w": _np.ascontiguousarray(sd[f"linear.{i}.weight"].T),
                "b": sd[f"linear.{i}.bias"]}

    return {"fc0": lin(0), "fc1": lin(2), "fc2": lin(4)}


# ---------------------------------------------------------------------------
# VACE
# ---------------------------------------------------------------------------

VACE_LAYERS_14B = (0, 5, 10, 15, 20, 25, 30, 35)
VACE_LAYERS_1_3B = (0, 2, 4, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26, 28)


def vace_hints(
    params: Dict,
    dit_cfg: WanDiTConfig,
    x_tokens: jnp.ndarray,          # (B, S, D) main-stack tokens after patchify
    vace_context: jnp.ndarray,      # (B, F, H, W, vace_in_dim) channels-last
    context: jnp.ndarray,           # embedded text (B, L, D)
    t_mod: jnp.ndarray,
    rope_cos, rope_sin,
    vace_layers: Sequence[int] = VACE_LAYERS_14B,
) -> jnp.ndarray:
    """Returns stacked hints (n_vace, B, S, D); hint i is added after DiT block
    vace_layers[i] (reference VaceWanModel.forward)."""
    c, _ = patchify(params["patch_embedding"], vace_context, dit_cfg.patch_size)
    if c.shape[1] < x_tokens.shape[1]:
        pad = x_tokens.shape[1] - c.shape[1]
        c = jnp.concatenate([c, jnp.zeros((c.shape[0], pad, c.shape[2]), c.dtype)], axis=1)
    hints = []
    for i in range(len(vace_layers)):
        blk = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
        if i == 0:
            c = linear(params["before_proj"], c) + x_tokens
        c = dit_block(blk, c, context, t_mod, rope_cos, rope_sin, dit_cfg)
        hints.append(linear({"w": params["after_proj"]["w"][i],
                             "b": params["after_proj"]["b"][i]}, c))
    return jnp.stack(hints)


def apply_vace_hints(block_id: int, x, hints, vace_layers: Sequence[int], scale: float):
    """Add hint after the matching main-stack block (wan_video_new.py:1572-1577)."""
    mapping = {l: n for n, l in enumerate(vace_layers)}
    if block_id in mapping:
        return x + hints[mapping[block_id]].astype(x.dtype) * scale
    return x


def init_vace(key, dit_cfg: WanDiTConfig, vace_layers: Sequence[int] = VACE_LAYERS_14B,
              vace_in_dim: int = 96, dtype=jnp.float32) -> Dict:
    n = len(vace_layers)
    ks = jax.random.split(key, n + 3)
    blocks = [init_block(k, dit_cfg, dtype) for k in ks[:n]]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    patch_in = vace_in_dim * math.prod(dit_cfg.patch_size)
    s = 1 / math.sqrt(patch_in)
    return {
        "blocks": stacked,
        "patch_embedding": {
            "w": jax.random.uniform(ks[n], (patch_in, dit_cfg.dim), dtype, -s, s),
            "b": jnp.zeros((dit_cfg.dim,), dtype),
        },
        "before_proj": {
            "w": jax.random.uniform(ks[n + 1], (dit_cfg.dim, dit_cfg.dim), dtype,
                                    -1 / math.sqrt(dit_cfg.dim), 1 / math.sqrt(dit_cfg.dim)),
            "b": jnp.zeros((dit_cfg.dim,), dtype),
        },
        "after_proj": {
            "w": jnp.stack([
                jax.random.uniform(k, (dit_cfg.dim, dit_cfg.dim), dtype,
                                   -1 / math.sqrt(dit_cfg.dim), 1 / math.sqrt(dit_cfg.dim))
                for k in jax.random.split(ks[n + 2], n)
            ]),
            "b": jnp.zeros((n, dit_cfg.dim), dtype),
        },
    }


def vace_from_torch(sd, dit_cfg: WanDiTConfig, vace_layers: Sequence[int]) -> Dict:
    """Convert 'vace_blocks.*' / 'vace_patch_embedding.*' keys."""
    from goal_force_tpu.io.torch_convert import _block, patch_embed_from_conv3d

    n = len(vace_layers)
    blocks = [_block(sd, f"vace_blocks.{i}") for i in range(n)]
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *blocks)
    return {
        "patch_embedding": patch_embed_from_conv3d(
            sd["vace_patch_embedding.weight"], sd["vace_patch_embedding.bias"]
        ),
        "blocks": stacked,
        "before_proj": {"w": np.ascontiguousarray(sd["vace_blocks.0.before_proj.weight"].T),
                        "b": sd["vace_blocks.0.before_proj.bias"]},
        "after_proj": {
            "w": np.stack([np.ascontiguousarray(sd[f"vace_blocks.{i}.after_proj.weight"].T)
                           for i in range(n)]),
            "b": np.stack([sd[f"vace_blocks.{i}.after_proj.bias"] for i in range(n)]),
        },
    }


# ---------------------------------------------------------------------------
# Camera control (Plücker embedding + 2D patch adapter)
# ---------------------------------------------------------------------------

def plucker_rays(extrinsics: np.ndarray, fx, fy, cx, cy, height: int, width: int) -> np.ndarray:
    """Per-pixel Plücker embedding (o x d, d) -> (F, H, W, 6) for camera pose control
    (reference wan_video_camera_controller.py Camera/ray logic)."""
    f = extrinsics.shape[0]
    j, i = np.meshgrid(np.arange(height, dtype=np.float64),
                       np.arange(width, dtype=np.float64), indexing="ij")
    dirs = np.stack([(i + 0.5 - cx * width) / (fx * width),
                     (j + 0.5 - cy * height) / (fy * height),
                     np.ones_like(i)], -1)  # (H, W, 3)
    out = np.zeros((f, height, width, 6), np.float32)
    for t in range(f):
        c2w = extrinsics[t]
        R, T = c2w[:3, :3], c2w[:3, 3]
        d = dirs @ R.T
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(T, d.shape)
        out[t] = np.concatenate([np.cross(o, d), d], -1)
    return out


def camera_adapter_apply(params: Dict, control_camera_latents: jnp.ndarray,
                         patch_hw: Tuple[int, int] = (2, 2)) -> jnp.ndarray:
    """(B, F, H, W, C) camera embedding -> per-token additive features (B, S, D)
    (SimpleAdapter: 2D conv with kernel=stride=patch over each frame)."""
    b, f, hh, ww, c = control_camera_latents.shape
    ph, pw = patch_hw
    x = control_camera_latents.reshape(b, f, hh // ph, ph, ww // pw, pw, c)
    x = x.transpose(0, 1, 2, 4, 6, 3, 5).reshape(b, f * (hh // ph) * (ww // pw), c * ph * pw)
    return linear(params, x)
