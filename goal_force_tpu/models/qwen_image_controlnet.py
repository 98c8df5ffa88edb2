"""Qwen-Image blockwise ControlNet.

Reference /root/reference/diffsynth/models/qwen_image_controlnet.py: the
control image latents pass through img_in once (:53-54); after every DiT block
the image stream receives output_proj(gelu(input_proj(rms(img) + rms(cond))))
(:7-22, one BlockWiseControlBlock per DiT layer; zero-init output)."""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class QwenImageControlNetConfig:
    num_layers: int = 60
    in_dim: int = 64
    additional_in_dim: int = 0
    dim: int = 3072
    eps: float = 1e-6


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return (n * w).astype(x.dtype)


def qwen_cn_process_conditioning(params: Dict, cond_tokens: jnp.ndarray
                                 ) -> jnp.ndarray:
    """Patchified control latents (B, S, in_dim) -> (B, S, dim) (:53-54)."""
    return cond_tokens @ params["img_in"]["w"] + params["img_in"]["b"]


def qwen_cn_block(params: Dict, block_id: int, img: jnp.ndarray,
                  cond: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Residual for one DiT block (:17-22); caller adds it to the image
    stream."""
    p = jax.tree_util.tree_map(lambda a: a[block_id], params["blocks"])
    return qwen_cn_block_p(p, img, cond, eps)


def qwen_cn_block_p(p: Dict, img: jnp.ndarray, cond: jnp.ndarray,
                    eps: float = 1e-6) -> jnp.ndarray:
    x = _rms(img, p["x_rms"]["w"], eps)
    y = _rms(cond, p["y_rms"]["w"], eps)
    h = (x + y) @ p["in"]["w"] + p["in"]["b"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ p["out"]["w"] + p["out"]["b"]


def init_qwen_image_controlnet(key, cfg: QwenImageControlNetConfig,
                               dtype=jnp.bfloat16) -> Dict:
    ks = jax.random.split(key, cfg.num_layers + 1)

    def block(k):
        return {
            "x_rms": {"w": jnp.ones((cfg.dim,), dtype)},
            "y_rms": {"w": jnp.ones((cfg.dim,), dtype)},
            "in": {"w": jax.random.normal(k, (cfg.dim, cfg.dim), dtype) * 0.02,
                   "b": jnp.zeros((cfg.dim,), dtype)},
            "out": {"w": jnp.zeros((cfg.dim, cfg.dim), dtype),
                    "b": jnp.zeros((cfg.dim,), dtype)},
        }

    blocks = [block(k) for k in ks[:cfg.num_layers]]
    return {
        "img_in": {"w": jax.random.normal(
            ks[-1], (cfg.in_dim + cfg.additional_in_dim, cfg.dim),
            dtype) * 0.02,
            "b": jnp.zeros((cfg.dim,), dtype)},
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
    }


def qwen_image_controlnet_params_from_torch(
        sd, cfg: QwenImageControlNetConfig) -> Dict:
    g = lambda k: np.asarray(sd[k])

    def block(i):
        pre = f"controlnet_blocks.{i}"
        return {
            "x_rms": {"w": g(pre + ".x_rms.weight")},
            "y_rms": {"w": g(pre + ".y_rms.weight")},
            "in": {"w": g(pre + ".input_proj.weight").T,
                   "b": g(pre + ".input_proj.bias")},
            "out": {"w": g(pre + ".output_proj.weight").T,
                    "b": g(pre + ".output_proj.bias")},
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    return {
        "img_in": {"w": g("img_in.weight").T, "b": g("img_in.bias")},
        "blocks": jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *blocks),
    }
