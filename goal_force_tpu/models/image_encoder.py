"""CLIP image encoder (open-clip XLM-Roberta-CLIP ViT-H/14 vision tower).

Parity with WanImageEncoder.encode_image
(/root/reference/diffsynth/models/wan_video_image_encoder.py:852-886): bicubic resize to
224, CLIP normalization, ViT-H/14 (patch 14, dim 1280, 32 layers, 16 heads, GELU,
pre-norm, cls token), returning the FIRST 31 blocks' output (use_31_block) —
(B, 257, 1280) clip_context for I2V models that require it (the A14B flagship does not:
require_clip_embedding=False). Only the vision tower exists — the reference never calls
the text tower (textual=None at :719).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: int = 4
    num_heads: int = 16
    num_layers: int = 32
    use_blocks: int = 31      # use_31_block
    eps: float = 1e-5


VIT_H_14 = ViTConfig()


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * p["w"] + p["b"])


def _gelu(x):
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + jax.lax.erf(xf / math.sqrt(2.0)))).astype(x.dtype)


def _attn(p, x, num_heads):
    b, s, c = x.shape
    qkv = jnp.matmul(x, p["to_qkv"]["w"]) + p["to_qkv"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, num_heads, -1)
    k = k.reshape(b, s, num_heads, -1)
    v = v.reshape(b, s, num_heads, -1)
    logits = jnp.einsum("bsnh,btnh->bnst", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (q.shape[-1] ** -0.5), axis=-1).astype(x.dtype)
    out = jnp.einsum("bnst,btnh->bsnh", probs, v).reshape(b, s, c)
    return jnp.matmul(out, p["proj"]["w"]) + p["proj"]["b"]


def vit_encode(params: Dict, cfg: ViTConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images: (B, 224, 224, 3) CLIP-normalized -> (B, 257, dim) after use_blocks blocks."""
    b, hh, ww, _ = images.shape
    p = cfg.patch_size
    x = images.reshape(b, hh // p, p, ww // p, p, 3)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, (hh // p) * (ww // p), 3 * p * p)
    x = jnp.matmul(x, params["patch_embedding"]["w"])  # pre_norm => no conv bias
    cls = jnp.broadcast_to(params["cls_embedding"].astype(x.dtype), (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embedding"].astype(x.dtype)
    x = _ln(params["pre_norm"], x, cfg.eps)

    def body(carry, blk):
        h = carry + _attn(blk["attn"], _ln(blk["norm1"], carry, cfg.eps), cfg.num_heads)
        m = _ln(blk["norm2"], h, cfg.eps)
        m = jnp.matmul(_gelu(jnp.matmul(m, blk["mlp_fc1"]["w"]) + blk["mlp_fc1"]["b"]),
                       blk["mlp_fc2"]["w"]) + blk["mlp_fc2"]["b"]
        return h + m, None

    blocks = jax.tree_util.tree_map(lambda a: a[: cfg.use_blocks], params["blocks"])
    x, _ = jax.lax.scan(body, x, blocks)
    return x


def preprocess_image(image: np.ndarray, size: int = 224) -> np.ndarray:
    """(H, W, 3) float [0,1] -> (224, 224, 3) CLIP-normalized (bicubic, reference :866-875;
    input there is [-1,1] mapped back to [0,1] before normalize — we take [0,1] directly)."""
    import cv2

    img = cv2.resize(image.astype(np.float32), (size, size), interpolation=cv2.INTER_CUBIC)
    return (img - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)


def encode_image(params: Dict, image: np.ndarray, cfg: ViTConfig = VIT_H_14) -> jnp.ndarray:
    """(H, W, 3) float [0,1] -> clip_context (1, 257, dim)."""
    x = jnp.asarray(preprocess_image(image, cfg.image_size))[None]
    return vit_encode(params, cfg, x.astype(params["pos_embedding"].dtype))


def vit_params_from_torch(sd, cfg: ViTConfig = VIT_H_14) -> Dict:
    """Keys under 'model.visual.' (WanImageEncoder state dict)."""
    pre = "model.visual." if any(k.startswith("model.visual.") for k in sd) else "visual."

    def lin(name):
        return {"w": np.ascontiguousarray(sd[pre + name + ".weight"].T),
                "b": sd[pre + name + ".bias"]}

    def norm(name):
        return {"w": sd[pre + name + ".weight"], "b": sd[pre + name + ".bias"]}

    def block(i):
        base = f"transformer.{i}"
        return {
            "norm1": norm(f"{base}.norm1"),
            "attn": {"to_qkv": lin(f"{base}.attn.to_qkv"), "proj": lin(f"{base}.attn.proj")},
            "norm2": norm(f"{base}.norm2"),
            "mlp_fc1": lin(f"{base}.mlp.0"),
            "mlp_fc2": lin(f"{base}.mlp.2"),
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *blocks)
    pe = sd[pre + "patch_embedding.weight"]  # (dim, 3, p, p), no bias (pre_norm)
    return {
        # feature order (c, dy, dx) must match our patch flatten order
        "patch_embedding": {"w": np.ascontiguousarray(pe.reshape(pe.shape[0], -1).T)},
        "cls_embedding": sd[pre + "cls_embedding"][0],     # (1, dim)
        "pos_embedding": sd[pre + "pos_embedding"][0],     # (257, dim)
        "pre_norm": norm("pre_norm"),
        "blocks": stacked,
    }


def init_vit(key, cfg: ViTConfig = VIT_H_14, dtype=jnp.float32) -> Dict:
    gain = 1.0 / math.sqrt(cfg.dim)
    ks = jax.random.split(key, cfg.num_layers + 3)

    def lin(k, i, o):
        s = 1 / math.sqrt(i)
        return {"w": jax.random.uniform(k, (i, o), dtype, -s, s), "b": jnp.zeros((o,), dtype)}

    def block(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            "norm1": {"w": jnp.ones((cfg.dim,), dtype), "b": jnp.zeros((cfg.dim,), dtype)},
            "attn": {"to_qkv": lin(k1, cfg.dim, cfg.dim * 3), "proj": lin(k2, cfg.dim, cfg.dim)},
            "norm2": {"w": jnp.ones((cfg.dim,), dtype), "b": jnp.zeros((cfg.dim,), dtype)},
            "mlp_fc1": lin(k3, cfg.dim, cfg.dim * cfg.mlp_ratio),
            "mlp_fc2": lin(k4, cfg.dim * cfg.mlp_ratio, cfg.dim),
        }

    n_tok = (cfg.image_size // cfg.patch_size) ** 2 + 1
    blocks = [block(k) for k in ks[: cfg.num_layers]]
    return {
        "patch_embedding": {
            "w": jax.random.normal(ks[-3], (3 * cfg.patch_size**2, cfg.dim), dtype) * gain
        },
        "cls_embedding": jax.random.normal(ks[-2], (1, cfg.dim), dtype) * gain,
        "pos_embedding": jax.random.normal(ks[-1], (n_tok, cfg.dim), dtype) * gain,
        "pre_norm": {"w": jnp.ones((cfg.dim,), dtype), "b": jnp.zeros((cfg.dim,), dtype)},
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
    }
