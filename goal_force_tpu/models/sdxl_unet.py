"""SDXL UNet (2.6B) on the shared block-plan machinery, NHWC.

Reference: diffsynth/models/sdxl_unet.py:129-260. Differences from SD-1.5 are
pure data + one embedding path: a different 60-entry plan (no 8x level,
transformer depth 2 at 640ch and 10 at 1280ch, context dim 2048 = concat of
CLIP-L and OpenCLIP-bigG token states), and the conditioning embedding
time_emb = time_embedding(sinusoid(t))
         + add_time_embedding(cat([pooled_text(1280),
                                   sinusoid_256(add_time_ids).flat(1536)]))
(reference: sdxl_unet.py:263-279). Everything else — blocks, converters,
civitai/LDM prefix derivation — comes from models/sd_unet.py unchanged.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.sd_unet import (
    BlockSpec,
    _attn_block,
    _resnet,
    conv2d,
    group_norm,
    init_sd_unet,
    sd_unet_params_from_civitai,
    sd_unet_params_from_torch,
    timestep_embedding,
)

SDXL_CTX_DIM = 2048
SDXL_TIME_DIM = 1280
SDXL_ADD_EMBED_IN = 2816  # 1280 pooled text + 6 * 256 sinusoid ids

SDXL_PLAN: Tuple[BlockSpec, ...] = (
    # DownBlock2D
    ("res", 320, 320), ("push",), ("res", 320, 320), ("push",),
    ("down", 320), ("push",),
    # CrossAttnDownBlock2D (depth 2)
    ("res", 320, 640), ("attn", 10, 64, 640, 2048, 2), ("push",),
    ("res", 640, 640), ("attn", 10, 64, 640, 2048, 2), ("push",),
    ("down", 640), ("push",),
    # CrossAttnDownBlock2D (depth 10)
    ("res", 640, 1280), ("attn", 20, 64, 1280, 2048, 10), ("push",),
    ("res", 1280, 1280), ("attn", 20, 64, 1280, 2048, 10), ("push",),
    # mid
    ("res", 1280, 1280), ("attn", 20, 64, 1280, 2048, 10), ("res", 1280, 1280),
    # CrossAttnUpBlock2D (depth 10)
    ("pop",), ("res", 2560, 1280), ("attn", 20, 64, 1280, 2048, 10),
    ("pop",), ("res", 2560, 1280), ("attn", 20, 64, 1280, 2048, 10),
    ("pop",), ("res", 1920, 1280), ("attn", 20, 64, 1280, 2048, 10),
    ("up", 1280),
    # CrossAttnUpBlock2D (depth 2)
    ("pop",), ("res", 1920, 640), ("attn", 10, 64, 640, 2048, 2),
    ("pop",), ("res", 1280, 640), ("attn", 10, 64, 640, 2048, 2),
    ("pop",), ("res", 960, 640), ("attn", 10, 64, 640, 2048, 2),
    ("up", 640),
    # UpBlock2D
    ("pop",), ("res", 960, 320),
    ("pop",), ("res", 640, 320),
    ("pop",), ("res", 640, 320),
)


def sdxl_unet_apply(params: Dict, plan: Sequence[BlockSpec],
                    sample: jnp.ndarray, timestep: jnp.ndarray,
                    text_emb: jnp.ndarray, add_time_id: jnp.ndarray,
                    add_text_embeds: jnp.ndarray,
                    groups: int = 32,
                    controlnet_res=None,
                    ipadapter: Dict = None,
                    motion: Dict = None,
                    video_batch: int = 1,
                    cross_frame_attention: bool = False,
                    tile_ctx=None,
                    ctx_len=None) -> jnp.ndarray:
    """sample (B, H, W, 4), timestep (B,), text_emb (B, S, 2048),
    add_time_id (6,) or (B*6,), add_text_embeds (B, 1280) -> (B, H, W, 4).

    Kolors checkpoints carry a text_intermediate_proj (4096 ChatGLM hidden ->
    2048) applied to the text states (reference sdxl_unet.py:21,110);
    controlnet_res follows the dancer.py injection contract (:227-229)."""
    b = sample.shape[0]
    if "text_intermediate_proj" in params:
        text_emb = text_emb @ params["text_intermediate_proj"]["w"] \
            + params["text_intermediate_proj"]["b"]
    temb = timestep_embedding(timestep, params["conv_in"]["w"].shape[-1])
    temb = jax.nn.silu(temb.astype(sample.dtype) @ params["time_w1"]
                       + params["time_b1"])
    temb = temb @ params["time_w2"] + params["time_b2"]
    ids = timestep_embedding(add_time_id.reshape(-1), 256).reshape(b, -1)
    add = jnp.concatenate([add_text_embeds, ids.astype(sample.dtype)], axis=-1)
    add = jax.nn.silu(add.astype(sample.dtype) @ params["add_time_w1"]
                      + params["add_time_b1"])
    temb = temb + (add @ params["add_time_w2"] + params["add_time_b2"])

    x = conv2d(params["conv_in"], sample)
    stack: List[jnp.ndarray] = [x]
    cn_applied = controlnet_res is None
    for i, (spec, p) in enumerate(zip(plan, params["blocks"])):
        kind = spec[0]
        if kind == "pop" and not cn_applied:
            x = x + controlnet_res[-1].astype(x.dtype)
            stack = [s_ + r.astype(s_.dtype)
                     for s_, r in zip(stack, controlnet_res[:-1])] \
                + stack[len(controlnet_res) - 1:]
            cn_applied = True
        if kind == "res":
            x = _resnet(p, x, temb, groups)
        elif kind == "attn":
            x = _attn_block(p, x, text_emb, num_heads=spec[1], groups=groups,
                            ip=None if ipadapter is None else ipadapter.get(i),
                            cross_frame=cross_frame_attention,
                            tile_ctx=tile_ctx, ctx_len=ctx_len)
        elif kind == "push":
            stack.append(x)
        elif kind == "pop":
            x = jnp.concatenate([x, stack.pop()], axis=-1)
        elif kind == "down":
            x = conv2d(p["conv"], x, stride=2, padding=((1, 1), (1, 1)))
        elif kind == "up":
            bb, h, w, c = x.shape
            x = jax.image.resize(x, (bb, 2 * h, 2 * w, c), "nearest")
            x = conv2d(p["conv"], x)
        if motion is not None and i in motion["call"]:
            from goal_force_tpu.models.sd_motion import temporal_block_apply

            x = temporal_block_apply(motion["modules"][motion["call"][i]], x,
                                     groups=groups, video_batch=video_batch)
    x = jax.nn.silu(group_norm(params["conv_norm_out"], x, groups))
    return conv2d(params["conv_out"], x)


def _add_embedding_from_torch(sd, params: Dict, g) -> Dict:
    params["add_time_w1"] = g("add_time_embedding.0.weight").T
    params["add_time_b1"] = g("add_time_embedding.0.bias")
    params["add_time_w2"] = g("add_time_embedding.2.weight").T
    params["add_time_b2"] = g("add_time_embedding.2.bias")
    return params


def sdxl_unet_params_from_torch(sd, plan: Sequence[BlockSpec] = SDXL_PLAN) -> Dict:
    """diffsynth-format SDXLUNet state dict (reference: sdxl_unet.py). Kolors
    variants carry text_intermediate_proj (ChatGLM 4096 -> 2048)."""
    params = sd_unet_params_from_torch(sd, plan)
    params = _add_embedding_from_torch(sd, params, lambda k: np.asarray(sd[k]))
    if "text_intermediate_proj.weight" in sd:
        params["text_intermediate_proj"] = {
            "w": np.asarray(sd["text_intermediate_proj.weight"]).T,
            "b": np.asarray(sd["text_intermediate_proj.bias"]),
        }
    return params


def sdxl_unet_params_from_civitai(sd, plan: Sequence[BlockSpec] = SDXL_PLAN) -> Dict:
    """LDM/civitai SDXL checkpoint; the add embedding lives at
    `model.diffusion_model.label_emb.0.{0,2}`."""
    params = sd_unet_params_from_civitai(sd, plan)
    pre = "model.diffusion_model." if any(
        k.startswith("model.diffusion_model.") for k in sd) else ""
    g = lambda k: np.asarray(sd[pre + k])
    params["add_time_w1"] = g("label_emb.0.0.weight").T
    params["add_time_b1"] = g("label_emb.0.0.bias")
    params["add_time_w2"] = g("label_emb.0.2.weight").T
    params["add_time_b2"] = g("label_emb.0.2.bias")
    return params


def init_sdxl_unet(key, plan: Sequence[BlockSpec] = SDXL_PLAN,
                   model_dim: int = 320, time_dim: int = SDXL_TIME_DIM,
                   add_embed_in: int = SDXL_ADD_EMBED_IN,
                   dtype=jnp.float32) -> Dict:
    k0, k1 = jax.random.split(key)
    params = init_sd_unet(k0, plan, model_dim=model_dim, time_dim=time_dim,
                          dtype=dtype)
    ka, kb = jax.random.split(k1)
    params["add_time_w1"] = jax.random.normal(
        ka, (add_embed_in, time_dim), dtype) * 0.02
    params["add_time_b1"] = jnp.zeros(time_dim, dtype)
    params["add_time_w2"] = jax.random.normal(
        kb, (time_dim, time_dim), dtype) * 0.02
    params["add_time_b2"] = jnp.zeros(time_dim, dtype)
    return params
