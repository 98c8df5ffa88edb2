"""SD-1.5 ControlNet and SDXL ControlNet-Union on the shared block-plan machinery.

Parity targets:
  - SDControlNet (/root/reference/diffsynth/models/sd_controlnet.py:25-141): the SD
    UNet's down+mid half with a conditioning conv stack added to conv_in and one
    1x1 "controlnet block" conv per residual-stack entry.
  - SDXLControlNetUnion (/root/reference/diffsynth/models/sdxl_controlnet.py:43-219):
    same shape over the SDXL down+mid half, plus the union-control machinery — task
    embedding, a 2-token ResidualAttentionBlock fusing conditioning and latent
    means, control-type embedding added to the time embedding.

The residuals are consumed by the UNet at the end of its down+mid phase
(reference dancer.py:102-107 / :227-229): hidden += res[-1] and each remaining
stack entry += res[i] — sd_unet_apply / sdxl_unet_apply take them as
`controlnet_res`.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.sd_unet import (
    BlockSpec,
    _attn_block,
    _conv,
    _norm,
    _resnet,
    conv2d,
    group_norm,
    layer_norm,
    timestep_embedding,
)

# SDControlNet block list (reference sd_controlnet.py:38-77): SD UNet down stages
# + mid, each residual push mirrored.
SD_CONTROLNET_PLAN: Tuple[BlockSpec, ...] = (
    ("res", 320, 320), ("attn", 8, 40, 320, 768), ("push",),
    ("res", 320, 320), ("attn", 8, 40, 320, 768), ("push",),
    ("down", 320), ("push",),
    ("res", 320, 640), ("attn", 8, 80, 640, 768), ("push",),
    ("res", 640, 640), ("attn", 8, 80, 640, 768), ("push",),
    ("down", 640), ("push",),
    ("res", 640, 1280), ("attn", 8, 160, 1280, 768), ("push",),
    ("res", 1280, 1280), ("attn", 8, 160, 1280, 768), ("push",),
    ("down", 1280), ("push",),
    ("res", 1280, 1280), ("push",),
    ("res", 1280, 1280), ("push",),
    ("res", 1280, 1280), ("attn", 8, 160, 1280, 768), ("res", 1280, 1280),
    ("push",),
)

# SDXLControlNetUnion block list (reference sdxl_controlnet.py:72-100).
SDXL_CONTROLNET_PLAN: Tuple[BlockSpec, ...] = (
    ("res", 320, 320), ("push",),
    ("res", 320, 320), ("push",),
    ("down", 320), ("push",),
    ("res", 320, 640), ("attn", 10, 64, 640, 2048, 2), ("push",),
    ("res", 640, 640), ("attn", 10, 64, 640, 2048, 2), ("push",),
    ("down", 640), ("push",),
    ("res", 640, 1280), ("attn", 20, 64, 1280, 2048, 10), ("push",),
    ("res", 1280, 1280), ("attn", 20, 64, 1280, 2048, 10), ("push",),
    ("res", 1280, 1280), ("attn", 20, 64, 1280, 2048, 10), ("res", 1280, 1280),
    ("push",),
)

SDXL_UNION_TASK_ID = {
    "openpose": 0, "depth": 1, "softedge": 2, "canny": 3,
    "lineart": 3, "lineart_anime": 3, "tile": 6, "inpaint": 7,
}


def cond_layer_apply(p: Dict, image: jnp.ndarray) -> jnp.ndarray:
    """ControlNetConditioningLayer (reference sd_controlnet.py:6-22):
    conv-silu pyramid from the (B, H, W, 3) condition image to latent resolution."""
    convs = p["convs"]
    x = jax.nn.silu(conv2d(convs[0], image))
    for i in range(1, len(convs) - 1, 2):
        x = jax.nn.silu(conv2d(convs[i], x))
        x = jax.nn.silu(conv2d(convs[i + 1], x, stride=2, padding=((1, 1), (1, 1))))
    return conv2d(convs[-1], x)


def _run_controlnet_plan(params, plan, x, temb, text_emb, groups,
                         tile_ctx=None, ctx_len=None):
    stack: List[jnp.ndarray] = [x]
    for spec, p in zip(plan, params["blocks"]):
        kind = spec[0]
        if kind == "res":
            x = _resnet(p, x, temb, groups)
        elif kind == "attn":
            x = _attn_block(p, x, text_emb, num_heads=spec[1], groups=groups,
                            tile_ctx=tile_ctx, ctx_len=ctx_len)
        elif kind == "push":
            stack.append(x)
        elif kind == "down":
            x = conv2d(p["conv"], x, stride=2, padding=((1, 1), (1, 1)))
        else:
            raise ValueError(spec)
    return stack


def sd_controlnet_apply(
    params: Dict,
    sample: jnp.ndarray,          # (B, H, W, 4) latents
    timestep: jnp.ndarray,        # (B,) or ()
    text_emb: jnp.ndarray,        # (B, 77, 768)
    cond_image: jnp.ndarray,      # (B, 8H, 8W, 3) condition pixels in [0, 1]
    plan: Sequence[BlockSpec] = SD_CONTROLNET_PLAN,
    groups: int = 32,
    global_pool: bool = False,
    tile_ctx=None,
    ctx_len=None,
) -> List[jnp.ndarray]:
    """Returns the 13 zero-conv residuals (reference SDControlNet.forward :96-141)."""
    temb = timestep_embedding(jnp.reshape(timestep, (-1,)),
                              params["conv_in"]["w"].shape[-1])
    temb = jax.nn.silu(temb.astype(sample.dtype) @ params["time_w1"]
                       + params["time_b1"])
    temb = temb @ params["time_w2"] + params["time_b2"]

    x = conv2d(params["conv_in"], sample) + cond_layer_apply(params["cond_in"],
                                                             cond_image)
    stack = _run_controlnet_plan(params, plan, x, temb, text_emb, groups,
                                 ctx_len=ctx_len)
    out = [conv2d(p, s) for p, s in zip(params["controlnet_blocks"], stack)]
    if global_pool:
        out = [o.mean(axis=(1, 2), keepdims=True) for o in out]
    return out


def init_sd_controlnet(key, plan: Sequence[BlockSpec] = SD_CONTROLNET_PLAN,
                       model_dim: int = 320, time_dim: int = 1280,
                       cond_channels: Sequence[int] = (3, 16, 32, 96, 256),
                       in_channels: int = 4, dtype=jnp.float32) -> Dict:
    """Random-init SDControlNet params (reference sd_controlnet.py:25-94):
    the UNet down+mid half plus the conditioning conv pyramid and ZERO-init
    1x1 controlnet blocks — so a fresh controlnet is an exact no-op until
    trained, like the reference's zero_module convs."""
    from goal_force_tpu.models.sd_unet import init_sd_unet

    ks = jax.random.split(key, 4 + 2 * len(cond_channels))
    n = lambda k, *s: jax.random.normal(k, s, dtype) * 0.02
    conv = lambda k, ci, co: {"w": n(k, 3, 3, ci, co),
                              "b": jnp.zeros((co,), dtype)}

    base = init_sd_unet(ks[0], plan, model_dim=model_dim, time_dim=time_dim,
                        in_channels=in_channels, dtype=dtype)

    ch = tuple(cond_channels) + (model_dim,)
    it = iter(ks[4:])
    convs = [conv(next(it), ch[0], ch[1])]
    for i in range(1, len(ch) - 2):
        convs.append(conv(next(it), ch[i], ch[i]))
        convs.append(conv(next(it), ch[i], ch[i + 1]))
    convs.append(conv(next(it), ch[-2], ch[-1]))

    # stack channels at each push: conv_in output + traced plan outputs
    widths, cur = [model_dim], model_dim
    for spec in plan:
        if spec[0] == "res":
            cur = spec[2]
        elif spec[0] == "attn":
            cur = spec[1] * spec[2]
        elif spec[0] == "push":
            widths.append(cur)
    zero = [{"w": jnp.zeros((1, 1, c, c), dtype),
             "b": jnp.zeros((c,), dtype)} for c in widths]

    return {
        "time_w1": base["time_w1"], "time_b1": base["time_b1"],
        "time_w2": base["time_w2"], "time_b2": base["time_b2"],
        "conv_in": base["conv_in"],
        "cond_in": {"convs": convs},
        "blocks": base["blocks"],
        "controlnet_blocks": zero,
    }


def init_sdxl_controlnet(key, plan: Sequence[BlockSpec] = SDXL_CONTROLNET_PLAN,
                         model_dim: int = 320, time_dim: int = 1280,
                         add_text_dim: int = 1280,
                         cond_channels: Sequence[int] = (3, 16, 32, 96, 256),
                         n_head: int = 8, dtype=jnp.float32) -> Dict:
    """Random-init SDXLControlNetUnion params (reference sdxl_controlnet.py:43-113)
    with ZERO-init 1x1 controlnet blocks, mirroring init_sd_controlnet."""
    ks = jax.random.split(key, 12)
    n = lambda k, *s: jax.random.normal(k, s, dtype) * 0.02
    base = init_sd_controlnet(ks[0], plan, model_dim=model_dim,
                              time_dim=time_dim, cond_channels=cond_channels,
                              dtype=dtype)
    d = model_dim
    base.update({
        "add_time_w1": n(ks[1], add_text_dim + 6 * 256, time_dim),
        "add_time_b1": jnp.zeros((time_dim,), dtype),
        "add_time_w2": n(ks[2], time_dim, time_dim),
        "add_time_b2": jnp.zeros((time_dim,), dtype),
        "ct_w1": n(ks[3], 8 * 256, time_dim),
        "ct_b1": jnp.zeros((time_dim,), dtype),
        "ct_w2": n(ks[4], time_dim, time_dim),
        "ct_b2": jnp.zeros((time_dim,), dtype),
        "task_embedding": n(ks[5], 8, d),
        "spatial_w": n(ks[6], d, d),
        "spatial_b": jnp.zeros((d,), dtype),
        "cn_transformer": {
            "n_head": n_head,
            "in_w": n(ks[7], 3 * d, d), "in_b": jnp.zeros((3 * d,), dtype),
            "out_w": n(ks[8], d, d), "out_b": jnp.zeros((d,), dtype),
            "ln1": {"scale": jnp.ones((d,), dtype),
                    "bias": jnp.zeros((d,), dtype)},
            "ln2": {"scale": jnp.ones((d,), dtype),
                    "bias": jnp.zeros((d,), dtype)},
            "fc_w": n(ks[9], 4 * d, d), "fc_b": jnp.zeros((4 * d,), dtype),
            "proj_w": n(ks[10], d, 4 * d), "proj_b": jnp.zeros((d,), dtype),
        },
    })
    return base


def _residual_attention(p, x):
    """Reference ResidualAttentionBlock (:17-42) incl. the torch
    nn.MultiheadAttention convention: attention runs over axis 0 of the
    (B, 2, D) input (batch_first=False)."""
    d = x.shape[-1]
    h = layer_norm(p["ln1"], x)
    qkv = h @ p["in_w"].T + p["in_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    n_head = p["n_head"]
    hd = d // n_head
    # axes: (seq=B, batch=2, D) -> per batch-entry attention over seq
    def heads(t):
        return t.reshape(t.shape[0], t.shape[1], n_head, hd)
    qh, kh, vh = heads(q), heads(k), heads(v)
    logits = jnp.einsum("sbnh,tbnh->bnst", qh, kh) / math.sqrt(hd)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    att = jnp.einsum("bnst,tbnh->sbnh", probs, vh).reshape(x.shape)
    x = x + (att @ p["out_w"].T + p["out_b"])
    h = layer_norm(p["ln2"], x)
    h = h @ p["fc_w"].T + p["fc_b"]
    h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
    return x + (h @ p["proj_w"].T + p["proj_b"])


def sdxl_controlnet_apply(
    params: Dict,
    sample: jnp.ndarray,           # (B, H, W, 4)
    timestep: jnp.ndarray,
    text_emb: jnp.ndarray,         # (B, 77, 2048)
    cond_image: jnp.ndarray,       # (B, 8H, 8W, 3)
    add_time_id: jnp.ndarray,      # (6,) or (B*6,)
    add_text_embeds: jnp.ndarray,  # (B, 1280)
    task_id: int = 3,
    plan: Sequence[BlockSpec] = SDXL_CONTROLNET_PLAN,
    groups: int = 32,
    global_pool: bool = False,
    tile_ctx=None,
    ctx_len=None,
) -> List[jnp.ndarray]:
    """SDXLControlNetUnion.forward (:151-219). Returns 10 zero-conv residuals."""
    b = sample.shape[0]
    temb = timestep_embedding(jnp.reshape(timestep, (-1,)),
                              params["conv_in"]["w"].shape[-1])
    temb = jax.nn.silu(temb.astype(sample.dtype) @ params["time_w1"]
                       + params["time_b1"])
    temb = temb @ params["time_w2"] + params["time_b2"]

    ids = timestep_embedding(add_time_id.reshape(-1), 256).reshape(b, -1)
    add = jnp.concatenate([add_text_embeds, ids.astype(add_text_embeds.dtype)], -1)
    add = jax.nn.silu(add.astype(sample.dtype) @ params["add_time_w1"]
                      + params["add_time_b1"])
    add = add @ params["add_time_w2"] + params["add_time_b2"]

    control_type = jnp.zeros((b, 8), sample.dtype).at[:, task_id].set(1.0)
    cemb = timestep_embedding(control_type.reshape(-1), 256).reshape(b, -1)
    cemb = jax.nn.silu(cemb.astype(sample.dtype) @ params["ct_w1"]
                       + params["ct_b1"])
    cemb = cemb @ params["ct_w2"] + params["ct_b2"]
    temb = temb + add + cemb

    # fuse_condition_to_input (:137-148)
    x = conv2d(params["conv_in"], sample)
    cond = cond_layer_apply(params["cond_in"], cond_image)
    feat_seq = cond.mean(axis=(1, 2)) + params["task_embedding"][task_id]
    tokens = jnp.stack([feat_seq, x.mean(axis=(1, 2))], axis=1)  # (B, 2, 320)
    tokens = _residual_attention(params["cn_transformer"], tokens)
    alpha = tokens[:, 0] @ params["spatial_w"].T + params["spatial_b"]
    x = x + (cond + alpha[:, None, None, :])

    stack = _run_controlnet_plan(params, plan, x, temb, text_emb, groups,
                                 tile_ctx=tile_ctx, ctx_len=ctx_len)
    out = [conv2d(p, s) for p, s in zip(params["controlnet_blocks"], stack)]
    if global_pool:
        out = [o.mean(axis=(1, 2), keepdims=True) for o in out]
    return out


# ---------------------------------------------------------------------------
# Converters (diffsynth-format state dicts)
# ---------------------------------------------------------------------------


def _plan_blocks_from_torch(sd, plan):
    from goal_force_tpu.models.sd_unet import sd_unet_params_from_torch

    # reuse the UNet converter's per-spec logic by wrapping the plan
    fake = dict(sd)
    fake.setdefault("time_embedding.0.weight", np.zeros((1, 1), np.float32))
    fake.setdefault("time_embedding.0.bias", np.zeros((1,), np.float32))
    fake.setdefault("time_embedding.2.weight", np.zeros((1, 1), np.float32))
    fake.setdefault("time_embedding.2.bias", np.zeros((1,), np.float32))
    fake.setdefault("conv_norm_out.weight", np.zeros((1,), np.float32))
    fake.setdefault("conv_norm_out.bias", np.zeros((1,), np.float32))
    fake.setdefault("conv_out.weight", np.zeros((1, 1, 1, 1), np.float32))
    fake.setdefault("conv_out.bias", np.zeros((1,), np.float32))
    return sd_unet_params_from_torch(fake, plan)["blocks"]


def sd_controlnet_params_from_torch(sd, plan=SD_CONTROLNET_PLAN) -> Dict:
    g = lambda k: np.asarray(sd[k])
    n_zero = sum(1 for s in plan if s[0] == "push") + 1

    def zero_conv(i):
        p = {"w": np.ascontiguousarray(np.transpose(
            g(f"controlnet_blocks.{i}.weight"), (2, 3, 1, 0)))}
        key = f"controlnet_blocks.{i}.bias"
        p["b"] = g(key) if key in sd else np.zeros(p["w"].shape[-1], p["w"].dtype)
        return p

    return {
        "time_w1": g("time_embedding.0.weight").T,
        "time_b1": g("time_embedding.0.bias"),
        "time_w2": g("time_embedding.2.weight").T,
        "time_b2": g("time_embedding.2.bias"),
        "conv_in": _conv(sd, "conv_in"),
        "cond_in": {"convs": [
            _conv(sd, f"controlnet_conv_in.blocks.{i}")
            for i in sorted({int(k.split(".")[2]) for k in sd
                             if k.startswith("controlnet_conv_in.blocks.")
                             and k.endswith(".weight")})]},
        "blocks": _plan_blocks_from_torch(sd, plan),
        "controlnet_blocks": [zero_conv(i) for i in range(n_zero)],
    }


def sdxl_controlnet_params_from_torch(sd, plan=SDXL_CONTROLNET_PLAN) -> Dict:
    g = lambda k: np.asarray(sd[k])
    n_zero = sum(1 for s in plan if s[0] == "push") + 1

    def zero_conv(i):
        p = {"w": np.ascontiguousarray(np.transpose(
            g(f"controlnet_blocks.{i}.weight"), (2, 3, 1, 0)))}
        key = f"controlnet_blocks.{i}.bias"
        p["b"] = g(key) if key in sd else np.zeros(p["w"].shape[-1], p["w"].dtype)
        return p

    in_w = g("controlnet_transformer.attn.in_proj_weight")
    n_head = 8
    return {
        "time_w1": g("time_embedding.0.weight").T,
        "time_b1": g("time_embedding.0.bias"),
        "time_w2": g("time_embedding.2.weight").T,
        "time_b2": g("time_embedding.2.bias"),
        "add_time_w1": g("add_time_embedding.0.weight").T,
        "add_time_b1": g("add_time_embedding.0.bias"),
        "add_time_w2": g("add_time_embedding.2.weight").T,
        "add_time_b2": g("add_time_embedding.2.bias"),
        "ct_w1": g("control_type_embedding.0.weight").T,
        "ct_b1": g("control_type_embedding.0.bias"),
        "ct_w2": g("control_type_embedding.2.weight").T,
        "ct_b2": g("control_type_embedding.2.bias"),
        "conv_in": _conv(sd, "conv_in"),
        "cond_in": {"convs": [
            _conv(sd, f"controlnet_conv_in.blocks.{i}")
            for i in sorted({int(k.split(".")[2]) for k in sd
                             if k.startswith("controlnet_conv_in.blocks.")
                             and k.endswith(".weight")})]},
        "cn_transformer": {
            "n_head": n_head,
            "in_w": in_w, "in_b": g("controlnet_transformer.attn.in_proj_bias"),
            "out_w": g("controlnet_transformer.attn.out_proj.weight"),
            "out_b": g("controlnet_transformer.attn.out_proj.bias"),
            "ln1": {"scale": g("controlnet_transformer.ln_1.weight"),
                    "bias": g("controlnet_transformer.ln_1.bias")},
            "ln2": {"scale": g("controlnet_transformer.ln_2.weight"),
                    "bias": g("controlnet_transformer.ln_2.bias")},
            "fc_w": g("controlnet_transformer.mlp.c_fc.weight"),
            "fc_b": g("controlnet_transformer.mlp.c_fc.bias"),
            "proj_w": g("controlnet_transformer.mlp.c_proj.weight"),
            "proj_b": g("controlnet_transformer.mlp.c_proj.bias"),
        },
        "task_embedding": g("task_embedding"),
        "spatial_w": g("spatial_ch_projs.weight"),
        "spatial_b": g("spatial_ch_projs.bias"),
        "blocks": _plan_blocks_from_torch(sd, plan),
        "controlnet_blocks": [zero_conv(i) for i in range(n_zero)],
    }
