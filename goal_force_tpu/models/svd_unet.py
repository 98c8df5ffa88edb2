"""Stable Video Diffusion UNet (spatio-temporal), JAX / NHWC.

Architecture parity with /root/reference/diffsynth/models/svd_unet.py:
TemporalResnetBlock (:6-38, (3,1,1) conv over the frame axis), TemporalTimesteps
(:87-107), TemporalAttentionBlock (:145-221, per-pixel frame-axis transformer with
sinusoidal frame embeddings, GEGLU in/out FFs, cross-attn to the single CLIP image
token), PopMixBlock (:224-244, sigmoid-gated mix with the residual stack — the
proj variant pops TWICE), SVDUNet (:245-424, the 180-block spatio-temporal plan).

Same declarative block-plan style as models/sd_unet.py with four new kinds:
  ("tres", ci, co, eps)         temporal resnet
  ("tattn", heads, hd, ch, ctx) temporal attention
  ("popmix",) / ("popmix", ch)  gated mix (ch => +proj, pops twice)
  ("attn", heads, hd, ch, ctx, depth, eps, False) spatial attention WITHOUT
                                proj_out/residual (need_proj_out=False, :126-208)

The frame axis is the leading (batch) axis: sample (T, H, W, 8) — SVD conditions
by channel-concat of the first-frame latents (4+4).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

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

SVD_PLAN: Tuple[BlockSpec, ...] = tuple(
    # transcribed from reference SVDUNet.__init__ (:262-352)
    [
        # CrossAttnDownBlockSpatioTemporal (320)
        ("res", 320, 320, 1e-6), ("push",), ("tres", 320, 320, 1e-6), ("popmix",), ("push",),
        ("attn_np", 5, 64, 320, 1024), ("push",), ("tattn", 5, 64, 320, 1024), ("popmix", 320), ("push",),
        ("res", 320, 320, 1e-6), ("push",), ("tres", 320, 320, 1e-6), ("popmix",), ("push",),
        ("attn_np", 5, 64, 320, 1024), ("push",), ("tattn", 5, 64, 320, 1024), ("popmix", 320), ("push",),
        ("down", 320), ("push",),
        # CrossAttnDownBlockSpatioTemporal (640)
        ("res", 320, 640, 1e-6), ("push",), ("tres", 640, 640, 1e-6), ("popmix",), ("push",),
        ("attn_np", 10, 64, 640, 1024), ("push",), ("tattn", 10, 64, 640, 1024), ("popmix", 640), ("push",),
        ("res", 640, 640, 1e-6), ("push",), ("tres", 640, 640, 1e-6), ("popmix",), ("push",),
        ("attn_np", 10, 64, 640, 1024), ("push",), ("tattn", 10, 64, 640, 1024), ("popmix", 640), ("push",),
        ("down", 640), ("push",),
        # CrossAttnDownBlockSpatioTemporal (1280)
        ("res", 640, 1280, 1e-6), ("push",), ("tres", 1280, 1280, 1e-6), ("popmix",), ("push",),
        ("attn_np", 20, 64, 1280, 1024), ("push",), ("tattn", 20, 64, 1280, 1024), ("popmix", 1280), ("push",),
        ("res", 1280, 1280, 1e-6), ("push",), ("tres", 1280, 1280, 1e-6), ("popmix",), ("push",),
        ("attn_np", 20, 64, 1280, 1024), ("push",), ("tattn", 20, 64, 1280, 1024), ("popmix", 1280), ("push",),
        ("down", 1280), ("push",),
        # DownBlockSpatioTemporal
        ("res", 1280, 1280, 1e-5), ("push",), ("tres", 1280, 1280, 1e-5), ("popmix",), ("push",),
        ("res", 1280, 1280, 1e-5), ("push",), ("tres", 1280, 1280, 1e-5), ("popmix",), ("push",),
        # UNetMidBlockSpatioTemporal
        ("res", 1280, 1280, 1e-5), ("push",), ("tres", 1280, 1280, 1e-5), ("popmix",), ("push",),
        ("attn_np", 20, 64, 1280, 1024), ("push",), ("tattn", 20, 64, 1280, 1024), ("popmix", 1280),
        ("res", 1280, 1280, 1e-5), ("push",), ("tres", 1280, 1280, 1e-5), ("popmix",),
        # UpBlockSpatioTemporal
        ("pop",), ("res", 2560, 1280, 1e-6), ("push",), ("tres", 1280, 1280, 1e-5), ("popmix",),
        ("pop",), ("res", 2560, 1280, 1e-6), ("push",), ("tres", 1280, 1280, 1e-5), ("popmix",),
        ("pop",), ("res", 2560, 1280, 1e-6), ("push",), ("tres", 1280, 1280, 1e-5), ("popmix",),
        ("up", 1280),
        # CrossAttnUpBlockSpatioTemporal (1280)
        ("pop",), ("res", 2560, 1280, 1e-6), ("push",), ("tres", 1280, 1280, 1e-6), ("popmix",), ("push",),
        ("attn_np", 20, 64, 1280, 1024), ("push",), ("tattn", 20, 64, 1280, 1024), ("popmix", 1280),
        ("pop",), ("res", 2560, 1280, 1e-6), ("push",), ("tres", 1280, 1280, 1e-6), ("popmix",), ("push",),
        ("attn_np", 20, 64, 1280, 1024), ("push",), ("tattn", 20, 64, 1280, 1024), ("popmix", 1280),
        ("pop",), ("res", 1920, 1280, 1e-6), ("push",), ("tres", 1280, 1280, 1e-6), ("popmix",), ("push",),
        ("attn_np", 20, 64, 1280, 1024), ("push",), ("tattn", 20, 64, 1280, 1024), ("popmix", 1280),
        ("up", 1280),
        # CrossAttnUpBlockSpatioTemporal (640)
        ("pop",), ("res", 1920, 640, 1e-6), ("push",), ("tres", 640, 640, 1e-6), ("popmix",), ("push",),
        ("attn_np", 10, 64, 640, 1024), ("push",), ("tattn", 10, 64, 640, 1024), ("popmix", 640),
        ("pop",), ("res", 1280, 640, 1e-6), ("push",), ("tres", 640, 640, 1e-6), ("popmix",), ("push",),
        ("attn_np", 10, 64, 640, 1024), ("push",), ("tattn", 10, 64, 640, 1024), ("popmix", 640),
        ("pop",), ("res", 960, 640, 1e-6), ("push",), ("tres", 640, 640, 1e-6), ("popmix",), ("push",),
        ("attn_np", 10, 64, 640, 1024), ("push",), ("tattn", 10, 64, 640, 1024), ("popmix", 640),
        ("up", 640),
        # CrossAttnUpBlockSpatioTemporal (320)
        ("pop",), ("res", 960, 320, 1e-6), ("push",), ("tres", 320, 320, 1e-6), ("popmix",), ("push",),
        ("attn_np", 5, 64, 320, 1024), ("push",), ("tattn", 5, 64, 320, 1024), ("popmix", 320),
        ("pop",), ("res", 640, 320, 1e-6), ("push",), ("tres", 320, 320, 1e-6), ("popmix",), ("push",),
        ("attn_np", 5, 64, 320, 1024), ("push",), ("tattn", 5, 64, 320, 1024), ("popmix", 320),
        ("pop",), ("res", 640, 320, 1e-6), ("push",), ("tres", 320, 320, 1e-6), ("popmix",), ("push",),
        ("attn_np", 5, 64, 320, 1024), ("push",), ("tattn", 5, 64, 320, 1024), ("popmix", 320),
    ]
)


def tiny_svd_plan(ctx_dim: int = 16) -> Tuple[BlockSpec, ...]:
    """Structure-complete miniature: every SVD block kind, one down/up level."""
    return (
        ("res", 8, 8, 1e-6), ("push",), ("tres", 8, 8, 1e-6), ("popmix",), ("push",),
        ("attn_np", 2, 4, 8, ctx_dim), ("push",), ("tattn", 2, 4, 8, ctx_dim), ("popmix", 8), ("push",),
        ("down", 8), ("push",),
        ("res", 8, 16, 1e-5), ("push",), ("tres", 16, 16, 1e-5), ("popmix",), ("push",),
        # mid
        ("res", 16, 16, 1e-5), ("push",), ("tres", 16, 16, 1e-5), ("popmix",),
        # up
        ("pop",), ("res", 32, 16, 1e-6), ("push",), ("tres", 16, 16, 1e-5), ("popmix",),
        ("pop",), ("res", 24, 8, 1e-6), ("push",), ("tres", 8, 8, 1e-6), ("popmix",),
        ("up", 8),
        ("pop",), ("res", 16, 8, 1e-6), ("push",), ("tres", 8, 8, 1e-6), ("popmix",), ("push",),
        ("attn_np", 2, 4, 8, ctx_dim), ("push",), ("tattn", 2, 4, 8, ctx_dim), ("popmix", 8),
    )


# ---------------------------------------------------------------------------
# Temporal primitives
# ---------------------------------------------------------------------------


def _conv_temporal(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """(T, H, W, C) 1D conv over T (kernel 3) per pixel: the reference Conv3d
    (3,1,1) (:10-14). Weight stored (3, Ci, Co)."""
    t, h, w, c = x.shape
    lhs = x.reshape(1, t, h * w, c)
    out = jax.lax.conv_general_dilated(
        lhs, p["w"].astype(x.dtype)[:, None],  # (3, 1, Ci, Co) HWIO
        (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (out + p["b"].astype(x.dtype)).reshape(t, h, w, -1)


def _group_norm_joint(p, x, groups, eps):
    """GroupNorm with statistics over ALL frames jointly: the reference reshapes
    (T,C,H,W) -> (1,C,T,H,W) before its GroupNorm (:21-22)."""
    t, h, w, c = x.shape
    return group_norm(p, x.reshape(1, t * h, w, c), groups, eps=eps).reshape(
        t, h, w, c)


def _temporal_resnet(p: Dict, x: jnp.ndarray, temb, groups: int, eps: float):
    """TemporalResnetBlock.forward (:20-38): frame axis treated as the conv's
    temporal dim; the time embedding is broadcast over frames."""
    h = jax.nn.silu(_group_norm_joint(p["norm1"], x, groups, eps))
    h = _conv_temporal(p["conv1"], h)
    if temb is not None:
        emb = jax.nn.silu(temb) @ p["temb_w"] + p["temb_b"]   # (1, Co)
        h = h + emb[0][None, None, None, :]
    h = jax.nn.silu(_group_norm_joint(p["norm2"], h, groups, eps))
    h = _conv_temporal(p["conv2"], h)
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x)
    return x + h


def _geglu(p, x, prefix):
    g = x @ p[f"{prefix}_w"] + p[f"{prefix}_b"]
    a, gate = jnp.split(g, 2, axis=-1)
    return a * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(x.dtype)


def _tattn_attention(p, x, ctx, num_heads):
    """x: (HW, T, C); ctx: (HW, Lk, C_kv)."""
    hw, t, c = x.shape
    q = (x @ p["q_w"]).reshape(hw, t, num_heads, -1)
    k = (ctx @ p["k_w"]).reshape(hw, ctx.shape[1], num_heads, -1)
    v = (ctx @ p["v_w"]).reshape(hw, ctx.shape[1], num_heads, -1)
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqnc,bknc->bnqk", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bnqk,bknc->bqnc", probs, v).reshape(hw, t, -1)
    return out @ p["o_w"] + p["o_b"]


def _temporal_attention(p: Dict, x: jnp.ndarray, text_emb, num_heads: int):
    """TemporalAttentionBlock.forward (:187-221). x: (T, H, W, C);
    text_emb: (1, C_kv) single conditioning token."""
    t, h, w, c = x.shape
    pos = timestep_embedding(jnp.arange(t), c).astype(x.dtype)       # (T, C) [cos|sin]
    pos = pos @ p["pe_w1"] + p["pe_b1"]
    pos = jax.nn.silu(pos.astype(jnp.float32)).astype(x.dtype) @ p["pe_w2"] + p["pe_b2"]
    x = x + pos[:, None, None, :]
    tokens = x.transpose(1, 2, 0, 3).reshape(h * w, t, c)

    tokens = tokens + (_geglu(p, layer_norm(p["norm_in"], tokens), "geglu_in")
                       @ p["ff_in_w"] + p["ff_in_b"])
    tokens = tokens + _tattn_attention(
        p["attn1"], layer_norm(p["norm1"], tokens), layer_norm(p["norm1"], tokens),
        num_heads)
    ctx = jnp.broadcast_to(text_emb.reshape(1, 1, -1), (h * w, 1, text_emb.shape[-1]))
    tokens = tokens + _tattn_attention(
        p["attn2"], layer_norm(p["norm2"], tokens), ctx.astype(tokens.dtype),
        num_heads)
    tokens = tokens + (_geglu(p, layer_norm(p["norm_out"], tokens), "geglu_out")
                       @ p["ff_out_w"] + p["ff_out_b"])
    return tokens.reshape(h, w, t, c).transpose(2, 0, 1, 3)


def _attn_block_noproj(p: Dict, x: jnp.ndarray, text_emb, num_heads: int,
                       groups: int, eps: float = 1e-5):
    """Spatial AttentionBlock with need_proj_out=False: no proj_out, NO residual
    (reference :201-208)."""
    b, h, w, c = x.shape
    t = group_norm(p["norm"], x, groups, eps=eps).reshape(b, h * w, c)
    t = t @ p["proj_in_w"] + p["proj_in_b"]
    # text_emb is the 2D (1, 1024) CLIP image embedding; torch's repeat() in the
    # reference implicitly unsqueezes it to one kv token per frame (:169-171)
    ctx = jnp.broadcast_to(text_emb[:, None], (b, 1, text_emb.shape[-1]))
    from goal_force_tpu.models.sd_unet import _transformer_block

    for tb in p["transformer_blocks"]:
        t = _transformer_block(tb, t, ctx, num_heads)
    return t.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Interpreter
# ---------------------------------------------------------------------------


def svd_unet_apply(params: Dict, plan: Sequence[BlockSpec], sample: jnp.ndarray,
                   timestep: jnp.ndarray, text_emb: jnp.ndarray,
                   add_time_id: jnp.ndarray, groups: int = 32) -> jnp.ndarray:
    """sample (T, H, W, 8), timestep scalar, text_emb (1, 1024) CLIP image
    embedding, add_time_id (3,) -> (T, H, W, 4) (reference SVDUNet.forward
    :380-424)."""
    model_dim = params["conv_in"]["w"].shape[-1]
    temb = timestep_embedding(jnp.reshape(timestep, (-1,)), model_dim)
    temb = jax.nn.silu(temb.astype(sample.dtype) @ params["time_w1"]
                       + params["time_b1"])
    temb = temb @ params["time_w2"] + params["time_b2"]

    ids = timestep_embedding(add_time_id.reshape(-1), 256).reshape(1, -1)
    add = jax.nn.silu(ids.astype(sample.dtype) @ params["add_time_w1"]
                      + params["add_time_b1"])
    add = add @ params["add_time_w2"] + params["add_time_b2"]
    temb = temb + add                                   # (1, 1280)

    x = conv2d(params["conv_in"], sample)
    stack: List[jnp.ndarray] = [x]
    for spec, p in zip(plan, params["blocks"]):
        kind = spec[0]
        if kind == "res":
            x = _resnet(p, x, temb, groups,
                        eps=spec[3] if len(spec) > 3 else 1e-5)
        elif kind == "tres":
            x = _temporal_resnet(p, x, temb, groups, spec[3])
        elif kind == "attn_np":
            x = _attn_block_noproj(p, x, text_emb, num_heads=spec[1], groups=groups,
                                   eps=1e-6)
        elif kind == "tattn":
            x = _temporal_attention(p, x, text_emb[0], num_heads=spec[1])
        elif kind == "popmix":
            alpha = jax.nn.sigmoid(p["mix_factor"].astype(jnp.float32)).astype(x.dtype)
            x = alpha * stack.pop() + (1 - alpha) * x
            if len(spec) > 1:
                x = x @ p["proj_w"] + p["proj_b"]
                x = x + stack.pop()
        elif kind == "push":
            stack.append(x)
        elif kind == "pop":
            x = jnp.concatenate([x, stack.pop()], axis=-1)
        elif kind == "down":
            x = conv2d(p["conv"], x, stride=2, padding=((1, 1), (1, 1)))
        elif kind == "up":
            t, h, w, c = x.shape
            x = jax.image.resize(x, (t, 2 * h, 2 * w, c), "nearest")
            x = conv2d(p["conv"], x)
        else:
            raise ValueError(spec)
    x = jax.nn.silu(group_norm(params["conv_norm_out"], x, groups, eps=1e-5))
    return conv2d(params["conv_out"], x)


# ---------------------------------------------------------------------------
# Converter + init
# ---------------------------------------------------------------------------


def _lin(sd, pre):
    return np.asarray(sd[pre + ".weight"]).T, np.asarray(sd[pre + ".bias"])


def svd_unet_params_from_torch(sd, plan: Sequence[BlockSpec] = SVD_PLAN) -> Dict:
    """diffsynth-format SVDUNet state dict (blocks.{i}.* naming)."""
    blocks = []
    for i, spec in enumerate(plan):
        pre = f"blocks.{i}"
        kind = spec[0]
        if kind == "res":
            p = {
                "norm1": _norm(sd, pre + ".norm1"),
                "conv1": _conv(sd, pre + ".conv1"),
                "temb_w": np.asarray(sd[pre + ".time_emb_proj.weight"]).T,
                "temb_b": np.asarray(sd[pre + ".time_emb_proj.bias"]),
                "norm2": _norm(sd, pre + ".norm2"),
                "conv2": _conv(sd, pre + ".conv2"),
            }
            if pre + ".conv_shortcut.weight" in sd:
                p["shortcut"] = _conv(sd, pre + ".conv_shortcut")
            blocks.append(p)
        elif kind == "tres":
            def conv3(name):
                w = np.asarray(sd[f"{pre}.{name}.weight"])   # (Co, Ci, 3, 1, 1)
                return {"w": np.ascontiguousarray(
                    w[:, :, :, 0, 0].transpose(2, 1, 0)),    # (3, Ci, Co)
                    "b": np.asarray(sd[f"{pre}.{name}.bias"])}

            p = {
                "norm1": _norm(sd, pre + ".norm1"),
                "conv1": conv3("conv1"),
                "temb_w": np.asarray(sd[pre + ".time_emb_proj.weight"]).T,
                "temb_b": np.asarray(sd[pre + ".time_emb_proj.bias"]),
                "norm2": _norm(sd, pre + ".norm2"),
                "conv2": conv3("conv2"),
            }
            if pre + ".conv_shortcut.weight" in sd:
                w = np.asarray(sd[pre + ".conv_shortcut.weight"])  # (Co,Ci,1,1,1)
                p["shortcut"] = {"w": np.ascontiguousarray(
                    w[:, :, 0, 0, 0].T[None, None]),
                    "b": np.asarray(sd[pre + ".conv_shortcut.bias"])}
            blocks.append(p)
        elif kind == "attn_np":
            g = lambda k: np.asarray(sd[f"{pre}.{k}"])
            tp = f"{pre}.transformer_blocks.0"
            tb = {
                "norm1": _ln(sd, tp + ".norm1"),
                "attn1": {
                    "q_w": np.asarray(sd[tp + ".attn1.to_q.weight"]).T,
                    "k_w": np.asarray(sd[tp + ".attn1.to_k.weight"]).T,
                    "v_w": np.asarray(sd[tp + ".attn1.to_v.weight"]).T,
                    "o_w": np.asarray(sd[tp + ".attn1.to_out.weight"]).T,
                    "o_b": np.asarray(sd[tp + ".attn1.to_out.bias"]),
                },
                "norm2": _ln(sd, tp + ".norm2"),
                "attn2": {
                    "q_w": np.asarray(sd[tp + ".attn2.to_q.weight"]).T,
                    "k_w": np.asarray(sd[tp + ".attn2.to_k.weight"]).T,
                    "v_w": np.asarray(sd[tp + ".attn2.to_v.weight"]).T,
                    "o_w": np.asarray(sd[tp + ".attn2.to_out.weight"]).T,
                    "o_b": np.asarray(sd[tp + ".attn2.to_out.bias"]),
                },
                "norm3": _ln(sd, tp + ".norm3"),
                "geglu_w": np.asarray(sd[tp + ".act_fn.proj.weight"]).T,
                "geglu_b": np.asarray(sd[tp + ".act_fn.proj.bias"]),
                "ff_w": np.asarray(sd[tp + ".ff.weight"]).T,
                "ff_b": np.asarray(sd[tp + ".ff.bias"]),
            }
            blocks.append({
                "norm": _norm(sd, pre + ".norm"),
                "proj_in_w": g("proj_in.weight").T,
                "proj_in_b": g("proj_in.bias"),
                "transformer_blocks": [tb],
            })
        elif kind == "tattn":
            g = lambda k: np.asarray(sd[f"{pre}.{k}"])
            attn = lambda a: {
                "q_w": g(f"{a}.to_q.weight").T,
                "k_w": g(f"{a}.to_k.weight").T,
                "v_w": g(f"{a}.to_v.weight").T,
                "o_w": g(f"{a}.to_out.weight").T,
                "o_b": g(f"{a}.to_out.bias"),
            }
            pe_w1, pe_b1 = _lin(sd, pre + ".positional_embedding_proj.0")
            pe_w2, pe_b2 = _lin(sd, pre + ".positional_embedding_proj.2")
            gi_w, gi_b = _lin(sd, pre + ".act_fn_in.proj")
            fi_w, fi_b = _lin(sd, pre + ".ff_in")
            go_w, go_b = _lin(sd, pre + ".act_fn_out.proj")
            fo_w, fo_b = _lin(sd, pre + ".ff_out")
            blocks.append({
                "pe_w1": pe_w1, "pe_b1": pe_b1, "pe_w2": pe_w2, "pe_b2": pe_b2,
                "norm_in": _ln(sd, pre + ".norm_in"),
                "geglu_in_w": gi_w, "geglu_in_b": gi_b,
                "ff_in_w": fi_w, "ff_in_b": fi_b,
                "norm1": _ln(sd, pre + ".norm1"),
                "attn1": attn("attn1"),
                "norm2": _ln(sd, pre + ".norm2"),
                "attn2": attn("attn2"),
                "norm_out": _ln(sd, pre + ".norm_out"),
                "geglu_out_w": go_w, "geglu_out_b": go_b,
                "ff_out_w": fo_w, "ff_out_b": fo_b,
            })
        elif kind == "popmix":
            p = {"mix_factor": np.asarray(sd[pre + ".mix_factor"])}
            if len(spec) > 1:
                p["proj_w"] = np.asarray(sd[pre + ".proj.weight"]).T
                p["proj_b"] = np.asarray(sd[pre + ".proj.bias"])
            blocks.append(p)
        elif kind in ("down", "up"):
            blocks.append({"conv": _conv(sd, pre + ".conv")})
        else:
            blocks.append({})
    return {
        "time_w1": np.asarray(sd["time_embedding.0.weight"]).T,
        "time_b1": np.asarray(sd["time_embedding.0.bias"]),
        "time_w2": np.asarray(sd["time_embedding.2.weight"]).T,
        "time_b2": np.asarray(sd["time_embedding.2.bias"]),
        "add_time_w1": np.asarray(sd["add_time_embedding.0.weight"]).T,
        "add_time_b1": np.asarray(sd["add_time_embedding.0.bias"]),
        "add_time_w2": np.asarray(sd["add_time_embedding.2.weight"]).T,
        "add_time_b2": np.asarray(sd["add_time_embedding.2.bias"]),
        "conv_in": _conv(sd, "conv_in"),
        "blocks": blocks,
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }


def _ln(sd, pre):
    return {"scale": np.asarray(sd[pre + ".weight"]),
            "bias": np.asarray(sd[pre + ".bias"])}



def init_svd_unet(key, plan: Sequence[BlockSpec] = SVD_PLAN,
                  model_dim: int = 320, time_dim: int = 1280,
                  clip_dim: int = 1024, in_channels: int = 8,
                  out_channels: int = 4, dtype=jnp.float32) -> Dict:
    """Random params in the converter's layout (for tests / tiny pipelines)."""
    rng = np.random.RandomState(0)
    j = lambda a: jnp.asarray(a, dtype)
    lin = lambda di, do: (j(rng.randn(di, do) * 0.05), j(np.zeros(do)))
    conv = lambda ci, co, k=3: {"w": j(rng.randn(k, k, ci, co) * 0.05),
                                "b": j(np.zeros(co))}
    nrm = lambda c: {"scale": j(np.ones(c)), "bias": j(np.zeros(c))}

    blocks = []
    for spec in plan:
        kind = spec[0]
        if kind == "res":
            ci, co = spec[1], spec[2]
            tw, tb = lin(time_dim, co)
            p = {"norm1": nrm(ci), "conv1": conv(ci, co), "temb_w": tw,
                 "temb_b": tb, "norm2": nrm(co), "conv2": conv(co, co)}
            if ci != co:
                p["shortcut"] = conv(ci, co, k=1)
            blocks.append(p)
        elif kind == "tres":
            ci, co = spec[1], spec[2]
            tw, tb = lin(time_dim, co)
            c3 = lambda a, b_: {"w": j(rng.randn(3, a, b_) * 0.05),
                                "b": j(np.zeros(b_))}
            p = {"norm1": nrm(ci), "conv1": c3(ci, co), "temb_w": tw,
                 "temb_b": tb, "norm2": nrm(co), "conv2": c3(co, co)}
            if ci != co:
                p["shortcut"] = conv(ci, co, k=1)
            blocks.append(p)
        elif kind == "attn_np":
            _, n, hd, c, ctx = spec[:5]
            attn = lambda kv: {"q_w": lin(c, c)[0], "k_w": lin(kv, c)[0],
                               "v_w": lin(kv, c)[0], "o_w": lin(c, c)[0],
                               "o_b": j(np.zeros(c))}
            tb_ = {"norm1": nrm(c), "attn1": attn(c), "norm2": nrm(c),
                   "attn2": attn(ctx), "norm3": nrm(c),
                   "geglu_w": lin(c, 8 * c)[0], "geglu_b": j(np.zeros(8 * c)),
                   "ff_w": lin(4 * c, c)[0], "ff_b": j(np.zeros(c))}
            piw, pib = lin(c, c)
            blocks.append({"norm": nrm(c), "proj_in_w": piw, "proj_in_b": pib,
                           "transformer_blocks": [tb_]})
        elif kind == "tattn":
            _, n, hd, c, ctx = spec[:5]
            attn = lambda kv: {"q_w": lin(c, c)[0], "k_w": lin(kv, c)[0],
                               "v_w": lin(kv, c)[0], "o_w": lin(c, c)[0],
                               "o_b": j(np.zeros(c))}
            pe_w1, pe_b1 = lin(c, 4 * c)
            pe_w2, pe_b2 = lin(4 * c, c)
            gi_w, gi_b = lin(c, 8 * c)
            fi_w, fi_b = lin(4 * c, c)
            go_w, go_b = lin(c, 8 * c)
            fo_w, fo_b = lin(4 * c, c)
            blocks.append({
                "pe_w1": pe_w1, "pe_b1": pe_b1, "pe_w2": pe_w2, "pe_b2": pe_b2,
                "norm_in": nrm(c), "geglu_in_w": gi_w, "geglu_in_b": gi_b,
                "ff_in_w": fi_w, "ff_in_b": fi_b,
                "norm1": nrm(c), "attn1": attn(c),
                "norm2": nrm(c), "attn2": attn(ctx),
                "norm_out": nrm(c), "geglu_out_w": go_w, "geglu_out_b": go_b,
                "ff_out_w": fo_w, "ff_out_b": fo_b,
            })
        elif kind == "popmix":
            p = {"mix_factor": j(np.zeros(1))}
            if len(spec) > 1:
                pw, pb = lin(spec[1], spec[1])
                p["proj_w"], p["proj_b"] = pw, pb
            blocks.append(p)
        elif kind in ("down", "up"):
            blocks.append({"conv": conv(spec[1], spec[1])})
        else:
            blocks.append({})
    tw1, tb1 = lin(model_dim, time_dim)
    tw2, tb2 = lin(time_dim, time_dim)
    aw1, ab1 = lin(3 * 256, time_dim)
    aw2, ab2 = lin(time_dim, time_dim)
    return {
        "time_w1": tw1, "time_b1": tb1, "time_w2": tw2, "time_b2": tb2,
        "add_time_w1": aw1, "add_time_b1": ab1,
        "add_time_w2": aw2, "add_time_b2": ab2,
        "conv_in": conv(in_channels, model_dim),
        "blocks": blocks,
        "conv_norm_out": nrm(plan[-1][1] if plan[-1][0] != "popmix"
                             else model_dim),
        "conv_out": conv(model_dim, out_channels),
    }
