"""SD-1.5 image VAE (8x spatial, 4-channel latents, scaling 0.18215), NHWC.

Reference: diffsynth/models/sd_vae_encoder.py:8-100 and
sd_vae_decoder.py:7-120. Same block-plan style as models/sd_unet.py, reusing
its primitives; the two VAE-specific pieces are the plain (projection-free)
single-head attention block (reference: sd_vae_decoder.py:7-42
VAEAttentionBlock) and the encoder's asymmetric-padded stride-2 downsampler
(reference: sd_unet.py DownSampler with padding=0, extra_padding=True — pads
(0,1,0,1) then VALID conv).

Encode returns the distribution MEAN (the reference slices the first 4 of the
8 moment channels and never samples: sd_vae_encoder.py:74-76) scaled by
0.18215; decode inverts the scale first.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.sd_unet import (
    _attention,
    _resnet,
    conv2d,
    group_norm,
)

SCALING_FACTOR = 0.18215
SDXL_SCALING_FACTOR = 0.13025
# 16-channel VAEs share the SD block plans; only the latent head differs
# (no quant convs, conv_out 512->32, slice :16, shifted scaling).
SD3_SCALING = (1.5305, 0.0609)   # (scaling, shift) — reference sd3_vae_encoder.py:11-12
FLUX_SCALING = (0.3611, 0.1159)  # reference flux_vae.py:8-9

# ("res", in, out) | ("vattn", ch) | ("downe", ch) | ("up", ch)
SD_VAE_ENCODER_PLAN: Tuple[Tuple, ...] = (
    ("res", 128, 128), ("res", 128, 128), ("downe", 128),
    ("res", 128, 256), ("res", 256, 256), ("downe", 256),
    ("res", 256, 512), ("res", 512, 512), ("downe", 512),
    ("res", 512, 512), ("res", 512, 512),
    ("res", 512, 512), ("vattn", 512), ("res", 512, 512),
)

SD_VAE_DECODER_PLAN: Tuple[Tuple, ...] = (
    ("res", 512, 512), ("vattn", 512), ("res", 512, 512),
    ("res", 512, 512), ("res", 512, 512), ("res", 512, 512), ("up", 512),
    ("res", 512, 512), ("res", 512, 512), ("res", 512, 512), ("up", 512),
    ("res", 512, 256), ("res", 256, 256), ("res", 256, 256), ("up", 256),
    ("res", 256, 128), ("res", 128, 128), ("res", 128, 128),
)


def _vae_attn(p: Dict, x: jnp.ndarray, groups: int, eps: float = 1e-6) -> jnp.ndarray:
    b, h, w, c = x.shape
    t = group_norm(p["norm"], x, groups, eps=eps).reshape(b, h * w, c)
    t = _attention(p["attn"], t, t, num_heads=1)
    return t.reshape(b, h, w, c) + x


def _run_plan(params: Dict, plan: Sequence[Tuple], x: jnp.ndarray,
              groups: int) -> jnp.ndarray:
    for spec, p in zip(plan, params["blocks"]):
        kind = spec[0]
        if kind == "res":
            x = _resnet(p, x, None, groups)
        elif kind == "vattn":
            x = _vae_attn(p, x, groups)
        elif kind == "downe":
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv2d(p["conv"], x, stride=2, padding="VALID")
        elif kind == "up":
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
            x = conv2d(p["conv"], x)
        else:
            raise ValueError(spec)
    return x


def sd_vae_encode(params: Dict, images: jnp.ndarray,
                  plan: Sequence[Tuple] = SD_VAE_ENCODER_PLAN,
                  groups: int = 32,
                  scaling: float = SCALING_FACTOR) -> jnp.ndarray:
    """(B, H, W, 3) in [-1, 1] -> (B, H/8, W/8, 4) scaled latent means.
    SDXL's VAE is this architecture with scaling=0.13025
    (reference: sdxl_vae_encoder.py:4-7)."""
    x = conv2d(params["conv_in"], images)
    x = _run_plan(params, plan, x, groups)
    x = jax.nn.silu(group_norm(params["conv_norm_out"], x, groups, eps=1e-6))
    x = conv2d(params["conv_out"], x)
    x = conv2d(params["quant_conv"], x)
    return x[..., :4] * scaling


def sd_vae_decode(params: Dict, latents: jnp.ndarray,
                  plan: Sequence[Tuple] = SD_VAE_DECODER_PLAN,
                  groups: int = 32,
                  scaling: float = SCALING_FACTOR) -> jnp.ndarray:
    """(B, h, w, 4) scaled latents -> (B, 8h, 8w, 3) images in [-1, 1]."""
    x = conv2d(params["post_quant_conv"], latents / scaling)
    x = conv2d(params["conv_in"], x)
    x = _run_plan(params, plan, x, groups)
    x = jax.nn.silu(group_norm(params["conv_norm_out"], x, groups, eps=1e-5))
    return conv2d(params["conv_out"], x)


def sd3_vae_encode(params: Dict, images: jnp.ndarray,
                   scaling_shift: Tuple[float, float] = SD3_SCALING,
                   plan: Sequence[Tuple] = SD_VAE_ENCODER_PLAN,
                   groups: int = 32) -> jnp.ndarray:
    """SD3/Flux 16-channel VAE encode (reference sd3_vae_encoder.py:52-73): same
    block stack as SD, no quant_conv, conv_out emits 32 moment channels, keep the
    16 means, then (x - shift) * scaling. Flux passes FLUX_SCALING
    (reference flux_vae.py:5-13)."""
    scaling, shift = scaling_shift
    x = conv2d(params["conv_in"], images)
    x = _run_plan(params, plan, x, groups)
    x = jax.nn.silu(group_norm(params["conv_norm_out"], x, groups, eps=1e-6))
    x = conv2d(params["conv_out"], x)
    return (x[..., :16] - shift) * scaling


def sd3_vae_decode(params: Dict, latents: jnp.ndarray,
                   scaling_shift: Tuple[float, float] = SD3_SCALING,
                   plan: Sequence[Tuple] = SD_VAE_DECODER_PLAN,
                   groups: int = 32) -> jnp.ndarray:
    """(B, h, w, 16) -> (B, 8h, 8w, 3) (reference sd3_vae_decoder.py:56-77:
    z / scaling + shift, no post_quant_conv)."""
    scaling, shift = scaling_shift
    x = conv2d(params["conv_in"], latents / scaling + shift)
    x = _run_plan(params, plan, x, groups)
    x = jax.nn.silu(group_norm(params["conv_norm_out"], x, groups, eps=1e-5))
    return conv2d(params["conv_out"], x)


# ---------------------------------------------------------------------------
# Converters
# ---------------------------------------------------------------------------


def _lin_attn(sd, pre):
    g = lambda k: np.asarray(sd[f"{pre}.{k}"])
    return {
        "q_w": g("to_q.weight").T, "q_b": g("to_q.bias"),
        "k_w": g("to_k.weight").T, "k_b": g("to_k.bias"),
        "v_w": g("to_v.weight").T, "v_b": g("to_v.bias"),
        "o_w": g("to_out.weight").T, "o_b": g("to_out.bias"),
    }


def _blocks_from_torch(sd, plan):
    from goal_force_tpu.models.sd_unet import _conv, _norm

    blocks = []
    for i, spec in enumerate(plan):
        pre = f"blocks.{i}"
        kind = spec[0]
        if kind == "res":
            p = {"norm1": _norm(sd, pre + ".norm1"), "conv1": _conv(sd, pre + ".conv1"),
                 "norm2": _norm(sd, pre + ".norm2"), "conv2": _conv(sd, pre + ".conv2")}
            if pre + ".conv_shortcut.weight" in sd:
                p["shortcut"] = _conv(sd, pre + ".conv_shortcut")
            blocks.append(p)
        elif kind == "vattn":
            blocks.append({"norm": _norm(sd, pre + ".norm"),
                           "attn": _lin_attn(sd, pre + ".transformer_blocks.0")})
        elif kind in ("downe", "up"):
            blocks.append({"conv": _conv(sd, pre + ".conv")})
    return blocks


def sd_vae_encoder_params_from_torch(sd, plan=SD_VAE_ENCODER_PLAN) -> Dict:
    from goal_force_tpu.models.sd_unet import _conv, _norm

    return {
        "conv_in": _conv(sd, "conv_in"),
        "blocks": _blocks_from_torch(sd, plan),
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
        "quant_conv": _conv(sd, "quant_conv"),
    }


def sd_vae_decoder_params_from_torch(sd, plan=SD_VAE_DECODER_PLAN) -> Dict:
    from goal_force_tpu.models.sd_unet import _conv, _norm

    return {
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "conv_in": _conv(sd, "conv_in"),
        "blocks": _blocks_from_torch(sd, plan),
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }


def sd3_vae_encoder_params_from_torch(sd, plan=SD_VAE_ENCODER_PLAN) -> Dict:
    """SD3/Flux encoder state dict (same blocks.{i} naming, no quant_conv)."""
    from goal_force_tpu.models.sd_unet import _conv, _norm

    return {
        "conv_in": _conv(sd, "conv_in"),
        "blocks": _blocks_from_torch(sd, plan),
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }


def sd3_vae_decoder_params_from_torch(sd, plan=SD_VAE_DECODER_PLAN) -> Dict:
    from goal_force_tpu.models.sd_unet import _conv, _norm

    return {
        "conv_in": _conv(sd, "conv_in"),
        "blocks": _blocks_from_torch(sd, plan),
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }


# ---------------------------------------------------------------------------
# civitai / LDM VAE converter (algorithmic; the reference ships literal
# rename tables: sd_vae_encoder.py:160+, sd_vae_decoder.py from_civitai)
# ---------------------------------------------------------------------------


def _ldm_vae_prefixes(plan, is_encoder: bool):
    """LDM prefixes per plan entry. Encoder: down.{i}.block.{j} with
    down.{i}.downsample after each stage; decoder: up.{i} in REVERSED order
    (up.3 first) with up.{i}.upsample; mid.block_1/attn_1/block_2 around the
    'vattn' entry on the encoder tail / decoder head."""
    n_levels = sum(1 for s in plan if s[0] in ("downe", "up")) + 1
    mid = tuple(s[0] for s in (plan[-3:] if is_encoder else plan[:3]))
    if mid != ("res", "vattn", "res"):
        raise ValueError(f"LDM mapping expects a (res, vattn, res) mid "
                         f"section, got {mid}")
    if is_encoder:
        # down levels first; the last three plan entries are the mid section
        out = []
        level, j = 0, 0
        mid_start = len(plan) - 3
        for i, spec in enumerate(plan):
            if i >= mid_start:
                out.append({"res": f"mid.block_{1 if i == mid_start else 2}",
                            "vattn": "mid.attn_1"}[spec[0]])
            elif spec[0] == "downe":
                out.append(f"down.{level}.downsample")
                level += 1
                j = 0
            else:
                out.append(f"down.{level}.block.{j}")
                j += 1
        return out
    # decoder: plan head is (res, vattn, res) = mid; then levels from highest
    out = []
    level = n_levels - 1
    j = 0
    for i, spec in enumerate(plan):
        if i < 3:
            out.append({"res": f"mid.block_{1 if i == 0 else 2}",
                        "vattn": "mid.attn_1"}[spec[0]])
        elif spec[0] == "up":
            out.append(f"up.{level}.upsample")
            level -= 1
            j = 0
        else:
            out.append(f"up.{level}.block.{j}")
            j += 1
    return out


def _vae_params_from_ldm(sd, plan, pre0, is_encoder):
    g = lambda k: np.asarray(sd[pre0 + k])
    norm = lambda p: {"scale": g(p + ".weight"), "bias": g(p + ".bias")}
    conv = lambda p: {"w": np.ascontiguousarray(
        np.transpose(g(p + ".weight"), (2, 3, 1, 0))), "b": g(p + ".bias")}
    lin1x1 = lambda p: np.squeeze(g(p + ".weight"), (2, 3)).T

    blocks = []
    for spec, base in zip(plan, _ldm_vae_prefixes(plan, is_encoder)):
        kind = spec[0]
        if kind == "res":
            p = {"norm1": norm(base + ".norm1"), "conv1": conv(base + ".conv1"),
                 "norm2": norm(base + ".norm2"), "conv2": conv(base + ".conv2")}
            if pre0 + base + ".nin_shortcut.weight" in sd:
                p["shortcut"] = conv(base + ".nin_shortcut")
            blocks.append(p)
        elif kind == "vattn":
            blocks.append({"norm": norm(base + ".norm"), "attn": {
                "q_w": lin1x1(base + ".q"), "q_b": g(base + ".q.bias"),
                "k_w": lin1x1(base + ".k"), "k_b": g(base + ".k.bias"),
                "v_w": lin1x1(base + ".v"), "v_b": g(base + ".v.bias"),
                "o_w": lin1x1(base + ".proj_out"), "o_b": g(base + ".proj_out.bias"),
            }})
        elif kind in ("downe", "up"):
            blocks.append({"conv": conv(base + ".conv")})
    return blocks, g, norm, conv


def sd_vae_encoder_params_from_civitai(sd, plan=SD_VAE_ENCODER_PLAN) -> Dict:
    pre0 = "first_stage_model." if any(
        k.startswith("first_stage_model.") for k in sd) else ""
    blocks, g, norm, conv = _vae_params_from_ldm(sd, plan, pre0 + "encoder.",
                                                 is_encoder=True)
    top = lambda p: {"w": np.ascontiguousarray(np.transpose(
        np.asarray(sd[pre0 + p + ".weight"]), (2, 3, 1, 0))),
        "b": np.asarray(sd[pre0 + p + ".bias"])}
    return {"conv_in": conv("conv_in"), "blocks": blocks,
            "conv_norm_out": norm("norm_out"), "conv_out": conv("conv_out"),
            "quant_conv": top("quant_conv")}


def sd_vae_decoder_params_from_civitai(sd, plan=SD_VAE_DECODER_PLAN) -> Dict:
    pre0 = "first_stage_model." if any(
        k.startswith("first_stage_model.") for k in sd) else ""
    blocks, g, norm, conv = _vae_params_from_ldm(sd, plan, pre0 + "decoder.",
                                                 is_encoder=False)
    top = lambda p: {"w": np.ascontiguousarray(np.transpose(
        np.asarray(sd[pre0 + p + ".weight"]), (2, 3, 1, 0))),
        "b": np.asarray(sd[pre0 + p + ".bias"])}
    return {"post_quant_conv": top("post_quant_conv"),
            "conv_in": conv("conv_in"), "blocks": blocks,
            "conv_norm_out": norm("norm_out"), "conv_out": conv("conv_out")}
