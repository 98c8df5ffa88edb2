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
                  groups: int = 32) -> jnp.ndarray:
    """(B, H, W, 3) in [-1, 1] -> (B, H/8, W/8, 4) scaled latent means."""
    x = conv2d(params["conv_in"], images)
    x = _run_plan(params, plan, x, groups)
    x = jax.nn.silu(group_norm(params["conv_norm_out"], x, groups, eps=1e-6))
    x = conv2d(params["conv_out"], x)
    x = conv2d(params["quant_conv"], x)
    return x[..., :4] * SCALING_FACTOR


def sd_vae_decode(params: Dict, latents: jnp.ndarray,
                  plan: Sequence[Tuple] = SD_VAE_DECODER_PLAN,
                  groups: int = 32) -> jnp.ndarray:
    """(B, h, w, 4) scaled latents -> (B, 8h, 8w, 3) images in [-1, 1]."""
    x = conv2d(params["post_quant_conv"], latents / SCALING_FACTOR)
    x = conv2d(params["conv_in"], x)
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
