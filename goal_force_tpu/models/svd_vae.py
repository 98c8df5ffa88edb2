"""SVD video VAE: SD VAE with temporal-mix decoder blocks.

Reference /root/reference/diffsynth/models/svd_vae_decoder.py: the decoder is
the SD 2D decoder plan with a TemporalResnetBlock after every spatial resnet —
joint-over-frames group norm, (3,1,1) time convs, learned sigmoid mix between
the spatial and temporal branches (:45-68) — plus a final (3,1,1) time conv
after conv_out (:120,139). The encoder is the SD encoder with SDXL scaling
(svd_vae_encoder.py:4-11). scaling_factor 0.18215 on the decoder (:74).
"""

from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.sd_vae import _vae_attn
from goal_force_tpu.models.sd_unet import conv2d, group_norm
from goal_force_tpu.models.sd_vae import SCALING_FACTOR

SVD_VAE_SCALING = 0.18215

# kinds: res (spatial), tres (temporal mix), vattn, up
SVD_VAE_DECODER_PLAN: Tuple[Tuple, ...] = (
    ("res", 512, 512), ("tres", 512), ("vattn", 512), ("res", 512, 512),
    ("tres", 512),
    ("res", 512, 512), ("tres", 512), ("res", 512, 512), ("tres", 512),
    ("res", 512, 512), ("tres", 512), ("up", 512),
    ("res", 512, 512), ("tres", 512), ("res", 512, 512), ("tres", 512),
    ("res", 512, 512), ("tres", 512), ("up", 512),
    ("res", 512, 256), ("tres", 256), ("res", 256, 256), ("tres", 256),
    ("res", 256, 256), ("tres", 256), ("up", 256),
    ("res", 256, 128), ("tres", 128), ("res", 128, 128), ("tres", 128),
    ("res", 128, 128), ("tres", 128),
)


def _group_norm_joint(p, x, groups, eps):
    """GroupNorm over (1, T, H, W, C): joint stats across all frames."""
    t, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(1, t * h * w, groups, c // groups)
    mu = xf.mean((1, 3), keepdims=True)
    var = xf.var((1, 3), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xf.reshape(t, h, w, c) * p["scale"] + p["bias"]).astype(x.dtype)


def _time_conv(p, x):
    """(3,1,1) conv over frames, SAME time padding. x (T, H, W, C)."""
    y = jnp.pad(x[None], [(0, 0), (1, 1), (0, 0), (0, 0), (0, 0)])
    out = jax.lax.conv_general_dilated(
        y, p["w"].astype(x.dtype), (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out[0] + p["b"].astype(x.dtype)


def _temporal_resnet(p, x, groups, eps=1e-6):
    """TemporalResnetBlock (:45-68): frames-as-batch input (T, H, W, C)."""
    spatial = x
    h = jax.nn.silu(_group_norm_joint(p["norm1"], x, groups, eps))
    h = _time_conv(p["conv1"], h)
    h = jax.nn.silu(_group_norm_joint(p["norm2"], h, groups, eps))
    h = _time_conv(p["conv2"], h)
    temporal = x + h
    alpha = jax.nn.sigmoid(p["mix"].astype(jnp.float32)).astype(x.dtype)
    return alpha * temporal + (1 - alpha) * spatial


def svd_vae_decode(params: Dict, latents: jnp.ndarray,
                   plan: Sequence[Tuple] = SVD_VAE_DECODER_PLAN,
                   groups: int = 32,
                   scaling: float = SVD_VAE_SCALING) -> jnp.ndarray:
    """latents (T, h, w, 4) -> video (T, 8h, 8w, 3) (SVDVAEDecoder.forward
    :123-141)."""
    from goal_force_tpu.models.sd_unet import _resnet

    x = conv2d(params["conv_in"], latents / scaling)
    for spec, p in zip(plan, params["blocks"]):
        kind = spec[0]
        if kind == "res":
            x = _resnet(p, x, None, groups, eps=1e-6)
        elif kind == "tres":
            x = _temporal_resnet(p, x, groups)
        elif kind == "vattn":
            x = _vae_attn(p, x, groups)
        elif kind == "up":
            t, h, w, c = x.shape
            x = jax.image.resize(x, (t, 2 * h, 2 * w, c), "nearest")
            x = conv2d(p["conv"], x)
    x = jax.nn.silu(group_norm(params["conv_norm_out"], x, groups, eps=1e-5))
    x = conv2d(params["conv_out"], x)
    return _time_conv(params["time_conv_out"], x)


# ---------------------------------------------------------------------------
# Converter (diffsynth layout: reference blocks list naming)
# ---------------------------------------------------------------------------

def _c2(sd, pre):
    return {"w": np.asarray(sd[pre + ".weight"]).transpose(2, 3, 1, 0),
            "b": np.asarray(sd[pre + ".bias"])}


def _c3(sd, pre):
    return {"w": np.asarray(sd[pre + ".weight"]).transpose(2, 3, 4, 1, 0),
            "b": np.asarray(sd[pre + ".bias"])}


def _nrm(sd, pre):
    return {"scale": np.asarray(sd[pre + ".weight"]),
            "bias": np.asarray(sd[pre + ".bias"])}


def svd_vae_decoder_params_from_torch(
        sd, plan: Sequence[Tuple] = SVD_VAE_DECODER_PLAN) -> Dict:
    blocks = []
    for i, spec in enumerate(plan):
        pre = f"blocks.{i}"
        kind = spec[0]
        if kind == "res":
            p = {"norm1": _nrm(sd, pre + ".norm1"),
                 "conv1": _c2(sd, pre + ".conv1"),
                 "norm2": _nrm(sd, pre + ".norm2"),
                 "conv2": _c2(sd, pre + ".conv2")}
            if pre + ".conv_shortcut.weight" in sd:
                p["shortcut"] = _c2(sd, pre + ".conv_shortcut")
            blocks.append(p)
        elif kind == "tres":
            blocks.append({"norm1": _nrm(sd, pre + ".norm1"),
                           "conv1": _c3(sd, pre + ".conv1"),
                           "norm2": _nrm(sd, pre + ".norm2"),
                           "conv2": _c3(sd, pre + ".conv2"),
                           "mix": np.asarray(sd[pre + ".mix_factor"])[0]})
        elif kind == "vattn":
            from goal_force_tpu.models.sd_vae import _lin_attn

            blocks.append({"norm": _nrm(sd, pre + ".norm"),
                           "attn": _lin_attn(sd, pre + ".transformer_blocks.0")})
        elif kind == "up":
            blocks.append({"conv": _c2(sd, pre + ".conv")})
    return {
        "conv_in": _c2(sd, "conv_in"),
        "blocks": blocks,
        "conv_norm_out": _nrm(sd, "conv_norm_out"),
        "conv_out": _c2(sd, "conv_out"),
        "time_conv_out": _c3(sd, "time_conv_out"),
    }
