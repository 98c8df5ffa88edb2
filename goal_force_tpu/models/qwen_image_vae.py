"""Qwen-Image VAE: the Wan2.1 causal VAE applied to single images.

Reference /root/reference/diffsynth/models/qwen_image_vae.py: QwenImageVAE is
architecturally the Wan2.1 video VAE (base_dim 96, z 16, dim_mult (1,2,4,4),
temporal downsample (False, True, True), identical latent mean/std :668-704)
with diffusers-style module naming and an image API that adds/removes the
singleton time axis (:706-725). We reuse models/vae.py wholesale and only
provide the checkpoint-name translation + image-shaped wrappers.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import jax.numpy as jnp

from goal_force_tpu.configs import VAEConfig
from goal_force_tpu.models.vae import decode, encode, latent_scale
from goal_force_tpu.io.torch_convert import vae_params_from_torch

QWEN_IMAGE_VAE_CONFIG = VAEConfig()  # identical geometry to Wan2.1 (:641-650)


def qwen_image_vae_encode(params: Dict, image: jnp.ndarray,
                          cfg: VAEConfig = QWEN_IMAGE_VAE_CONFIG) -> jnp.ndarray:
    """(B, H, W, 3) in [-1,1] -> scaled latents (B, H/8, W/8, 16)
    (reference encode :706-714)."""
    mu = encode(params, cfg, image[:, None])[:, 0]
    mean, std = latent_scale(cfg, mu.dtype)
    return (mu - mean) / std


def qwen_image_vae_decode(params: Dict, latents: jnp.ndarray,
                          cfg: VAEConfig = QWEN_IMAGE_VAE_CONFIG) -> jnp.ndarray:
    """(B, h, w, 16) scaled latents -> (B, 8h, 8w, 3), unclamped
    (reference decode :716-725)."""
    mean, std = latent_scale(cfg, latents.dtype)
    return decode(params, cfg, (latents * std + mean)[:, None])[:, 0]


def _res_suffix(rest: str) -> str:
    table = {"norm1": "residual.0", "conv1": "residual.2",
             "norm2": "residual.3", "conv2": "residual.6",
             "conv_shortcut": "shortcut"}
    head, _, tail = rest.partition(".")
    return table[head] + "." + tail


def qwen_vae_rename(sd: Mapping) -> Dict:
    """diffusers-style QwenImage VAE keys -> the Wan layout consumed by
    io/torch_convert.vae_params_from_torch (reference naming :344-409 enc,
    :522-598 dec; the reference's own converter is the identity :731-736)."""
    out = {}
    for k, v in sd.items():
        m = re.match(r"(encoder|decoder)\.(.*)", k)
        if not m:
            out[k] = v
            continue
        side, rest = m.groups()
        if rest.startswith("conv_in."):
            out[f"{side}.conv1." + rest[len("conv_in."):]] = v
        elif rest.startswith("norm_out."):
            out[f"{side}.head.0." + rest[len("norm_out."):]] = v
        elif rest.startswith("conv_out."):
            out[f"{side}.head.2." + rest[len("conv_out."):]] = v
        elif rest.startswith("mid_block."):
            mm = re.match(r"mid_block\.(resnets|attentions)\.(\d)\.(.*)", rest)
            kind, idx, tail = mm.groups()
            if kind == "attentions":
                out[f"{side}.middle.1.{tail}"] = v
            else:
                mid = "0" if idx == "0" else "2"
                out[f"{side}.middle.{mid}." + _res_suffix(tail)] = v
        elif rest.startswith("down_blocks."):
            mm = re.match(r"down_blocks\.(\d+)\.(.*)", rest)
            idx, tail = mm.groups()
            if tail.startswith(("resample.", "time_conv.")):
                out[f"{side}.downsamples.{idx}.{tail}"] = v
            else:
                out[f"{side}.downsamples.{idx}." + _res_suffix(tail)] = v
        elif rest.startswith("up_blocks."):
            mm = re.match(r"up_blocks\.(\d+)\.(resnets|upsamplers)\.(\d+)\.(.*)",
                          rest)
            blk, kind, j, tail = mm.groups()
            # flatten UpBlock (num_res_blocks+1 resnets + optional upsampler)
            # into the sequential decoder.upsamples list (reference Wan layout)
            base = int(blk) * 4  # 3 resnets + 1 resampler per non-final level
            if kind == "resnets":
                out[f"{side}.upsamples.{base + int(j)}." + _res_suffix(tail)] = v
            else:
                out[f"{side}.upsamples.{base + 3}.{tail}"] = v
        else:
            out[k] = v
    return out


def qwen_image_vae_params_from_torch(
        sd: Mapping, cfg: VAEConfig = QWEN_IMAGE_VAE_CONFIG) -> Dict:
    renamed = {}
    for k, v in sd.items():
        if k == "quant_conv.weight":
            renamed["conv1.weight"] = v
        elif k == "quant_conv.bias":
            renamed["conv1.bias"] = v
        elif k == "post_quant_conv.weight":
            renamed["conv2.weight"] = v
        elif k == "post_quant_conv.bias":
            renamed["conv2.bias"] = v
        else:
            renamed[k] = v
    return vae_params_from_torch(qwen_vae_rename(renamed), cfg)
