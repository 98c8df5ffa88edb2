"""Torch state-dict -> pytree converters.

Takes a flat {name: numpy array} dict in the reference's ("civitai") naming
(/root/reference/diffsynth/models/wan_video_dit.py:499-757 keeps these keys verbatim)
and produces the layouts goal_force_tpu computes with:
  - Linear (out, in) -> (in, out)
  - Conv3d patch embed (D, C, pf, ph, pw) -> (C*pf*ph*pw, D), feature order (c, dy, dx)
  - per-block tensors stacked along a leading layer axis

This module only depends on numpy; safetensors file loading lives in io/safetensors_io.py.
"""

from __future__ import annotations

import math
from typing import Dict, Mapping

import numpy as np

from goal_force_tpu.configs import ControlNetConfig, T5Config, WanDiTConfig


Array = np.ndarray


def _lin(sd: Mapping[str, Array], prefix: str) -> Dict[str, Array]:
    out = {"w": np.ascontiguousarray(sd[prefix + ".weight"].T)}
    if prefix + ".bias" in sd:
        out["b"] = sd[prefix + ".bias"]
    else:
        out["b"] = np.zeros(out["w"].shape[1], out["w"].dtype)
    return out


def _attn(sd: Mapping[str, Array], prefix: str) -> Dict:
    out = {
        "q": _lin(sd, prefix + ".q"),
        "k": _lin(sd, prefix + ".k"),
        "v": _lin(sd, prefix + ".v"),
        "o": _lin(sd, prefix + ".o"),
        "norm_q": {"w": sd[prefix + ".norm_q.weight"]},
        "norm_k": {"w": sd[prefix + ".norm_k.weight"]},
    }
    if prefix + ".k_img.weight" in sd:  # has_image_input cross attention (:164-167)
        out["k_img"] = _lin(sd, prefix + ".k_img")
        out["v_img"] = _lin(sd, prefix + ".v_img")
        out["norm_k_img"] = {"w": sd[prefix + ".norm_k_img.weight"]}
    return out


def _block(sd: Mapping[str, Array], prefix: str) -> Dict:
    return {
        "self_attn": _attn(sd, prefix + ".self_attn"),
        "cross_attn": _attn(sd, prefix + ".cross_attn"),
        "norm3": {"w": sd[prefix + ".norm3.weight"], "b": sd[prefix + ".norm3.bias"]},
        "ffn": {
            "fc0": _lin(sd, prefix + ".ffn.0"),
            "fc2": _lin(sd, prefix + ".ffn.2"),
        },
        "modulation": sd[prefix + ".modulation"].reshape(6, -1),
    }


def _stack_blocks(blocks):
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *blocks)


def patch_embed_from_conv3d(w: Array, b: Array) -> Dict[str, Array]:
    """(D, C, pf, ph, pw) conv kernel -> (C*pf*ph*pw, D) matmul weight."""
    d = w.shape[0]
    return {"w": np.ascontiguousarray(w.reshape(d, -1).T), "b": b}


def dit_params_from_torch(sd: Mapping[str, Array], cfg: WanDiTConfig) -> Dict:
    """Convert a Wan DiT state dict (civitai naming) to the wan_dit param tree."""
    blocks = [_block(sd, f"blocks.{i}") for i in range(cfg.num_layers)]
    extra: Dict = {}
    if "ref_conv.weight" in sd:  # Fun-Reference 2x2 conv (:333)
        w = sd["ref_conv.weight"]  # (D, 16, 2, 2)
        extra["ref_conv"] = {
            "w": np.ascontiguousarray(w.reshape(w.shape[0], -1).T),
            "b": sd["ref_conv.bias"],
        }
    if "img_emb.proj.0.weight" in sd:  # CLIP image MLP (:233-250)
        extra["img_emb"] = {
            "norm_in": {"w": sd["img_emb.proj.0.weight"], "b": sd["img_emb.proj.0.bias"]},
            "fc0": _lin(sd, "img_emb.proj.1"),
            "fc2": _lin(sd, "img_emb.proj.3"),
            "norm_out": {"w": sd["img_emb.proj.4.weight"], "b": sd["img_emb.proj.4.bias"]},
        }
        if "img_emb.emb_pos" in sd:
            extra["img_emb"]["emb_pos"] = sd["img_emb.emb_pos"][0]
    return {
        **extra,
        "patch_embedding": patch_embed_from_conv3d(
            sd["patch_embedding.weight"], sd["patch_embedding.bias"]
        ),
        "text_embedding": {
            "fc0": _lin(sd, "text_embedding.0"),
            "fc2": _lin(sd, "text_embedding.2"),
        },
        "time_embedding": {
            "fc0": _lin(sd, "time_embedding.0"),
            "fc2": _lin(sd, "time_embedding.2"),
        },
        "time_projection": _lin(sd, "time_projection.1"),
        "blocks": _stack_blocks(blocks),
        "head": {
            **_lin(sd, "head.head"),
            "modulation": sd["head.modulation"].reshape(2, -1),
        },
    }


def controlnet_params_from_torch(sd: Mapping[str, Array], cfg: ControlNetConfig) -> Dict:
    """Convert the goal-force ControlNet checkpoint (keys under controlnet_* after the
    'pipe.controlnet.' strip — /root/reference/src/goal_force/wan_video_new.py:176-178)."""
    blocks = [_block(sd, f"controlnet_dit.blocks.{i}") for i in range(cfg.num_layers)]
    zc_w = np.stack([
        sd[f"controlnet_zero_convs_after.{i}.weight"][:, :, 0].T  # (out,in,1) -> (in,out)
        for i in range(cfg.num_layers)
    ])
    zc_b = np.stack([sd[f"controlnet_zero_convs_after.{i}.bias"] for i in range(cfg.num_layers)])
    return {
        "patch_embedding": patch_embed_from_conv3d(
            sd["controlnet_patch_embedding.patch_embedding.weight"],
            sd["controlnet_patch_embedding.patch_embedding.bias"],
        ),
        "blocks": _stack_blocks(blocks),
        "zero_convs": {"w": zc_w, "b": zc_b},
    }


def _conv3d(sd: Mapping[str, Array], prefix: str) -> Dict[str, Array]:
    """torch Conv3d (out,in,kt,kh,kw) -> (kt,kh,kw,in,out)."""
    return {
        "w": np.ascontiguousarray(sd[prefix + ".weight"].transpose(2, 3, 4, 1, 0)),
        "b": sd[prefix + ".bias"],
    }


def _conv2d(sd: Mapping[str, Array], prefix: str) -> Dict[str, Array]:
    """torch Conv2d (out,in,kh,kw) -> (kh,kw,in,out)."""
    return {
        "w": np.ascontiguousarray(sd[prefix + ".weight"].transpose(2, 3, 1, 0)),
        "b": sd[prefix + ".bias"],
    }


def _vae_norm(sd: Mapping[str, Array], prefix: str) -> Dict[str, Array]:
    p = {"gamma": sd[prefix + ".gamma"].reshape(-1)}
    if prefix + ".bias" in sd:
        p["bias"] = sd[prefix + ".bias"].reshape(-1)
    return p


def _vae_res(sd: Mapping[str, Array], prefix: str) -> Dict:
    p = {
        "norm1": _vae_norm(sd, prefix + ".residual.0"),
        "conv1": _conv3d(sd, prefix + ".residual.2"),
        "norm2": _vae_norm(sd, prefix + ".residual.3"),
        "conv2": _conv3d(sd, prefix + ".residual.6"),
    }
    if prefix + ".shortcut.weight" in sd:
        p["shortcut"] = _conv3d(sd, prefix + ".shortcut")
    return p


def _vae_attn(sd: Mapping[str, Array], prefix: str) -> Dict:
    return {
        "norm": _vae_norm(sd, prefix + ".norm"),
        "to_qkv": _conv2d(sd, prefix + ".to_qkv"),
        "proj": _conv2d(sd, prefix + ".proj"),
    }


def _vae_plan_params(sd, plan, prefix: str):
    params = []
    for idx, op in enumerate(plan):
        kind = op[0]
        mp = f"{prefix}.{idx}"
        if kind == "res":
            params.append(_vae_res(sd, mp))
        elif kind == "attn":
            params.append(_vae_attn(sd, mp))
        elif kind in ("down2d", "down3d", "up2d", "up3d"):
            p = {"conv": _conv2d(sd, mp + ".resample.1")}
            if kind in ("down3d", "up3d"):
                p["time_conv"] = _conv3d(sd, mp + ".time_conv")
            params.append(p)
    return params


def vae_params_from_torch(sd: Mapping[str, Array], cfg) -> Dict:
    """Wan2.1_VAE state dict (no 'model.' prefix — the reference converter adds one at
    /root/reference/diffsynth/models/wan_video_vae.py:1260-1266; strip it before calling)."""
    from goal_force_tpu.models.vae import decoder_plan, encoder_plan

    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    enc = {
        "conv1": _conv3d(sd, "encoder.conv1"),
        "down": _vae_plan_params(sd, encoder_plan(cfg), "encoder.downsamples"),
        "mid_res1": _vae_res(sd, "encoder.middle.0"),
        "mid_attn": _vae_attn(sd, "encoder.middle.1"),
        "mid_res2": _vae_res(sd, "encoder.middle.2"),
        "head_norm": _vae_norm(sd, "encoder.head.0"),
        "head_conv": _conv3d(sd, "encoder.head.2"),
    }
    dec = {
        "conv1": _conv3d(sd, "decoder.conv1"),
        "mid_res1": _vae_res(sd, "decoder.middle.0"),
        "mid_attn": _vae_attn(sd, "decoder.middle.1"),
        "mid_res2": _vae_res(sd, "decoder.middle.2"),
        "up": _vae_plan_params(sd, decoder_plan(cfg), "decoder.upsamples"),
        "head_norm": _vae_norm(sd, "decoder.head.0"),
        "head_conv": _conv3d(sd, "decoder.head.2"),
    }
    return {
        "encoder": enc,
        "decoder": dec,
        "conv1": _conv3d(sd, "conv1"),
        "conv2": _conv3d(sd, "conv2"),
    }


def t5_params_from_torch(sd: Mapping[str, Array], cfg: T5Config) -> Dict:
    """umt5-xxl encoder (naming from
    /root/reference/diffsynth/models/wan_video_text_encoder.py:209-254)."""
    def t5_block(i):
        p = f"blocks.{i}"
        return {
            "norm1": {"w": sd[f"{p}.norm1.weight"]},
            "norm2": {"w": sd[f"{p}.norm2.weight"]},
            "attn": {
                "q": _lin(sd, f"{p}.attn.q"),
                "k": _lin(sd, f"{p}.attn.k"),
                "v": _lin(sd, f"{p}.attn.v"),
                "o": _lin(sd, f"{p}.attn.o"),
            },
            "ffn": {
                "gate": _lin(sd, f"{p}.ffn.gate.0"),
                "fc1": _lin(sd, f"{p}.ffn.fc1"),
                "fc2": _lin(sd, f"{p}.ffn.fc2"),
            },
            "pos_embedding": _t5_pos(sd, i),
        }

    def _t5_pos(sd, i):
        # umt5 carries a relative-bias table per block; shared_pos models
        # (T5 v1.1 — WanTextEncoder(shared_pos=True)) keep ONE top-level
        # table consumed at layer 0 (reference wan_video_text_encoder.py:
        # 209-254 pos_embedding wiring)
        per = f"blocks.{i}.pos_embedding.embedding.weight"
        if per in sd:
            return sd[per]
        shared = np.asarray(sd["pos_embedding.embedding.weight"])
        return shared if i == 0 else np.zeros_like(shared)

    blocks = [t5_block(i) for i in range(cfg.num_layers)]
    return {
        "token_embedding": sd["token_embedding.weight"],
        "norm": {"w": sd["norm.weight"]},
        "blocks": _stack_blocks(blocks),
    }


def t5_params_from_hf(sd: Mapping[str, Array], cfg: T5Config) -> Dict:
    """HF T5EncoderModel state dict (google/t5-v1_1-xxl — the Flux/SD3 text encoder,
    reference /root/reference/diffsynth/models/flux_text_encoder.py:7-21).
    shared_pos models carry the relative bias only at encoder.block.0; the stacked
    layer axis is padded with zeros for the other layers (t5_encode reads layer 0)."""
    import numpy as np

    def g(k):
        return np.asarray(sd[k])

    rel0 = g("encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight")

    def t5_block(i):
        p = f"encoder.block.{i}"
        return {
            "norm1": {"w": g(f"{p}.layer.0.layer_norm.weight")},
            "norm2": {"w": g(f"{p}.layer.1.layer_norm.weight")},
            "attn": {
                "q": {"w": g(f"{p}.layer.0.SelfAttention.q.weight").T},
                "k": {"w": g(f"{p}.layer.0.SelfAttention.k.weight").T},
                "v": {"w": g(f"{p}.layer.0.SelfAttention.v.weight").T},
                "o": {"w": g(f"{p}.layer.0.SelfAttention.o.weight").T},
            },
            "ffn": {
                "gate": {"w": g(f"{p}.layer.1.DenseReluDense.wi_0.weight").T},
                "fc1": {"w": g(f"{p}.layer.1.DenseReluDense.wi_1.weight").T},
                "fc2": {"w": g(f"{p}.layer.1.DenseReluDense.wo.weight").T},
            },
            "pos_embedding": rel0 if i == 0 else np.zeros_like(rel0),
        }

    blocks = [t5_block(i) for i in range(cfg.num_layers)]
    return {
        "token_embedding": g("shared.weight") if "shared.weight" in sd
        else g("encoder.embed_tokens.weight"),
        "norm": {"w": g("encoder.final_layer_norm.weight")},
        "blocks": _stack_blocks(blocks),
    }
