"""Flux ControlNet: a truncated Flux MMDiT emitting per-block residuals.

Architecture parity with /root/reference/diffsynth/models/flux_controlnet.py:
the trunk reuses the Flux joint/single blocks; the control image latents are
patchified and added to the x embedding through controlnet_x_embedder (:85-86);
an optional union-mode embedding token is prepended to the text stream (:76-80);
each trunk block feeds a zero-init linear producing a residual (:88-97); the
short residual stacks are aligned to the main DiT's 19 joint / 38 single blocks
by interval repetition (:51-56).

The main DiT consumes these via flux_dit_forward(..., controlnet_res=...,
controlnet_single_res=...) — joint residuals add to the image stream per joint
block, single residuals add to the image part of the merged stream per single
block (reference flux_dit.py:792,808).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.configs import FluxDiTConfig
from goal_force_tpu.models.flux_dit import (
    _init_joint_block,
    _init_single_block,
    _lin,
    flux_rope_tables,
    joint_block,
    patchify2d,
    single_block,
    time_cond,
)
from goal_force_tpu.models.wan_dit import linear


@dataclasses.dataclass(frozen=True)
class FluxControlNetConfig:
    """Reference FluxControlNet.__init__ (:9-26)."""

    dit: FluxDiTConfig
    num_joint_blocks: int = 5
    num_single_blocks: int = 10
    num_mode: int = 0
    additional_input_dim: int = 0


def align_res_stack(res_list, num_blocks: int):
    """Repeat each short-stack entry over an interval so len == num_blocks
    (reference :51-56); returns a stacked (num_blocks, B, S, D) array."""
    if not res_list:
        return None
    interval = (num_blocks + len(res_list) - 1) // len(res_list)
    return jnp.stack([res_list[i // interval] for i in range(num_blocks)])


def flux_controlnet_forward(
    params: Dict,
    cfg: FluxControlNetConfig,
    latents: jnp.ndarray,            # (B, H, W, 16) NHWC
    cond_latents: jnp.ndarray,       # (B, H, W, 16 + extra/4) control image latents
    timestep: jnp.ndarray,
    prompt_emb: jnp.ndarray,
    pooled_prompt_emb: jnp.ndarray,
    guidance: Optional[jnp.ndarray] = None,
    mode_id: Optional[int] = None,
    attn_impl: str = "auto",
) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Returns (joint_res (19, B, S_img, D) | None, single_res (38, ...) | None)
    aligned to the full-size DiT (reference forward :59-102)."""
    d = cfg.dit
    b, h, w, _ = latents.shape
    gh, gw = h // 2, w // 2
    temb = time_cond(params, d, timestep, pooled_prompt_emb, guidance)
    x = linear(params["x_embedder"], patchify2d(latents))
    x = x + linear(params["controlnet_x_embedder"], patchify2d(cond_latents))
    txt = linear(params["context_embedder"], prompt_emb.astype(x.dtype))
    if mode_id is not None and "mode_embedder" in params:
        tok = params["mode_embedder"][jnp.asarray([mode_id])][None]  # (1, 1, D)
        txt = jnp.concatenate(
            [jnp.broadcast_to(tok.astype(txt.dtype), (b, 1, d.dim)), txt], axis=1)
    t_len = txt.shape[1]
    cos_np, sin_np = flux_rope_tables(t_len, gh, gw, tuple(d.axes_dim),
                                      d.rope_theta)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    joint_res = []
    for i in range(cfg.num_joint_blocks):
        p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["joint_blocks"])
        x, txt = joint_block(p, x, txt, temb, cos, sin, d, attn_impl)
        zl = jax.tree_util.tree_map(lambda a, i=i: a[i], params["controlnet_blocks"])
        joint_res.append(linear(zl, x))

    single_res = []
    merged = jnp.concatenate([txt, x], axis=1)
    for i in range(cfg.num_single_blocks):
        p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["single_blocks"])
        merged = single_block(p, merged, temb, cos, sin, d, attn_impl)
        zl = jax.tree_util.tree_map(lambda a, i=i: a[i],
                                    params["controlnet_single_blocks"])
        single_res.append(linear(zl, merged[:, t_len:]))

    # reference hardcodes 19/38 (:99-100) == the full-size DiT's block counts;
    # align to the paired DiT config so tiny geometries stay consistent
    return (align_res_stack(joint_res, d.num_joint_blocks),
            align_res_stack(single_res, d.num_single_blocks))


# ---------------------------------------------------------------------------
# Init + converter
# ---------------------------------------------------------------------------

def init_flux_controlnet(key, cfg: FluxControlNetConfig,
                         dtype=jnp.bfloat16) -> Dict:
    d = cfg.dit
    ks = jax.random.split(key, 12)
    joint = [_init_joint_block(k, d, dtype)
             for k in jax.random.split(ks[0], cfg.num_joint_blocks)]
    single = [_init_single_block(k, d, dtype)
              for k in jax.random.split(ks[1], max(cfg.num_single_blocks, 1))]
    stack = lambda rows: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *rows)
    zlin = lambda n: {"w": jnp.zeros((n, d.dim, d.dim), dtype),
                      "b": jnp.zeros((n, d.dim), dtype)}
    params = {
        "x_embedder": _lin(ks[2], d.in_dim, d.dim, dtype),
        "controlnet_x_embedder": _lin(
            ks[3], d.in_dim + cfg.additional_input_dim, d.dim, dtype),
        "context_embedder": _lin(ks[4], d.text_dim, d.dim, dtype),
        "time_in": {"fc0": _lin(ks[5], d.freq_dim, d.dim, dtype),
                    "fc2": _lin(ks[5], d.dim, d.dim, dtype)},
        "vector_in": {"fc0": _lin(ks[6], d.pooled_dim, d.dim, dtype),
                      "fc2": _lin(ks[6], d.dim, d.dim, dtype)},
        "joint_blocks": stack(joint),
        "controlnet_blocks": zlin(cfg.num_joint_blocks),
    }
    if cfg.num_single_blocks:
        params["single_blocks"] = stack(single)
        params["controlnet_single_blocks"] = zlin(cfg.num_single_blocks)
    if d.guidance_embed:
        params["guidance_in"] = {"fc0": _lin(ks[7], d.freq_dim, d.dim, dtype),
                                 "fc2": _lin(ks[7], d.dim, d.dim, dtype)}
    if cfg.num_mode:
        params["mode_embedder"] = jax.random.normal(
            ks[8], (cfg.num_mode, d.dim), dtype)
    return params


def flux_controlnet_params_from_torch(sd, cfg: FluxControlNetConfig) -> Dict:
    """Consume the diffsynth-converted layout (reference converter :216-327):
    blocks.N.* / single_blocks.N.* with fused a_to_qkv / b_to_qkv / to_qkv_mlp,
    plus controlnet_blocks.N and controlnet_x_embedder."""
    from goal_force_tpu.models.flux_dit import (_joint_block_from_torch,
                                                _single_block_from_torch)

    g = lambda k: np.asarray(sd[k])
    lin = lambda pre: {"w": g(pre + ".weight").T, "b": g(pre + ".bias")}
    stack = lambda rows: jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *rows)
    params = {
        "x_embedder": lin("x_embedder"),
        "controlnet_x_embedder": lin("controlnet_x_embedder"),
        "context_embedder": lin("context_embedder"),
        "time_in": {"fc0": lin("time_embedder.timestep_embedder.0"),
                    "fc2": lin("time_embedder.timestep_embedder.2")},
        "vector_in": {"fc0": lin("pooled_text_embedder.0"),
                      "fc2": lin("pooled_text_embedder.2")},
        "joint_blocks": stack([_joint_block_from_torch(sd, f"blocks.{i}")
                               for i in range(cfg.num_joint_blocks)]),
        "controlnet_blocks": stack([lin(f"controlnet_blocks.{i}")
                                    for i in range(cfg.num_joint_blocks)]),
    }
    if cfg.num_single_blocks:
        params["single_blocks"] = stack(
            [_single_block_from_torch(sd, f"single_blocks.{i}")
             for i in range(cfg.num_single_blocks)])
        params["controlnet_single_blocks"] = stack(
            [lin(f"controlnet_single_blocks.{i}")
             for i in range(cfg.num_single_blocks)])
    if "guidance_embedder.timestep_embedder.0.weight" in sd:
        params["guidance_in"] = {
            "fc0": lin("guidance_embedder.timestep_embedder.0"),
            "fc2": lin("guidance_embedder.timestep_embedder.2")}
    if "controlnet_mode_embedder.weight" in sd:
        params["mode_embedder"] = jnp.asarray(g("controlnet_mode_embedder.weight"))
    return params
