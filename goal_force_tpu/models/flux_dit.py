"""Flux.1 MMDiT as pure functions over a param pytree.

Architecture parity with /root/reference/diffsynth/models/flux_dit.py:
RoPEEmbedding (:15-42), FluxJointAttention (:46-105), FluxJointTransformerBlock
(:109-149), FluxSingleTransformerBlock (:206-259), AdaLayerNorm[Single/Continuous]
(:190-202, :263-274 and sd3_dit.py:85-107), FluxDiT.forward (:406-472) — rebuilt
TPU-first:

- channels-last (B, H, W, 16) latents; the 2x2 patchify is a reshape+matmul with
  (c, dy, dx) feature order matching the reference rearrange "B C (H P) (W Q) ->
  B (H W) (C P Q)" (:297-304).
- the 19 joint blocks and 38 single blocks are STACKED along a leading layer axis
  and driven by two lax.scan loops; remat wraps the bodies for training.
- 3-axis RoPE (text ids zero -> identity rotation; image ids (0, row, col) over
  axes_dim 16/56/56, :307-321) becomes host-built f32 cos/sin tables applied with
  ops/rope.apply_rope (the same interleaved-pair rotation, :66-71).
- joint attention concatenates text-before-image (:88-90); activations are
  sp-sharded between blocks and head-sharded inside attention via the shared
  attention() dispatch (Pallas flash on TPU).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.configs import FluxDiTConfig
from goal_force_tpu.models.wan_dit import gelu_tanh, layer_norm, linear, rms_norm
from goal_force_tpu.ops.attention import attention
from goal_force_tpu.ops.rope import apply_rope
from goal_force_tpu.parallel.mesh import constrain


# ---------------------------------------------------------------------------
# RoPE over (axis0=const, axis1=row, axis2=col) ids
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def flux_rope_tables(text_len: int, grid_h: int, grid_w: int,
                     axes_dim: Tuple[int, ...], theta: float,
                     kontext_grids: Tuple[Tuple[int, int], ...] = ()):
    """(S_total, head_dim//2) f32 cos/sin for cat(text_ids=0, image_ids
    [, kontext_ids]).

    image ids: (0, row, col) per latent 2x2 patch (reference prepare_image_ids
    :307-321); kontext reference images use axis-0 id 1
    (flux_image_new.py:654-655); per-axis angles pos/theta^(2j/dim_i)
    (reference rope() :23-36, computed in f64 there and here on host).
    """
    s_img = grid_h * grid_w
    s_k = sum(gh * gw for gh, gw in kontext_grids)
    ids = np.zeros((text_len + s_img + s_k, 3), np.float64)
    ids[text_len:text_len + s_img, 1] = np.repeat(np.arange(grid_h), grid_w)
    ids[text_len:text_len + s_img, 2] = np.tile(np.arange(grid_w), grid_h)
    off = text_len + s_img
    for gh, gw in kontext_grids:
        ids[off:off + gh * gw, 0] = 1.0
        ids[off:off + gh * gw, 1] = np.repeat(np.arange(gh), gw)
        ids[off:off + gh * gw, 2] = np.tile(np.arange(gw), gh)
        off += gh * gw
    parts_cos, parts_sin = [], []
    for i, d in enumerate(axes_dim):
        omega = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        ang = np.outer(ids[:, i], omega)          # (S, d//2)
        parts_cos.append(np.cos(ang))
        parts_sin.append(np.sin(ang))
    cos = np.concatenate(parts_cos, axis=-1).astype(np.float32)
    sin = np.concatenate(parts_sin, axis=-1).astype(np.float32)
    return cos, sin


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _ada_mod(p, temb, n):
    """AdaLayerNorm modulation vector: linear(silu(temb)) -> n chunks of (B, 1, D)
    (reference sd3_dit.py:93-107)."""
    e = linear(p, jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
    return [c[:, None, :] for c in jnp.split(e, n, axis=-1)]


def _heads(x, n):
    b, s, d = x.shape
    return x.reshape(b, s, n, d // n)


def _ip_attend(q, ip, dtype):
    """IP-Adapter side attention: same query over the projected image K/V,
    scaled and added to the attention output pre-projection (reference
    flux_dit.py:7-11 interact_with_ipadapter). q: (B, S, N, H); ip k/v:
    (B*, T, N, H)."""
    b = q.shape[0]
    k = jnp.broadcast_to(ip["k"], (b,) + ip["k"].shape[1:]).astype(dtype)
    v = jnp.broadcast_to(ip["v"], (b,) + ip["v"].shape[1:]).astype(dtype)
    logits = jnp.einsum("bqnc,bknc->bnqk", q, k) / math.sqrt(q.shape[-1])
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(dtype)
    return ip["scale"] * jnp.einsum("bnqk,bknc->bqnc", probs, v)


def joint_block(p, x_img, x_txt, temb, cos, sin, cfg: FluxDiTConfig,
                attn_impl: str = "auto", attn_bias=None, ip=None):
    """One double-stream block (reference FluxJointTransformerBlock :132-149)."""
    n = cfg.num_heads
    sm_a, sc_a, g_a, smlp_a, scmlp_a, gmlp_a = _ada_mod(p["norm1_a"], temb, 6)
    sm_b, sc_b, g_b, smlp_b, scmlp_b, gmlp_b = _ada_mod(p["norm1_b"], temb, 6)
    h_a = layer_norm(x_img, cfg.eps) * (1 + sc_a) + sm_a
    h_b = layer_norm(x_txt, cfg.eps) * (1 + sc_b) + sm_b

    qkv_a = linear(p["attn"]["a_qkv"], h_a)
    qkv_b = linear(p["attn"]["b_qkv"], h_b)
    q_a, k_a, v_a = jnp.split(qkv_a, 3, axis=-1)
    q_b, k_b, v_b = jnp.split(qkv_b, 3, axis=-1)
    q_a = rms_norm(_heads(q_a, n), p["attn"]["norm_q_a"]["w"], cfg.eps)
    k_a = rms_norm(_heads(k_a, n), p["attn"]["norm_k_a"]["w"], cfg.eps)
    q_b = rms_norm(_heads(q_b, n), p["attn"]["norm_q_b"]["w"], cfg.eps)
    k_b = rms_norm(_heads(k_b, n), p["attn"]["norm_k_b"]["w"], cfg.eps)
    # text stream first in the joint sequence (reference :88-90)
    q = jnp.concatenate([q_b, q_a], axis=1)
    k = jnp.concatenate([k_b, k_a], axis=1)
    v = jnp.concatenate([_heads(v_b, n), _heads(v_a, n)], axis=1)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    q = constrain(q, "dp", None, ("sp", "tp"), None)
    k = constrain(k, "dp", None, ("sp", "tp"), None)
    v = constrain(v, "dp", None, ("sp", "tp"), None)
    out = attention(q, k, v, impl=attn_impl, bias=attn_bias)
    out = constrain(out, "dp", "sp", None, None)
    b, s, _, _ = out.shape
    t = x_txt.shape[1]
    if ip is not None:
        # image-stream query attends the IP tokens (reference :98-99)
        out = out.at[:, t:].add(_ip_attend(q[:, t:], ip, out.dtype))
    out = out.reshape(b, s, cfg.dim)
    o_txt = linear(p["attn"]["b_out"], out[:, :t])
    o_img = linear(p["attn"]["a_out"], out[:, t:])

    x_img = x_img + g_a * o_img
    h_a = layer_norm(x_img, cfg.eps) * (1 + scmlp_a) + smlp_a
    x_img = x_img + gmlp_a * linear(p["ff_a"]["fc2"], gelu_tanh(linear(p["ff_a"]["fc0"], h_a)))

    x_txt = x_txt + g_b * o_txt
    h_b = layer_norm(x_txt, cfg.eps) * (1 + scmlp_b) + smlp_b
    x_txt = x_txt + gmlp_b * linear(p["ff_b"]["fc2"], gelu_tanh(linear(p["ff_b"]["fc0"], h_b)))
    return x_img, x_txt


def single_block(p, x, temb, cos, sin, cfg: FluxDiTConfig,
                 attn_impl: str = "auto", attn_bias=None, ip=None):
    """One single-stream block (reference FluxSingleTransformerBlock :246-259):
    fused qkv+mlp projection, parallel attention+GELU, joint output projection."""
    n = cfg.num_heads
    d = cfg.dim
    shift, scale, gate = _ada_mod(p["norm"], temb, 3)
    h = layer_norm(x, cfg.eps) * (1 + scale) + shift
    fused = linear(p["qkv_mlp"], h)                       # (B, S, 7D)
    q, k, v, mlp = jnp.split(fused, [d, 2 * d, 3 * d], axis=-1)
    q = rms_norm(_heads(q, n), p["norm_q"]["w"], cfg.eps)
    k = rms_norm(_heads(k, n), p["norm_k"]["w"], cfg.eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    q = constrain(q, "dp", None, ("sp", "tp"), None)
    k = constrain(k, "dp", None, ("sp", "tp"), None)
    v = constrain(_heads(v, n), "dp", None, ("sp", "tp"), None)
    att = attention(q, k, v, impl=attn_impl, bias=attn_bias)
    att = constrain(att, "dp", "sp", None, None)
    if ip is not None:
        # the single-stream query (text+image merged) attends the IP tokens
        # (reference :241-242)
        att = att + _ip_attend(q, ip, att.dtype)
    att = att.reshape(x.shape[0], x.shape[1], d)
    out = linear(p["proj_out"], jnp.concatenate([att, gelu_tanh(mlp)], axis=-1))
    return x + gate * out


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------

def _mlp_embed(p, x):
    """Linear-SiLU-Linear (TimestepEmbeddings.timestep_embedder / pooled_text_embedder,
    reference sd3_dit.py:74-76, flux_dit.py:284)."""
    h = linear(p["fc0"], x)
    return linear(p["fc2"], jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype))


def eligen_entity_bias(entity_masks: jnp.ndarray, txt_len: int,
                       s_img: int) -> jnp.ndarray:
    """EliGen attention bias (B, 1, S, S), S = (M+1)*txt_len + s_img.

    Reference construct_mask (flux_dit.py:343-376): each entity's prompt block
    attends only its own image patches (and vice versa), entity prompts don't
    attend each other, the global prompt (appended LAST) and image-image
    attention stay dense. entity_masks: (B, M, H, W) binary at latent
    resolution."""
    b, m, h, w = entity_masks.shape
    patch = entity_masks.reshape(b, m, h // 2, 2, w // 2, 2)
    patch = (patch.sum((3, 5)) > 0).reshape(b, m, s_img)
    n = m + 1                                      # + global prompt
    s = n * txt_len + s_img
    mask = jnp.ones((b, s, s), bool)
    img0 = n * txt_len
    for i in range(m):
        p0, p1 = i * txt_len, (i + 1) * txt_len
        im = jnp.repeat(patch[:, i][:, None], txt_len, axis=1)  # (B, L, S_img)
        mask = mask.at[:, p0:p1, img0:].set(im)
        mask = mask.at[:, img0:, p0:p1].set(im.transpose(0, 2, 1))
    # ALL distinct prompt blocks are mutually masked — including the global
    # prompt appended last (reference loops over N = m+1 blocks :363-370)
    for i in range(n):
        for j in range(n):
            if i != j:
                mask = mask.at[:, i * txt_len:(i + 1) * txt_len,
                               j * txt_len:(j + 1) * txt_len].set(False)
    return jnp.where(mask, 0.0, -jnp.inf)[:, None]


def patchify2d(x):
    """(B, H, W, C) -> (B, H/2*W/2, C*4) with (c, dy, dx) feature order (:297-299)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpatchify2d(x, grid_h: int, grid_w: int, out_channels: int):
    """(B, S, C*4) -> (B, H, W, C), inverse of patchify2d (:302-304)."""
    b = x.shape[0]
    x = x.reshape(b, grid_h, grid_w, out_channels, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, grid_h * 2, grid_w * 2, out_channels)


def time_cond(params, cfg: FluxDiTConfig, timestep, pooled, guidance=None):
    """conditioning = time_emb + pooled_emb (+ guidance_emb) (reference :425-428)."""
    from goal_force_tpu.models.sd_unet import timestep_embedding

    dtype = params["x_embedder"]["w"].dtype
    cond = _mlp_embed(params["time_in"],
                      timestep_embedding(timestep, cfg.freq_dim).astype(dtype))
    cond = cond + _mlp_embed(params["vector_in"], pooled.astype(dtype))
    if cfg.guidance_embed and guidance is not None:
        cond = cond + _mlp_embed(
            params["guidance_in"],
            timestep_embedding(guidance * 1000.0, cfg.freq_dim).astype(dtype))
    return cond


def flux_dit_forward(
    params: Dict,
    cfg: FluxDiTConfig,
    latents: jnp.ndarray,          # (B, H, W, 16) NHWC
    timestep: jnp.ndarray,         # (B,)
    prompt_emb: jnp.ndarray,       # (B, L_txt, text_dim) T5 states
    pooled_prompt_emb: jnp.ndarray,  # (B, pooled_dim) CLIP pooled
    guidance: Optional[jnp.ndarray] = None,   # (B,) embedded guidance (Flux-dev)
    remat: bool = False,
    attn_impl: str = "auto",
    controlnet_res: Optional[jnp.ndarray] = None,         # (19, B, S_img, D)
    controlnet_single_res: Optional[jnp.ndarray] = None,  # (38, B, S_img, D)
    kontext_latents: Optional[jnp.ndarray] = None,        # (B, Hk, Wk, 16)
    entity_prompt_emb: Optional[jnp.ndarray] = None,      # (B, M, L, text_dim)
    entity_masks: Optional[jnp.ndarray] = None,           # (B, M, H, W)
    rope_tables_override: Optional[Tuple] = None,         # (cos, sin) host arrays
    return_tokens: bool = False,
    ipadapter: Optional[Dict] = None,   # {"joint": {k,v,scale} stacked 19,
                                        #  "single": ... stacked 38} — see
                                        # flux_ip_kwargs below
):
    """Full MMDiT forward (reference FluxDiT.forward :406-472). Returns the velocity
    prediction with the input latent shape.

    controlnet_res / controlnet_single_res: per-block residual stacks from
    flux_controlnet_forward, added to the image stream after each joint block and
    to the image part of the merged stream after each single block (reference
    :792,808).
    kontext_latents: Flux-Kontext reference image latents appended to the
    image token stream with axis-0 rope id 1; the output keeps only the
    original image tokens (reference flux_image_new.py:1221-1224)."""
    b, h, w, _ = latents.shape
    gh, gw = h // 2, w // 2
    temb = time_cond(params, cfg, timestep, pooled_prompt_emb, guidance)
    x = linear(params["x_embedder"], patchify2d(latents))
    s_img = x.shape[1]
    kontext_grids = ()
    if kontext_latents is not None:
        kg = (kontext_latents.shape[1] // 2, kontext_latents.shape[2] // 2)
        kontext_grids = (kg,)
        xk = linear(params["x_embedder"], patchify2d(kontext_latents))
        x = jnp.concatenate([x, xk], axis=1)
    attn_bias = None
    if entity_prompt_emb is not None and entity_masks is not None:
        # EliGen (reference process_entity_masks :378-403): local prompts
        # first, global prompt LAST, block-structured attention bias
        locals_ = entity_prompt_emb.astype(x.dtype)
        bb, m, ll, _ = locals_.shape
        merged_txt = jnp.concatenate(
            [locals_.reshape(bb, m * ll, -1), prompt_emb.astype(x.dtype)],
            axis=1)
        txt = linear(params["context_embedder"], merged_txt)
        attn_bias = eligen_entity_bias(entity_masks, prompt_emb.shape[1],
                                       x.shape[1])
    else:
        txt = linear(params["context_embedder"], prompt_emb.astype(x.dtype))
    t_len = txt.shape[1]
    if rope_tables_override is not None:
        # e.g. NexusGen editing: spatial text ids instead of zeros
        # (flux_image_new.py:815-835)
        cos_np, sin_np = rope_tables_override
    else:
        cos_np, sin_np = flux_rope_tables(t_len, gh, gw, tuple(cfg.axes_dim),
                                          cfg.rope_theta, kontext_grids)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    ip_joint = None if ipadapter is None else ipadapter.get("joint")
    ip_single = None if ipadapter is None else ipadapter.get("single")

    def joint_body(carry, sc):
        p, res, ip = sc
        xi, xt = carry
        xi = constrain(xi, "dp", "sp", None)
        xi, xt = joint_block(p, xi, xt, temb, cos, sin, cfg, attn_impl,
                             attn_bias=attn_bias, ip=ip)
        if res is not None:
            xi = xi + res.astype(xi.dtype)
        return (xi, xt), None

    def single_body(carry, sc):
        p, res, ip = sc
        carry = constrain(carry, "dp", "sp", None)
        carry = single_block(p, carry, temb, cos, sin, cfg, attn_impl,
                             attn_bias=attn_bias, ip=ip)
        if res is not None:
            carry = carry.at[:, t_len:].add(res.astype(carry.dtype))
        return carry, None

    if remat:
        joint_body = jax.checkpoint(joint_body, prevent_cse=False)
        single_body = jax.checkpoint(single_body, prevent_cse=False)

    pad_res = lambda r: r if (r is None or x.shape[1] == s_img) else \
        jnp.pad(r, ((0, 0), (0, 0), (0, x.shape[1] - s_img), (0, 0)))
    x_in = x
    (x, txt), _ = jax.lax.scan(joint_body, (x, txt),
                               (params["joint_blocks"], pad_res(controlnet_res),
                                ip_joint))
    merged = jnp.concatenate([txt, x], axis=1)
    merged, _ = jax.lax.scan(single_body, merged,
                             (params["single_blocks"],
                              pad_res(controlnet_single_res), ip_single))
    x = merged[:, t_len:t_len + s_img]

    v = flux_dit_head(params, cfg, x, temb, gh, gw)
    if return_tokens:
        # TeaCache needs the pre-blocks and post-blocks image tokens
        # (reference flux_image_new.py:1079-1106)
        return v, x_in[:, :s_img], x
    return v


def flux_dit_head(params: Dict, cfg: FluxDiTConfig, x: jnp.ndarray,
                  temb: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """Final AdaLayerNormContinuous + projection + unpatchify (reference
    :270-274, :466-470); standalone so TeaCache skip steps can reuse it."""
    e = linear(params["final_norm"], jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
    scale, shift = jnp.split(e, 2, axis=-1)
    x = layer_norm(x, cfg.eps) * (1 + scale[:, None]) + shift[:, None]
    x = linear(params["final_proj"], x)
    return unpatchify2d(x, gh, gw, cfg.out_dim // 4)


def flux_dit_mod_input(params: Dict, cfg: FluxDiTConfig, latents: jnp.ndarray,
                       timestep: jnp.ndarray, pooled_prompt_emb: jnp.ndarray,
                       guidance: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Block-0 modulated image-stream input — the TeaCache change signal
    (reference tea_cache.check: norm1_a(x_embed, emb=conditioning))."""
    temb = time_cond(params, cfg, timestep, pooled_prompt_emb, guidance)
    x = linear(params["x_embedder"], patchify2d(latents))
    p0 = jax.tree_util.tree_map(lambda a: a[0], params["joint_blocks"])
    sm, sc, *_ = _ada_mod(p0["norm1_a"], temb, 6)
    return layer_norm(x, cfg.eps) * (1 + sc) + sm


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _lin(key, d_in, d_out, dtype):
    scale = 1.0 / math.sqrt(d_in)
    return {
        "w": jax.random.uniform(key, (d_in, d_out), dtype, -scale, scale),
        "b": jnp.zeros((d_out,), dtype),
    }


def _init_joint_block(key, cfg: FluxDiTConfig, dtype):
    d = cfg.dim
    ks = jax.random.split(key, 10)
    return {
        "norm1_a": _lin(ks[0], d, 6 * d, dtype),
        "norm1_b": _lin(ks[1], d, 6 * d, dtype),
        "attn": {
            "a_qkv": _lin(ks[2], d, 3 * d, dtype),
            "b_qkv": _lin(ks[3], d, 3 * d, dtype),
            "norm_q_a": {"w": jnp.ones((cfg.head_dim,), dtype)},
            "norm_k_a": {"w": jnp.ones((cfg.head_dim,), dtype)},
            "norm_q_b": {"w": jnp.ones((cfg.head_dim,), dtype)},
            "norm_k_b": {"w": jnp.ones((cfg.head_dim,), dtype)},
            "a_out": _lin(ks[4], d, d, dtype),
            "b_out": _lin(ks[5], d, d, dtype),
        },
        "ff_a": {"fc0": _lin(ks[6], d, 4 * d, dtype), "fc2": _lin(ks[7], 4 * d, d, dtype)},
        "ff_b": {"fc0": _lin(ks[8], d, 4 * d, dtype), "fc2": _lin(ks[9], 4 * d, d, dtype)},
    }


def _init_single_block(key, cfg: FluxDiTConfig, dtype):
    d = cfg.dim
    ks = jax.random.split(key, 3)
    return {
        "norm": _lin(ks[0], d, 3 * d, dtype),
        "qkv_mlp": _lin(ks[1], d, 7 * d, dtype),
        "norm_q": {"w": jnp.ones((cfg.head_dim,), dtype)},
        "norm_k": {"w": jnp.ones((cfg.head_dim,), dtype)},
        "proj_out": _lin(ks[2], 5 * d, d, dtype),
    }


def init_flux_dit(key, cfg: FluxDiTConfig, dtype=jnp.bfloat16) -> Dict:
    ks = jax.random.split(key, 9)
    joint = [_init_joint_block(k, cfg, dtype)
             for k in jax.random.split(ks[0], cfg.num_joint_blocks)]
    single = [_init_single_block(k, cfg, dtype)
              for k in jax.random.split(ks[1], cfg.num_single_blocks)]
    params = {
        "x_embedder": _lin(ks[2], cfg.in_dim, cfg.dim, dtype),
        "context_embedder": _lin(ks[3], cfg.text_dim, cfg.dim, dtype),
        "time_in": {"fc0": _lin(ks[4], cfg.freq_dim, cfg.dim, dtype),
                    "fc2": _lin(ks[4], cfg.dim, cfg.dim, dtype)},
        "vector_in": {"fc0": _lin(ks[5], cfg.pooled_dim, cfg.dim, dtype),
                      "fc2": _lin(ks[5], cfg.dim, cfg.dim, dtype)},
        "joint_blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *joint),
        "single_blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *single),
        "final_norm": _lin(ks[6], cfg.dim, 2 * cfg.dim, dtype),
        "final_proj": _lin(ks[7], cfg.dim, cfg.out_dim, dtype),
    }
    if cfg.guidance_embed:
        params["guidance_in"] = {"fc0": _lin(ks[8], cfg.freq_dim, cfg.dim, dtype),
                                 "fc2": _lin(ks[8], cfg.dim, cfg.dim, dtype)}
    return params


# ---------------------------------------------------------------------------
# Converter (diffsynth-format state dict, the naming FluxDiT's own converters emit:
# reference flux_dit.py:558-748)
# ---------------------------------------------------------------------------

def _joint_block_from_torch(sd, pre: str) -> Dict:
    g = lambda k: np.asarray(sd[k])
    lin = lambda p: {"w": g(p + ".weight").T, "b": g(p + ".bias")}
    return {
        "norm1_a": lin(pre + ".norm1_a.linear"),
        "norm1_b": lin(pre + ".norm1_b.linear"),
        "attn": {
            "a_qkv": lin(pre + ".attn.a_to_qkv"),
            "b_qkv": lin(pre + ".attn.b_to_qkv"),
            "norm_q_a": {"w": g(pre + ".attn.norm_q_a.weight")},
            "norm_k_a": {"w": g(pre + ".attn.norm_k_a.weight")},
            "norm_q_b": {"w": g(pre + ".attn.norm_q_b.weight")},
            "norm_k_b": {"w": g(pre + ".attn.norm_k_b.weight")},
            "a_out": lin(pre + ".attn.a_to_out"),
            "b_out": lin(pre + ".attn.b_to_out"),
        },
        "ff_a": {"fc0": lin(pre + ".ff_a.0"), "fc2": lin(pre + ".ff_a.2")},
        "ff_b": {"fc0": lin(pre + ".ff_b.0"), "fc2": lin(pre + ".ff_b.2")},
    }


def _single_block_from_torch(sd, pre: str) -> Dict:
    g = lambda k: np.asarray(sd[k])
    lin = lambda p: {"w": g(p + ".weight").T, "b": g(p + ".bias")}
    return {
        "norm": lin(pre + ".norm.linear"),
        "qkv_mlp": lin(pre + ".to_qkv_mlp"),
        "norm_q": {"w": g(pre + ".norm_q_a.weight")},
        "norm_k": {"w": g(pre + ".norm_k_a.weight")},
        "proj_out": lin(pre + ".proj_out"),
    }


def flux_dit_params_from_torch(sd, cfg: FluxDiTConfig) -> Dict:
    g = lambda k: np.asarray(sd[k])
    lin = lambda p: {"w": g(p + ".weight").T, "b": g(p + ".bias")}
    mlp = lambda p: {"fc0": lin(p + ".0"), "fc2": lin(p + ".2")}

    stack = lambda blocks: jax.tree_util.tree_map(lambda *xs: jnp.stack(
        [jnp.asarray(x) for x in xs]), *blocks)
    params = {
        "x_embedder": lin("x_embedder"),
        "context_embedder": lin("context_embedder"),
        "time_in": mlp("time_embedder.timestep_embedder"),
        "vector_in": mlp("pooled_text_embedder"),
        "joint_blocks": stack([_joint_block_from_torch(sd, f"blocks.{i}")
                               for i in range(cfg.num_joint_blocks)]),
        "single_blocks": stack([_single_block_from_torch(sd, f"single_blocks.{i}")
                                for i in range(cfg.num_single_blocks)]),
        "final_norm": lin("final_norm_out.linear"),
        "final_proj": lin("final_proj_out"),
    }
    if cfg.guidance_embed and "guidance_embedder.timestep_embedder.0.weight" in sd:
        params["guidance_in"] = mlp("guidance_embedder.timestep_embedder")
    return params
