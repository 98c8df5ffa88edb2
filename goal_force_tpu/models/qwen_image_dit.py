"""Qwen-Image DiT as pure functions over a param pytree.

Architecture parity with /root/reference/diffsynth/models/qwen_image_dit.py:
QwenEmbedRope with scale_rope — CENTERED h/w coordinates (negative indices on the
upper half, :61-166) and text positions offset past max(h//2, w//2);
QwenDoubleStreamAttention (separate per-stream qkv with rope on BOTH streams,
:248-318), QwenImageTransformerBlock (6-way modulation split as 2x(shift, scale,
gate), sigmoid-GELU MLPs, :320-402), QwenImageDiT.forward (:502-538 — NOTE the
reference returns the (B, S, 64) image TOKENS; unpatchify happens in the
pipeline).

TPU-first: the 60 blocks are stacked and scanned; rope tables are host-built
(S, head_dim/2) cos/sin applied with ops/rope.apply_rope.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.wan_dit import layer_norm, linear, rms_norm
from goal_force_tpu.ops.attention import attention
from goal_force_tpu.ops.rope import apply_rope
from goal_force_tpu.parallel.mesh import constrain


@dataclasses.dataclass(frozen=True)
class QwenImageDiTConfig:
    dim: int = 3072
    num_heads: int = 24
    head_dim: int = 128
    num_layers: int = 60
    in_dim: int = 64                 # 2x2-patchified 16ch latents
    text_dim: int = 3584             # Qwen2.5-VL hidden
    freq_dim: int = 256
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 10000.0
    eps: float = 1e-6


@lru_cache(maxsize=8)
def qwen_rope_tables_multi(shapes, txt_len: int, axes_dim: Tuple[int, ...],
                           theta: float, interpolate: bool = False):
    """((S_img, D/2), (S_txt, D/2)) cos/sin pairs (reference QwenEmbedRope.forward
    with scale_rope=True :124-166) for a LIST of image grids.

    shapes: sequence of (gh, gw) token grids — the i-th shape's frame axis sits
    at position i (main latents 0, context/edit images 1, 2, ... :136-141);
    h/w positions are centered (range(-(n - n//2), n//2)); text positions start
    at max over shapes of max(gh//2, gw//2) on all three axes (:158-163).

    interpolate: Qwen-Image-Edit edit_rope_interpolation — extra grids (idx>0)
    take their spatial rope by linspace-SAMPLING grid 0's positions instead of
    their own centered range (reference forward_sampling :169-195)."""
    halves = [d // 2 for d in axes_dim]

    def axis_angles(pos, d):
        freqs = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        return np.outer(np.asarray(pos, np.float64), freqs)

    parts = []
    for idx, (gh, gw) in enumerate(shapes):
        af = axis_angles([idx], axes_dim[0])                 # (1, 8)
        if interpolate and idx > 0:
            gh0, gw0 = shapes[0]
            h_pos0 = np.arange(-(gh0 - gh0 // 2), gh0 // 2)
            w_pos0 = np.arange(-(gw0 - gw0 // 2), gw0 // 2)
            ah = axis_angles(
                h_pos0[np.linspace(0, gh0 - 1, gh).astype(np.int64)],
                axes_dim[1])
            aw = axis_angles(
                w_pos0[np.linspace(0, gw0 - 1, gw).astype(np.int64)],
                axes_dim[2])
        else:
            ah = axis_angles(np.arange(-(gh - gh // 2), gh // 2), axes_dim[1])
            aw = axis_angles(np.arange(-(gw - gw // 2), gw // 2), axes_dim[2])
        parts.append(np.concatenate([
            np.broadcast_to(af[:, None, None, :], (1, gh, gw, halves[0])),
            np.broadcast_to(ah[None, :, None, :], (1, gh, gw, halves[1])),
            np.broadcast_to(aw[None, None, :, :], (1, gh, gw, halves[2])),
        ], axis=-1).reshape(gh * gw, -1))
    img = np.concatenate(parts, axis=0)

    start = max(max(gh // 2, gw // 2) for gh, gw in shapes)
    tpos = np.arange(start, start + txt_len)
    txt = np.concatenate([axis_angles(tpos, d) for d in axes_dim], axis=-1)
    return ((np.cos(img).astype(np.float32), np.sin(img).astype(np.float32)),
            (np.cos(txt).astype(np.float32), np.sin(txt).astype(np.float32)))


def qwen_rope_tables(gh: int, gw: int, txt_len: int, axes_dim: Tuple[int, ...],
                     theta: float):
    """Single-grid convenience wrapper over qwen_rope_tables_multi."""
    return qwen_rope_tables_multi(((gh, gw),), txt_len, axes_dim, theta)


def _approx_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _mod3(e):
    shift, scale, gate = jnp.split(e, 3, axis=-1)
    return shift[:, None], scale[:, None], gate[:, None]


def _qwen_entity_bias(entity_masks, seg_lens, s_img_total: int, s_main: int):
    """(B, 1, S, S) additive attention bias for EliGen (reference
    process_entity_masks :448-496). seg_lens lists each text segment's length
    with the global prompt LAST; entity_masks (B, M, h_lat, w_lat) are tiled
    over extra image tokens (:478-480)."""
    b, m = entity_masks.shape[:2]
    gh, gw = entity_masks.shape[2] // 2, entity_masks.shape[3] // 2
    patch = entity_masks.reshape(b, m, gh, 2, gw, 2)
    patch = (patch.sum(axis=(3, 5)) > 0).reshape(b, m, gh * gw)
    patch = jnp.tile(patch, (1, 1, s_img_total // s_main))
    s_txt = int(sum(seg_lens))
    s = s_txt + s_img_total
    allow = jnp.ones((b, s, s), bool)
    cum = np.cumsum([0] + list(seg_lens))
    for i in range(m):  # the global prompt (last segment) stays dense
        st, en = int(cum[i]), int(cum[i + 1])
        im = jnp.repeat(patch[:, i][:, None], en - st, axis=1)
        allow = allow.at[:, st:en, s_txt:].set(im)
        allow = allow.at[:, s_txt:, st:en].set(im.transpose(0, 2, 1))
    n = len(seg_lens)
    for i in range(n):
        for j in range(n):
            if i != j:
                allow = allow.at[:, int(cum[i]):int(cum[i + 1]),
                                 int(cum[j]):int(cum[j + 1])].set(False)
    return jnp.where(allow, 0.0, -jnp.inf)[:, None]


def qwen_block(p, img, txt, temb, img_rope, txt_rope, cfg: QwenImageDiTConfig,
               attn_impl="auto", attn_bias=None):
    """QwenImageTransformerBlock.forward (:360-402)."""
    n = cfg.num_heads
    e_img = linear(p["img_mod"], jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
    e_txt = linear(p["txt_mod"], jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
    img_attn_mod, img_mlp_mod = jnp.split(e_img, 2, axis=-1)
    txt_attn_mod, txt_mlp_mod = jnp.split(e_txt, 2, axis=-1)

    sh, sc, g_img = _mod3(img_attn_mod)
    h_img = layer_norm(img, cfg.eps) * (1 + sc) + sh
    sh, sc, g_txt = _mod3(txt_attn_mod)
    h_txt = layer_norm(txt, cfg.eps) * (1 + sc) + sh

    b, si, _ = img.shape
    st = txt.shape[1]
    a = p["attn"]
    qi = rms_norm(linear(a["to_q"], h_img).reshape(b, si, n, -1), a["norm_q"]["w"], cfg.eps)
    ki = rms_norm(linear(a["to_k"], h_img).reshape(b, si, n, -1), a["norm_k"]["w"], cfg.eps)
    vi = linear(a["to_v"], h_img).reshape(b, si, n, -1)
    qt = rms_norm(linear(a["add_q"], h_txt).reshape(b, st, n, -1),
                  a["norm_added_q"]["w"], cfg.eps)
    kt = rms_norm(linear(a["add_k"], h_txt).reshape(b, st, n, -1),
                  a["norm_added_k"]["w"], cfg.eps)
    vt = linear(a["add_v"], h_txt).reshape(b, st, n, -1)
    qi = apply_rope(qi, *img_rope)
    ki = apply_rope(ki, *img_rope)
    qt = apply_rope(qt, *txt_rope)
    kt = apply_rope(kt, *txt_rope)
    q = jnp.concatenate([qt, qi], axis=1)
    k = jnp.concatenate([kt, ki], axis=1)
    v = jnp.concatenate([vt, vi], axis=1)
    q = constrain(q, "dp", None, ("sp", "tp"), None)
    k = constrain(k, "dp", None, ("sp", "tp"), None)
    v = constrain(v, "dp", None, ("sp", "tp"), None)
    out = attention(q, k, v, impl="xla" if attn_bias is not None else attn_impl,
                    bias=attn_bias)
    out = constrain(out, "dp", "sp", None, None).reshape(b, st + si, cfg.dim)
    att_txt = linear(a["to_add_out"], out[:, :st])
    att_img = linear(a["to_out"], out[:, st:])

    img = img + g_img * att_img
    txt = txt + g_txt * att_txt

    sh, sc, g2 = _mod3(img_mlp_mod)
    h = layer_norm(img, cfg.eps) * (1 + sc) + sh
    img = img + g2 * linear(p["img_mlp"]["fc2"],
                            _approx_gelu(linear(p["img_mlp"]["fc0"], h)))
    sh, sc, g2 = _mod3(txt_mlp_mod)
    h = layer_norm(txt, cfg.eps) * (1 + sc) + sh
    txt = txt + g2 * linear(p["txt_mlp"]["fc2"],
                            _approx_gelu(linear(p["txt_mlp"]["fc0"], h)))
    return img, txt


def qwen_image_dit_forward(
    params: Dict,
    cfg: QwenImageDiTConfig,
    latents: jnp.ndarray,          # (B, H, W, 16) NHWC
    timestep: jnp.ndarray,         # (B,) in [0, 1] (x1000 inside the embedding)
    prompt_emb: jnp.ndarray,       # (B, L, text_dim)
    remat: bool = False,
    attn_impl: str = "auto",
    controlnet: Dict = None,       # blockwise controlnet params
    controlnet_cond: jnp.ndarray = None,   # (B, S, in_dim) patchified cond
    extra_latents=None,            # list of (B, H_i, W_i, 16): context/edit images
    entity_prompt_embs=None,       # list of (B, L_i, text_dim): EliGen locals
    entity_masks: jnp.ndarray = None,      # (B, M, h_lat, w_lat) binary
    rope_interpolate: bool = False,  # edit_rope_interpolation (:787-790)
) -> jnp.ndarray:
    """QwenImageDiT.forward (:502-538). Returns image TOKENS (B, S_main, 64) like
    the reference (the pipeline unpatchifies).

    controlnet/controlnet_cond: blockwise Qwen-Image ControlNet — after every
    block the image stream receives the zero-init residual of
    qwen_image_controlnet.qwen_cn_block (reference qwen_image.py:37-45).

    extra_latents: clean conditioning images appended as extra image tokens with
    their own rope grids at frame positions 1, 2, ... — the reference's
    context_latents (in-context control) and edit_latents (Qwen-Image-Edit)
    paths (model_fn_qwen_image :768-776); their output tokens are discarded
    (:821-822).

    entity_prompt_embs/entity_masks: Qwen EliGen (reference
    process_entity_masks :434-500) — local prompts (true, unpadded lengths)
    precede the global prompt in the text stream; each entity text block
    attends only its masked image tokens (tiled over extra_latents), distinct
    prompt blocks are mutually masked, image-image stays dense."""
    from goal_force_tpu.models.sd_unet import timestep_embedding

    def patch2(z):
        bb, hh, ww, cc = z.shape
        g1, g2 = hh // 2, ww // 2
        t = z.reshape(bb, g1, 2, g2, 2, cc).transpose(0, 1, 3, 5, 2, 4)
        return t.reshape(bb, g1 * g2, cc * 4), (g1, g2)

    b, h, w, c = latents.shape
    dtype = params["proj_out"]["w"].dtype
    x, (gh, gw) = patch2(latents)
    shapes = [(gh, gw)]
    s_main = x.shape[1]
    for extra in (extra_latents or ()):
        xe, ge = patch2(extra.astype(latents.dtype))
        shapes.append(ge)
        x = jnp.concatenate([x, xe], axis=1)
    img = linear(params["img_in"], x)
    embed_txt = lambda e: linear(
        params["txt_in"],
        rms_norm(e.astype(dtype), params["txt_norm"]["w"], cfg.eps))
    attn_bias = None
    if entity_prompt_embs:
        # local prompts FIRST, global LAST (reference :436-438)
        segments = list(entity_prompt_embs) + [prompt_emb]
        txt = jnp.concatenate([embed_txt(e) for e in segments], axis=1)
    else:
        txt = embed_txt(prompt_emb)
    # scale=1000 multiplies the sinusoid ANGLES (svd_unet get_timestep_embedding
    # `emb = scale * emb` BEFORE sin/cos :145-170) — equivalent to t*1000
    temb = timestep_embedding(timestep * 1000.0, cfg.freq_dim).astype(dtype)
    temb = linear(params["time_in"]["fc2"],
                  jax.nn.silu(linear(params["time_in"]["fc0"], temb)
                              .astype(jnp.float32)).astype(dtype))

    shapes = tuple(shapes)
    (icos, isin), (tcos, tsin) = qwen_rope_tables_multi(
        shapes, prompt_emb.shape[1], tuple(cfg.axes_dim), cfg.rope_theta,
        interpolate=rope_interpolate)
    if entity_prompt_embs:
        # each text segment gets its own rope run from the shared start
        # (reference :441-446) and the block-structured attention bias
        seg_tabs = [qwen_rope_tables_multi(shapes, e.shape[1],
                                           tuple(cfg.axes_dim), cfg.rope_theta,
                                           interpolate=rope_interpolate)[1]
                    for e in segments]
        tcos = np.concatenate([t[0] for t in seg_tabs], axis=0)
        tsin = np.concatenate([t[1] for t in seg_tabs], axis=0)
        attn_bias = _qwen_entity_bias(
            entity_masks, [e.shape[1] for e in segments], x.shape[1], s_main)
    img_rope = (jnp.asarray(icos), jnp.asarray(isin))
    txt_rope = (jnp.asarray(tcos), jnp.asarray(tsin))

    cn_cond = None
    if controlnet is not None and controlnet_cond is not None:
        from goal_force_tpu.models.qwen_image_controlnet import (
            qwen_cn_block_p,
            qwen_cn_process_conditioning,
        )

        cn_cond = qwen_cn_process_conditioning(
            controlnet, controlnet_cond.astype(dtype))

    def body(carry, p):
        xi, xt = carry
        xi = constrain(xi, "dp", "sp", None)
        if cn_cond is not None:
            p, cn_p = p
        xi, xt = qwen_block(p, xi, xt, temb, img_rope, txt_rope, cfg,
                            attn_impl, attn_bias=attn_bias)
        if cn_cond is not None:
            # the CN residual lands on the MAIN image tokens only
            # (reference model_fn_qwen_image :811-817 image[:, :image_seq_len])
            res = qwen_cn_block_p(cn_p, xi[:, :s_main], cn_cond, cfg.eps)
            xi = xi.at[:, :s_main].add(res)
        return (xi, xt), None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    xs = params["blocks"] if cn_cond is None \
        else (params["blocks"], controlnet["blocks"])
    (img, txt), _ = jax.lax.scan(body, (img, txt), xs)

    # AdaLayerNorm single: scale FIRST (sd3_dit.py :96-98)
    e = linear(params["norm_out"],
               jax.nn.silu(temb.astype(jnp.float32)).astype(dtype))
    scale, shift = jnp.split(e, 2, axis=-1)
    img = layer_norm(img, cfg.eps) * (1 + scale[:, None]) + shift[:, None]
    return linear(params["proj_out"], img[:, :s_main])


def qwen_unpatchify(tokens, height, width, channels=16):
    """(B, S, C*4) tokens -> (B, H, W, C) (the pipeline-side rearrange :536)."""
    b = tokens.shape[0]
    gh, gw = height // 16, width // 16
    x = tokens.reshape(b, gh, gw, channels, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, gh * 2, gw * 2, channels)


# ---------------------------------------------------------------------------
# Init + converter
# ---------------------------------------------------------------------------

def _lin_init(key, d_in, d_out, dtype):
    s = 1.0 / math.sqrt(d_in)
    return {"w": jax.random.uniform(key, (d_in, d_out), dtype, -s, s),
            "b": jnp.zeros((d_out,), dtype)}


def init_qwen_image_dit(key, cfg: QwenImageDiTConfig, dtype=jnp.bfloat16) -> Dict:
    d = cfg.dim
    hd = cfg.head_dim
    ks = jax.random.split(key, 8)

    def block(k):
        kk = jax.random.split(k, 12)
        return {
            "img_mod": _lin_init(kk[0], d, 6 * d, dtype),
            "txt_mod": _lin_init(kk[1], d, 6 * d, dtype),
            "attn": {
                "to_q": _lin_init(kk[2], d, d, dtype),
                "to_k": _lin_init(kk[3], d, d, dtype),
                "to_v": _lin_init(kk[4], d, d, dtype),
                "add_q": _lin_init(kk[5], d, d, dtype),
                "add_k": _lin_init(kk[6], d, d, dtype),
                "add_v": _lin_init(kk[7], d, d, dtype),
                "norm_q": {"w": jnp.ones((hd,), dtype)},
                "norm_k": {"w": jnp.ones((hd,), dtype)},
                "norm_added_q": {"w": jnp.ones((hd,), dtype)},
                "norm_added_k": {"w": jnp.ones((hd,), dtype)},
                "to_out": _lin_init(kk[8], d, d, dtype),
                "to_add_out": _lin_init(kk[9], d, d, dtype),
            },
            "img_mlp": {"fc0": _lin_init(kk[10], d, 4 * d, dtype),
                        "fc2": _lin_init(kk[10], 4 * d, d, dtype)},
            "txt_mlp": {"fc0": _lin_init(kk[11], d, 4 * d, dtype),
                        "fc2": _lin_init(kk[11], 4 * d, d, dtype)},
        }

    stack = lambda bs: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *bs)
    return {
        "img_in": _lin_init(ks[0], cfg.in_dim, d, dtype),
        "txt_in": _lin_init(ks[1], cfg.text_dim, d, dtype),
        "txt_norm": {"w": jnp.ones((cfg.text_dim,), dtype)},
        "time_in": {"fc0": _lin_init(ks[2], cfg.freq_dim, d, dtype),
                    "fc2": _lin_init(ks[3], d, d, dtype)},
        "blocks": stack([block(k) for k in jax.random.split(ks[4], cfg.num_layers)]),
        "norm_out": _lin_init(ks[5], d, 2 * d, dtype),
        "proj_out": _lin_init(ks[6], d, cfg.in_dim, dtype),
    }


def qwen_image_dit_params_from_torch(sd, cfg: QwenImageDiTConfig) -> Dict:
    g = lambda k: np.asarray(sd[k])
    lin = lambda p: {"w": g(p + ".weight").T, "b": g(p + ".bias")}

    def block(i):
        pre = f"transformer_blocks.{i}"
        return {
            "img_mod": lin(pre + ".img_mod.1"),
            "txt_mod": lin(pre + ".txt_mod.1"),
            "attn": {
                "to_q": lin(pre + ".attn.to_q"),
                "to_k": lin(pre + ".attn.to_k"),
                "to_v": lin(pre + ".attn.to_v"),
                "add_q": lin(pre + ".attn.add_q_proj"),
                "add_k": lin(pre + ".attn.add_k_proj"),
                "add_v": lin(pre + ".attn.add_v_proj"),
                "norm_q": {"w": g(pre + ".attn.norm_q.weight")},
                "norm_k": {"w": g(pre + ".attn.norm_k.weight")},
                "norm_added_q": {"w": g(pre + ".attn.norm_added_q.weight")},
                "norm_added_k": {"w": g(pre + ".attn.norm_added_k.weight")},
                "to_out": lin(pre + ".attn.to_out.0"),
                "to_add_out": lin(pre + ".attn.to_add_out"),
            },
            "img_mlp": {"fc0": lin(pre + ".img_mlp.net.0.proj"),
                        "fc2": lin(pre + ".img_mlp.net.2")},
            "txt_mlp": {"fc0": lin(pre + ".txt_mlp.net.0.proj"),
                        "fc2": lin(pre + ".txt_mlp.net.2")},
        }

    stack = lambda bs: jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *bs)
    return {
        "img_in": lin("img_in"),
        "txt_in": lin("txt_in"),
        "txt_norm": {"w": g("txt_norm.weight")},
        "time_in": {"fc0": lin("time_text_embed.timestep_embedder.linear_1"),
                    "fc2": lin("time_text_embed.timestep_embedder.linear_2")},
        "blocks": stack([block(i) for i in range(cfg.num_layers)]),
        "norm_out": lin("norm_out.linear"),
        "proj_out": lin("proj_out"),
    }
