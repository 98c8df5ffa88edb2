"""CogVideoX DiT as pure functions over a param pytree.

Architecture parity with /root/reference/diffsynth/models/cog_dit.py:
CogPatchify (:11-20 — Conv3d (1,2,2)), CogAdaLayerNorm (:23-42 — AFFINE LayerNorm
shared between image and text streams; the `single` variant chunks (shift, scale)
in that order), CogDiTBlock (:45-105 — joint text-first attention with per-head
LayerNorm qk-norm and biased qkv), 3D rope over (t, h, w) with aspect-ratio
resize-crop grid coordinates and interleaved-pair rotation (:126-228),
CogDiT.forward (:286-330 — final LayerNorm over the joint sequence before the
single AdaLN head).

TPU-first: the 42 blocks are stacked and scanned; rope tables are host-built
(S, head_dim/2) cos/sin applied with ops/rope.apply_rope to image tokens only.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.wan_dit import gelu_tanh, linear
from goal_force_tpu.ops.attention import attention
from goal_force_tpu.ops.rope import apply_rope
from goal_force_tpu.parallel.mesh import constrain


@dataclasses.dataclass(frozen=True)
class CogDiTConfig:
    """CogVideoX-5B defaults (reference CogDiT.__init__ :108-116)."""

    dim: int = 3072
    cond_dim: int = 512
    num_heads: int = 48
    num_blocks: int = 42
    in_channels: int = 16
    text_dim: int = 4096
    freq_dim: int = 3072           # TimestepEmbeddings(3072, 512)
    patch: int = 2
    rope_dim: int = 64             # per-head rope dim (head_dim)
    base_height: int = 480
    base_width: int = 720
    eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


@lru_cache(maxsize=8)
def cog_rope_tables(t: int, gh: int, gw: int, rope_dim: int,
                    base_h: int, base_w: int, theta: float = 10000.0):
    """(S, rope_dim//2) cos/sin (reference get_3d_rotary_pos_embed +
    prepare_rotary_positional_embeddings :126-228): h/w grids are resize-cropped
    into the base 480x720 latent-patch box; dims split (1/4, 3/8, 3/8)."""
    base_gw = base_w // (8 * 2)
    base_gh = base_h // (8 * 2)
    # get_resize_crop_region_for_grid (:118-134)
    if gh / gw > base_gh / base_gw:
        resize_h, resize_w = base_gh, int(round(base_gh / gh * gw))
    else:
        resize_w, resize_h = base_gw, int(round(base_gw / gw * gh))
    top = int(round((base_gh - resize_h) / 2.0))
    left = int(round((base_gw - resize_w) / 2.0))
    grid_h = np.linspace(top, top + resize_h, gh, endpoint=False,
                         dtype=np.float64)
    grid_w = np.linspace(left, left + resize_w, gw, endpoint=False,
                         dtype=np.float64)
    grid_t = np.arange(t, dtype=np.float64)

    dim_t = rope_dim // 4
    dim_h = rope_dim // 8 * 3
    dim_w = rope_dim // 8 * 3

    def axis(grid, d):
        freqs = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        return np.outer(grid, freqs)       # (n, d//2)

    ft = axis(grid_t, dim_t)[:, None, None, :]
    fh = axis(grid_h, dim_h)[None, :, None, :]
    fw = axis(grid_w, dim_w)[None, None, :, :]
    ang = np.concatenate([
        np.broadcast_to(ft, (t, gh, gw, ft.shape[-1])),
        np.broadcast_to(fh, (t, gh, gw, fh.shape[-1])),
        np.broadcast_to(fw, (t, gh, gw, fw.shape[-1])),
    ], axis=-1).reshape(t * gh * gw, -1)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _ln_affine(p, x, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def _ada(p, x_img, x_txt, time_emb, eps):
    """CogAdaLayerNorm dual form (:31-42): one AFFINE LayerNorm shared by both
    streams; 6-way modulation."""
    e = linear(p["linear"], jax.nn.silu(time_emb.astype(jnp.float32)).astype(time_emb.dtype))
    sa, sca, ga, sb, scb, gb = [c[:, None, :] for c in jnp.split(e, 6, axis=-1)]
    h_img = _ln_affine(p["norm"], x_img, eps) * (1 + sca) + sa
    h_txt = _ln_affine(p["norm"], x_txt, eps) * (1 + scb) + sb
    return h_img, h_txt, ga, gb


def cog_block(p, x_img, x_txt, time_emb, cos, sin, cfg: CogDiTConfig,
              attn_impl="auto"):
    """CogDiTBlock.forward (:80-105): text-first joint attention; per-head
    LayerNorm on q/k; rope on image tokens only."""
    n = cfg.num_heads
    t_len = x_txt.shape[1]
    h_img, h_txt, ga, gb = _ada(p["norm1"], x_img, x_txt, time_emb, cfg.eps)
    io = jnp.concatenate([h_txt, h_img], axis=1)
    b, s, _ = io.shape
    q = (io @ p["attn"]["q_w"] + p["attn"]["q_b"]).reshape(b, s, n, -1)
    k = (io @ p["attn"]["k_w"] + p["attn"]["k_b"]).reshape(b, s, n, -1)
    v = (io @ p["attn"]["v_w"] + p["attn"]["v_b"]).reshape(b, s, n, -1)
    q = _ln_affine(p["norm_q"], q, 1e-6)
    k = _ln_affine(p["norm_k"], k, 1e-6)
    q = jnp.concatenate([q[:, :t_len],
                         apply_rope(q[:, t_len:], cos, sin)], axis=1)
    k = jnp.concatenate([k[:, :t_len],
                         apply_rope(k[:, t_len:], cos, sin)], axis=1)
    q = constrain(q, "dp", None, ("sp", "tp"), None)
    k = constrain(k, "dp", None, ("sp", "tp"), None)
    v = constrain(v, "dp", None, ("sp", "tp"), None)
    out = attention(q, k, v, impl=attn_impl)
    out = constrain(out, "dp", "sp", None, None).reshape(b, s, cfg.dim)
    out = out @ p["attn"]["o_w"] + p["attn"]["o_b"]
    x_img = x_img + ga * out[:, t_len:]
    x_txt = x_txt + gb * out[:, :t_len]

    h_img, h_txt, ga, gb = _ada(p["norm2"], x_img, x_txt, time_emb, cfg.eps)
    io = jnp.concatenate([h_txt, h_img], axis=1)
    io = linear(p["ff"]["fc2"], gelu_tanh(linear(p["ff"]["fc0"], io)))
    x_img = x_img + ga * io[:, t_len:]
    x_txt = x_txt + gb * io[:, :t_len]
    return x_img, x_txt


def cog_dit_forward(
    params: Dict,
    cfg: CogDiTConfig,
    latents: jnp.ndarray,        # (B, T, H, W, 16) NTHWC
    timestep: jnp.ndarray,       # (B,)
    prompt_emb: jnp.ndarray,     # (B, L, text_dim)
    remat: bool = False,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """CogDiT.forward (:286-330). Returns (B, T, H, W, 16)."""
    from goal_force_tpu.models.sd_unet import timestep_embedding

    b, t, h, w, _ = latents.shape
    gh, gw = h // cfg.patch, w // cfg.patch
    dtype = params["proj_out"]["w"].dtype
    # patchify: Conv3d (1, 2, 2) == per-frame 2x2 linear with (c, ph, pw) order
    x = latents.reshape(b, t, gh, cfg.patch, gw, cfg.patch, cfg.in_channels)
    x = x.transpose(0, 1, 2, 4, 6, 3, 5)
    x = x.reshape(b, t * gh * gw, cfg.in_channels * cfg.patch ** 2)
    x = linear(params["patchify"], x)

    temb = timestep_embedding(timestep, cfg.freq_dim).astype(dtype)
    temb = linear(params["time_emb"]["fc2"],
                  jax.nn.silu(linear(params["time_emb"]["fc0"], temb)
                              .astype(jnp.float32)).astype(dtype))
    txt = linear(params["context_embedder"], prompt_emb.astype(dtype))

    cos_np, sin_np = cog_rope_tables(t, gh, gw, cfg.rope_dim,
                                     cfg.base_height, cfg.base_width)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    def body(carry, p):
        xi, xt = carry
        xi = constrain(xi, "dp", "sp", None)
        return cog_block(p, xi, xt, temb, cos, sin, cfg, attn_impl), None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    (x, txt), _ = jax.lax.scan(body, (x, txt), params["blocks"])

    # final LN over the JOINT sequence, image part kept (:321-325)
    joint = jnp.concatenate([txt, x], axis=1)
    joint = _ln_affine(params["norm_final"], joint, cfg.eps)
    x = joint[:, txt.shape[1]:]
    # single AdaLN: (shift, scale) ORDER — unlike SD3 (:33-36)
    e = linear(params["norm_out"]["linear"],
               jax.nn.silu(temb.astype(jnp.float32)).astype(dtype))
    shift, scale = jnp.split(e, 2, axis=-1)
    x = _ln_affine(params["norm_out"]["norm"], x, cfg.eps) \
        * (1 + scale[:, None]) + shift[:, None]
    x = linear(params["proj_out"], x)
    # unpatchify "(C P Q)" channel-major (:230-232)
    x = x.reshape(b, t, gh, gw, cfg.in_channels, cfg.patch, cfg.patch)
    x = x.transpose(0, 1, 2, 5, 3, 6, 4)
    return x.reshape(b, t, h, w, cfg.in_channels)


# ---------------------------------------------------------------------------
# Init + converter
# ---------------------------------------------------------------------------

def _lin_init(key, d_in, d_out, dtype):
    s = 1.0 / math.sqrt(d_in)
    return {"w": jax.random.uniform(key, (d_in, d_out), dtype, -s, s),
            "b": jnp.zeros((d_out,), dtype)}


def init_cog_dit(key, cfg: CogDiTConfig, dtype=jnp.bfloat16) -> Dict:
    d = cfg.dim
    hd = cfg.head_dim
    ks = jax.random.split(key, 8)

    def block(k):
        kk = jax.random.split(k, 8)
        return {
            "norm1": {"linear": _lin_init(kk[0], cfg.cond_dim, 6 * d, dtype),
                      "norm": {"scale": jnp.ones((d,), dtype),
                               "bias": jnp.zeros((d,), dtype)}},
            "attn": {
                "q_w": _lin_init(kk[1], d, d, dtype)["w"], "q_b": jnp.zeros((d,), dtype),
                "k_w": _lin_init(kk[2], d, d, dtype)["w"], "k_b": jnp.zeros((d,), dtype),
                "v_w": _lin_init(kk[3], d, d, dtype)["w"], "v_b": jnp.zeros((d,), dtype),
                "o_w": _lin_init(kk[4], d, d, dtype)["w"], "o_b": jnp.zeros((d,), dtype),
            },
            "norm_q": {"scale": jnp.ones((hd,), dtype), "bias": jnp.zeros((hd,), dtype)},
            "norm_k": {"scale": jnp.ones((hd,), dtype), "bias": jnp.zeros((hd,), dtype)},
            "norm2": {"linear": _lin_init(kk[5], cfg.cond_dim, 6 * d, dtype),
                      "norm": {"scale": jnp.ones((d,), dtype),
                               "bias": jnp.zeros((d,), dtype)}},
            "ff": {"fc0": _lin_init(kk[6], d, 4 * d, dtype),
                   "fc2": _lin_init(kk[7], 4 * d, d, dtype)},
        }

    stack = lambda bs: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *bs)
    return {
        "patchify": _lin_init(ks[0], cfg.in_channels * cfg.patch ** 2, d, dtype),
        "time_emb": {"fc0": _lin_init(ks[1], cfg.freq_dim, cfg.cond_dim, dtype),
                     "fc2": _lin_init(ks[2], cfg.cond_dim, cfg.cond_dim, dtype)},
        "context_embedder": _lin_init(ks[3], cfg.text_dim, d, dtype),
        "blocks": stack([block(k)
                         for k in jax.random.split(ks[4], cfg.num_blocks)]),
        "norm_final": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "norm_out": {"linear": _lin_init(ks[5], cfg.cond_dim, 2 * d, dtype),
                     "norm": {"scale": jnp.ones((d,), dtype),
                              "bias": jnp.zeros((d,), dtype)}},
        "proj_out": _lin_init(ks[6], d, cfg.in_channels * cfg.patch ** 2, dtype),
    }


def cog_dit_params_from_torch(sd, cfg: CogDiTConfig) -> Dict:
    g = lambda k: np.asarray(sd[k])
    lin = lambda p: {"w": g(p + ".weight").T, "b": g(p + ".bias")}
    norm = lambda p: {"scale": g(p + ".weight"), "bias": g(p + ".bias")}

    def block(i):
        pre = f"blocks.{i}"
        return {
            "norm1": {"linear": lin(pre + ".norm1.linear"),
                      "norm": norm(pre + ".norm1.norm")},
            "attn": {
                "q_w": g(pre + ".attn1.to_q.weight").T, "q_b": g(pre + ".attn1.to_q.bias"),
                "k_w": g(pre + ".attn1.to_k.weight").T, "k_b": g(pre + ".attn1.to_k.bias"),
                "v_w": g(pre + ".attn1.to_v.weight").T, "v_b": g(pre + ".attn1.to_v.bias"),
                "o_w": g(pre + ".attn1.to_out.weight").T, "o_b": g(pre + ".attn1.to_out.bias"),
            },
            "norm_q": norm(pre + ".norm_q"),
            "norm_k": norm(pre + ".norm_k"),
            "norm2": {"linear": lin(pre + ".norm2.linear"),
                      "norm": norm(pre + ".norm2.norm")},
            "ff": {"fc0": lin(pre + ".ff.0"), "fc2": lin(pre + ".ff.2")},
        }

    stack = lambda bs: jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *bs)
    proj_w = g("patchify.proj.weight")  # (D, C, 1, P, P)
    d = proj_w.shape[0]
    return {
        "patchify": {"w": proj_w.reshape(d, -1).T, "b": g("patchify.proj.bias")},
        "time_emb": {"fc0": lin("time_embedder.timestep_embedder.0"),
                     "fc2": lin("time_embedder.timestep_embedder.2")},
        "context_embedder": lin("context_embedder"),
        "blocks": stack([block(i) for i in range(cfg.num_blocks)]),
        "norm_final": norm("norm_final"),
        "norm_out": {"linear": lin("norm_out.linear"),
                     "norm": norm("norm_out.norm")},
        "proj_out": lin("proj_out"),
    }
