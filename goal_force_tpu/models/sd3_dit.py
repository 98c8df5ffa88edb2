"""SD3 / SD3.5 MMDiT as pure functions over a param pytree.

Architecture parity with /root/reference/diffsynth/models/sd3_dit.py:
PatchEmbed with center-cropped learned 2D pos-embed (:28-50), AdaLayerNorm
single/dual (:85-107), JointAttention — IMAGE stream first in the joint sequence,
unlike Flux (:110-166), SingleAttention (:171-210), JointTransformerBlock (+dual
variant with a second self-attention, :262-306), JointTransformerFinalBlock
(:309-338), SD3DiT.forward (:367-394).

TPU-first: the homogeneous middle blocks are stacked and scanned; the 0..N dual
blocks (SD3.5-medium) are a separate stacked scan; the final block runs unstacked.
No RoPE — attention uses the shared dispatch (Pallas flash on TPU).
SD3.5 (use_rms_norm=True) adds per-head-dim RMS qk-norms.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.wan_dit import gelu_tanh, layer_norm, linear, rms_norm
from goal_force_tpu.ops.attention import attention
from goal_force_tpu.parallel.mesh import constrain


@dataclasses.dataclass(frozen=True)
class SD3DiTConfig:
    """SD3-medium defaults (reference SD3DiT.__init__ :342-353); SD3.5 variants set
    use_rms_norm=True (and num_dual_blocks for 3.5-medium)."""

    dim: int = 1536
    num_layers: int = 24              # incl. the final block
    num_dual_blocks: int = 0
    use_rms_norm: bool = False
    pos_embed_max_size: int = 192
    in_channels: int = 16
    patch: int = 2
    text_dim: int = 4096
    pooled_dim: int = 2048
    freq_dim: int = 256
    eps: float = 1e-6

    @property
    def num_heads(self) -> int:
        return self.dim // 64

    @property
    def head_dim(self) -> int:
        return 64


def _ada_mod(p, temb, n):
    e = linear(p, jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
    return [c[:, None, :] for c in jnp.split(e, n, axis=-1)]


def _qkv(p_qkv, x, num_heads, norm_q=None, norm_k=None, eps=1e-6):
    b, s, _ = x.shape
    q, k, v = jnp.split(linear(p_qkv, x), 3, axis=-1)
    q = q.reshape(b, s, num_heads, -1)
    k = k.reshape(b, s, num_heads, -1)
    v = v.reshape(b, s, num_heads, -1)
    if norm_q is not None:
        q = rms_norm(q, norm_q["w"], eps)
        k = rms_norm(k, norm_k["w"], eps)
    return q, k, v


def joint_attention(p, x_a, x_b, cfg: SD3DiTConfig, only_out_a=False,
                    attn_impl="auto"):
    """Image (a) stream first in the joint sequence (reference :148-162)."""
    n = cfg.num_heads
    nq = p.get("norm_q_a") if cfg.use_rms_norm else None
    nk = p.get("norm_k_a") if cfg.use_rms_norm else None
    qa, ka, va = _qkv(p["a_qkv"], x_a, n, nq, nk, cfg.eps)
    nqb = p.get("norm_q_b") if cfg.use_rms_norm else None
    nkb = p.get("norm_k_b") if cfg.use_rms_norm else None
    qb, kb, vb = _qkv(p["b_qkv"], x_b, n, nqb, nkb, cfg.eps)
    q = jnp.concatenate([qa, qb], axis=1)
    k = jnp.concatenate([ka, kb], axis=1)
    v = jnp.concatenate([va, vb], axis=1)
    q = constrain(q, "dp", None, ("sp", "tp"), None)
    k = constrain(k, "dp", None, ("sp", "tp"), None)
    v = constrain(v, "dp", None, ("sp", "tp"), None)
    out = attention(q, k, v, impl=attn_impl)
    out = constrain(out, "dp", "sp", None, None)
    b = x_a.shape[0]
    out = out.reshape(b, -1, cfg.dim)
    sa = x_a.shape[1]
    o_a = linear(p["a_out"], out[:, :sa])
    if only_out_a:
        return o_a
    return o_a, linear(p["b_out"], out[:, sa:])


def single_attention(p, x, cfg: SD3DiTConfig, attn_impl="auto"):
    n = cfg.num_heads
    nq = p.get("norm_q_a") if cfg.use_rms_norm else None
    nk = p.get("norm_k_a") if cfg.use_rms_norm else None
    q, k, v = _qkv(p["a_qkv"], x, n, nq, nk, cfg.eps)
    out = attention(q, k, v, impl=attn_impl)
    return linear(p["a_out"], out.reshape(x.shape[0], x.shape[1], cfg.dim))


def _ff(p, x):
    return linear(p["fc2"], gelu_tanh(linear(p["fc0"], x)))


def joint_block(p, x_a, x_b, temb, cfg: SD3DiTConfig, dual=False, attn_impl="auto"):
    """JointTransformerBlock.forward (:283-306); dual adds a second gated
    self-attention on the image stream (:262-280 DualTransformerBlock)."""
    if dual:
        (sm_a, sc_a, g_a, smlp_a, scmlp_a, gmlp_a,
         sm_a2, sc_a2, g_a2) = _ada_mod(p["norm1_a"], temb, 9)
    else:
        sm_a, sc_a, g_a, smlp_a, scmlp_a, gmlp_a = _ada_mod(p["norm1_a"], temb, 6)
    sm_b, sc_b, g_b, smlp_b, scmlp_b, gmlp_b = _ada_mod(p["norm1_b"], temb, 6)
    norm_a = layer_norm(x_a, cfg.eps)
    h_a = norm_a * (1 + sc_a) + sm_a
    h_b = layer_norm(x_b, cfg.eps) * (1 + sc_b) + sm_b
    att_a, att_b = joint_attention(p["attn"], h_a, h_b, cfg, attn_impl=attn_impl)
    x_a = x_a + g_a * att_a
    if dual:
        h_a2 = norm_a * (1 + sc_a2) + sm_a2
        x_a = x_a + g_a2 * single_attention(p["attn2"], h_a2, cfg, attn_impl)
    h_a = layer_norm(x_a, cfg.eps) * (1 + scmlp_a) + smlp_a
    x_a = x_a + gmlp_a * _ff(p["ff_a"], h_a)
    x_b = x_b + g_b * att_b
    h_b = layer_norm(x_b, cfg.eps) * (1 + scmlp_b) + smlp_b
    x_b = x_b + gmlp_b * _ff(p["ff_b"], h_b)
    return x_a, x_b


def final_block(p, x_a, x_b, temb, cfg: SD3DiTConfig, attn_impl="auto"):
    """JointTransformerFinalBlock (:325-338): text stream gets a SINGLE (2-way)
    AdaLN and no update; attention emits only the image stream."""
    sm_a, sc_a, g_a, smlp_a, scmlp_a, gmlp_a = _ada_mod(p["norm1_a"], temb, 6)
    sc_b, sm_b = _ada_mod(p["norm1_b"], temb, 2)  # single: scale FIRST (:96-98)
    h_a = layer_norm(x_a, cfg.eps) * (1 + sc_a) + sm_a
    h_b = layer_norm(x_b, cfg.eps) * (1 + sc_b) + sm_b
    att_a = joint_attention(p["attn"], h_a, h_b, cfg, only_out_a=True,
                            attn_impl=attn_impl)
    x_a = x_a + g_a * att_a
    h_a = layer_norm(x_a, cfg.eps) * (1 + scmlp_a) + smlp_a
    return x_a + gmlp_a * _ff(p["ff_a"], h_a)


def patch_embed(p, x, cfg: SD3DiTConfig):
    """(B, H, W, C) -> tokens + center-cropped learned pos embed (:37-50).
    Feature order (c, dy, dx) matches the Conv2d kernel layout."""
    b, h, w, c = x.shape
    gh, gw = h // cfg.patch, w // cfg.patch
    x = x.reshape(b, gh, cfg.patch, gw, cfg.patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, gh * gw, c * cfg.patch ** 2)
    tokens = linear(p["proj"], x)
    top = (cfg.pos_embed_max_size - gh) // 2
    left = (cfg.pos_embed_max_size - gw) // 2
    pos = p["pos_embed"][top:top + gh, left:left + gw].reshape(1, gh * gw, -1)
    return tokens + pos.astype(tokens.dtype)


def sd3_dit_forward(
    params: Dict,
    cfg: SD3DiTConfig,
    latents: jnp.ndarray,            # (B, H, W, 16) NHWC
    timestep: jnp.ndarray,           # (B,)
    prompt_emb: jnp.ndarray,         # (B, L, 4096)
    pooled_prompt_emb: jnp.ndarray,  # (B, 2048)
    remat: bool = False,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """SD3DiT.forward (:367-394). Returns (B, H, W, 16)."""
    from goal_force_tpu.models.sd_unet import timestep_embedding

    b, h, w, _ = latents.shape
    gh, gw = h // cfg.patch, w // cfg.patch
    dtype = params["proj_out"]["w"].dtype
    temb = _mlp(params["time_in"],
                timestep_embedding(timestep, cfg.freq_dim).astype(dtype))
    temb = temb + _mlp(params["vector_in"], pooled_prompt_emb.astype(dtype))
    txt = linear(params["context_embedder"], prompt_emb.astype(dtype))
    x = patch_embed(params["pos_embedder"], latents, cfg)

    def dual_body(carry, p):
        xa, xb = carry
        xa = constrain(xa, "dp", "sp", None)
        return joint_block(p, xa, xb, temb, cfg, dual=True,
                           attn_impl=attn_impl), None

    def body(carry, p):
        xa, xb = carry
        xa = constrain(xa, "dp", "sp", None)
        return joint_block(p, xa, xb, temb, cfg, attn_impl=attn_impl), None

    if remat:
        dual_body = jax.checkpoint(dual_body, prevent_cse=False)
        body = jax.checkpoint(body, prevent_cse=False)

    if "dual_blocks" in params:
        (x, txt), _ = jax.lax.scan(dual_body, (x, txt), params["dual_blocks"])
    (x, txt), _ = jax.lax.scan(body, (x, txt), params["blocks"])
    x = final_block(params["final_block"], x, txt, temb, cfg, attn_impl)

    # norm_out is a SINGLE AdaLN: scale first (:96-98)
    sc, sm = _ada_mod(params["norm_out"], temb, 2)
    x = layer_norm(x, cfg.eps) * (1 + sc) + sm
    x = linear(params["proj_out"], x)
    # unpatchify "(P Q C)" — PATCH-major feature order, unlike Flux (:393)
    x = x.reshape(b, gh, gw, cfg.patch, cfg.patch, cfg.in_channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * cfg.patch, gw * cfg.patch, cfg.in_channels)


def _mlp(p, x):
    h = linear(p["fc0"], x)
    return linear(p["fc2"], jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype))


# ---------------------------------------------------------------------------
# Init / converter
# ---------------------------------------------------------------------------

def _lin_init(key, d_in, d_out, dtype):
    s = 1.0 / math.sqrt(d_in)
    return {"w": jax.random.uniform(key, (d_in, d_out), dtype, -s, s),
            "b": jnp.zeros((d_out,), dtype)}


def _init_attn(key, cfg, dtype, with_b=True, only_out_a=False):
    d = cfg.dim
    ks = jax.random.split(key, 4)
    p = {"a_qkv": _lin_init(ks[0], d, 3 * d, dtype),
         "a_out": _lin_init(ks[1], d, d, dtype)}
    if with_b:
        p["b_qkv"] = _lin_init(ks[2], d, 3 * d, dtype)
        if not only_out_a:
            p["b_out"] = _lin_init(ks[3], d, d, dtype)
    if cfg.use_rms_norm:
        hd = cfg.head_dim
        p["norm_q_a"] = {"w": jnp.ones((hd,), dtype)}
        p["norm_k_a"] = {"w": jnp.ones((hd,), dtype)}
        if with_b:
            p["norm_q_b"] = {"w": jnp.ones((hd,), dtype)}
            p["norm_k_b"] = {"w": jnp.ones((hd,), dtype)}
    return p


def _init_block(key, cfg, dtype, dual=False):
    d = cfg.dim
    ks = jax.random.split(key, 8)
    p = {
        "norm1_a": _lin_init(ks[0], d, (9 if dual else 6) * d, dtype),
        "norm1_b": _lin_init(ks[1], d, 6 * d, dtype),
        "attn": _init_attn(ks[2], cfg, dtype),
        "ff_a": {"fc0": _lin_init(ks[3], d, 4 * d, dtype),
                 "fc2": _lin_init(ks[4], 4 * d, d, dtype)},
        "ff_b": {"fc0": _lin_init(ks[5], d, 4 * d, dtype),
                 "fc2": _lin_init(ks[6], 4 * d, d, dtype)},
    }
    if dual:
        p["attn2"] = _init_attn(ks[7], cfg, dtype, with_b=False)
    return p


def init_sd3_dit(key, cfg: SD3DiTConfig, dtype=jnp.bfloat16) -> Dict:
    d = cfg.dim
    ks = jax.random.split(key, 10)
    n_regular = cfg.num_layers - 1 - cfg.num_dual_blocks
    stack = lambda bs: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *bs)
    params = {
        "pos_embedder": {
            "proj": _lin_init(ks[0], cfg.in_channels * cfg.patch ** 2, d, dtype),
            "pos_embed": jnp.zeros(
                (cfg.pos_embed_max_size, cfg.pos_embed_max_size, d), dtype),
        },
        "time_in": {"fc0": _lin_init(ks[1], cfg.freq_dim, d, dtype),
                    "fc2": _lin_init(ks[2], d, d, dtype)},
        "vector_in": {"fc0": _lin_init(ks[3], cfg.pooled_dim, d, dtype),
                      "fc2": _lin_init(ks[4], d, d, dtype)},
        "context_embedder": _lin_init(ks[5], cfg.text_dim, d, dtype),
        "blocks": stack([_init_block(k, cfg, dtype)
                         for k in jax.random.split(ks[6], n_regular)]),
        "final_block": {
            "norm1_a": _lin_init(ks[7], d, 6 * d, dtype),
            "norm1_b": _lin_init(ks[7], d, 2 * d, dtype),
            "attn": _init_attn(ks[7], cfg, dtype, only_out_a=True),
            "ff_a": {"fc0": _lin_init(ks[7], d, 4 * d, dtype),
                     "fc2": _lin_init(ks[7], 4 * d, d, dtype)},
        },
        "norm_out": _lin_init(ks[8], d, 2 * d, dtype),
        "proj_out": _lin_init(ks[9], d, cfg.in_channels * cfg.patch ** 2, dtype),
    }
    if cfg.num_dual_blocks:
        params["dual_blocks"] = stack(
            [_init_block(k, cfg, dtype, dual=True)
             for k in jax.random.split(ks[6], cfg.num_dual_blocks)])
    return params


def sd3_dit_params_from_torch(sd, cfg: SD3DiTConfig) -> Dict:
    """diffsynth-format SD3DiT state dict (the naming its converters emit)."""
    g = lambda k: np.asarray(sd[k])
    lin = lambda p: {"w": g(p + ".weight").T, "b": g(p + ".bias")}
    mlp = lambda p: {"fc0": lin(p + ".0"), "fc2": lin(p + ".2")}

    def attn(pre, with_b=True, only_out_a=False):
        p = {"a_qkv": lin(pre + ".a_to_qkv"), "a_out": lin(pre + ".a_to_out")}
        if with_b:
            p["b_qkv"] = lin(pre + ".b_to_qkv")
            if not only_out_a:
                p["b_out"] = lin(pre + ".b_to_out")
        if cfg.use_rms_norm:
            p["norm_q_a"] = {"w": g(pre + ".norm_q_a.weight")}
            p["norm_k_a"] = {"w": g(pre + ".norm_k_a.weight")}
            if with_b:
                p["norm_q_b"] = {"w": g(pre + ".norm_q_b.weight")}
                p["norm_k_b"] = {"w": g(pre + ".norm_k_b.weight")}
        return p

    def block(i, dual=False):
        pre = f"blocks.{i}"
        p = {
            "norm1_a": lin(pre + ".norm1_a.linear"),
            "norm1_b": lin(pre + ".norm1_b.linear"),
            "attn": attn(pre + ".attn"),
            "ff_a": {"fc0": lin(pre + ".ff_a.0"), "fc2": lin(pre + ".ff_a.2")},
            "ff_b": {"fc0": lin(pre + ".ff_b.0"), "fc2": lin(pre + ".ff_b.2")},
        }
        if dual:
            p["attn2"] = attn(pre + ".attn2", with_b=False)
        return p

    nd = cfg.num_dual_blocks
    n_regular = cfg.num_layers - 1 - nd
    stack = lambda bs: jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *bs)
    last = cfg.num_layers - 1
    proj_w = g("pos_embedder.proj.weight")  # (D, C, P, P)
    d = proj_w.shape[0]
    params = {
        "pos_embedder": {
            "proj": {"w": proj_w.reshape(d, -1).T, "b": g("pos_embedder.proj.bias")},
            "pos_embed": g("pos_embedder.pos_embed").reshape(
                cfg.pos_embed_max_size, cfg.pos_embed_max_size, d),
        },
        "time_in": mlp("time_embedder.timestep_embedder"),
        "vector_in": mlp("pooled_text_embedder"),
        "context_embedder": lin("context_embedder"),
        "blocks": stack([block(i) for i in range(nd, nd + n_regular)]),
        "final_block": {
            "norm1_a": lin(f"blocks.{last}.norm1_a.linear"),
            "norm1_b": lin(f"blocks.{last}.norm1_b.linear"),
            "attn": attn(f"blocks.{last}.attn", only_out_a=True),
            "ff_a": {"fc0": lin(f"blocks.{last}.ff_a.0"),
                     "fc2": lin(f"blocks.{last}.ff_a.2")},
        },
        "norm_out": lin("norm_out.linear"),
        "proj_out": lin("proj_out"),
    }
    if nd:
        params["dual_blocks"] = stack([block(i, dual=True) for i in range(nd)])
    return params
