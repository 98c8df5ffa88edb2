"""HunyuanDiT (image) as pure functions over a param pytree.

Architecture parity with /root/reference/diffsynth/models/hunyuan_dit.py:
U-ViT long-skip topology — 21 down blocks push residuals (all but the last two),
19 up blocks pop them through skip_norm+skip_linear (:87-138, :348-394);
per-block: shift-only modulation on the self-attn input, AFFINE per-head
LayerNorm on q/k, rope on q,k for self-attention and q-only for text
cross-attention (:7-53, :118-138); CLIP(77)+T5(256) text with a learned padding
embedding, T5 attention-pool, style + size embeddings in the condition vector
(:229-291); final layer with 2-way modulation; output unpatchified "(P Q C)" and
the first out_channels//2 channels kept (:394-400).

Rope tables mirror the pipeline's ImageSizeManager.calc_rope
(/root/reference/diffsynth/pipelines/hunyuan_image.py:28-121): fill-resize-crop
grid into the 512-base box; NOTE the reference concatenates the W-coordinate
table first (its get_meshgrid comment "here w goes first").
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.wan_dit import gelu_tanh, layer_norm, linear
from goal_force_tpu.ops.attention import attention
from goal_force_tpu.ops.rope import apply_rope
from goal_force_tpu.parallel.mesh import constrain


@dataclasses.dataclass(frozen=True)
class HunyuanDiTConfig:
    dim: int = 1408
    num_heads: int = 16
    num_layers_down: int = 21
    num_layers_up: int = 19
    in_channels: int = 4
    out_channels: int = 8
    text_dim: int = 1024
    t5_dim: int = 2048
    text_len: int = 77
    t5_len: int = 256
    mlp_ratio: float = 4.3637
    freq_dim: int = 256
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def mlp_dim(self) -> int:
        return int(self.dim * self.mlp_ratio)


@lru_cache(maxsize=8)
def hunyuan_dit_rope(th: int, tw: int, head_dim: int, base_size: int = 32,
                     theta: float = 10000.0):
    """(S, head_dim//2) cos/sin tables (ImageSizeManager.calc_rope :112-121)."""
    # get_fill_resize_and_crop (:28-46)
    if base_size / th < base_size / tw:
        rh, rw = base_size, int(round(base_size / th * tw))
    else:
        rw, rh = base_size, int(round(base_size / tw * th))
    top = int(round((base_size - rh) / 2.0))
    left = int(round((base_size - rw) / 2.0))
    grid_h = np.linspace(top, top + rh, th, endpoint=False, dtype=np.float64)
    grid_w = np.linspace(left, left + rw, tw, endpoint=False, dtype=np.float64)
    ww, hh = np.meshgrid(grid_w, grid_h)     # 'xy': shape (th, tw)

    def axis(vals, d):
        freqs = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        return np.outer(vals.reshape(-1), freqs)

    d2 = head_dim // 2
    # reference order: grid[0] (w-coords) first, then grid[1] (h-coords)
    ang = np.concatenate([axis(ww, d2), axis(hh, d2)], axis=-1)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _fp32_ln(x, w, b, eps=1e-6):
    return layer_norm(x, eps, w, b)


def _head_ln(x, w, b, eps=1e-6):
    """Affine LayerNorm over head_dim: x (B, S, N, H)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * w + b).astype(x.dtype)


def _biased_qkv(p, x, ctx, n):
    b, s, _ = x.shape
    t = ctx.shape[1]
    q = (x @ p["q_w"] + p["q_b"]).reshape(b, s, n, -1)
    k = (ctx @ p["k_w"] + p["k_b"]).reshape(b, t, n, -1)
    v = (ctx @ p["v_w"] + p["v_b"]).reshape(b, t, n, -1)
    return q, k, v


def hunyuan_dit_block(p, x, cond, text, cos, sin, cfg: HunyuanDiTConfig,
                      residual=None, attn_impl="auto"):
    """HunyuanDiTBlock.forward (:118-138)."""
    n = cfg.num_heads
    if residual is not None:
        x = jnp.concatenate([x, residual], axis=-1)
        x = _fp32_ln(x, p["skip_norm"]["w"], p["skip_norm"]["b"])
        x = linear(p["skip_linear"], x)

    shift = linear(p["modulation"],
                   jax.nn.silu(cond.astype(jnp.float32)).astype(cond.dtype))
    h = _fp32_ln(x, p["norm1"]["w"], p["norm1"]["b"]) + shift[:, None]
    q, k, v = _biased_qkv(p["attn1"], h, h, n)
    q = _head_ln(q, p["rota1"]["q_norm"]["w"], p["rota1"]["q_norm"]["b"])
    k = _head_ln(k, p["rota1"]["k_norm"]["w"], p["rota1"]["k_norm"]["b"])
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    q = constrain(q, "dp", None, ("sp", "tp"), None)
    k = constrain(k, "dp", None, ("sp", "tp"), None)
    v = constrain(v, "dp", None, ("sp", "tp"), None)
    out = attention(q, k, v, impl=attn_impl)
    out = constrain(out, "dp", "sp", None, None).reshape(x.shape)
    x = x + (out @ p["attn1"]["o_w"] + p["attn1"]["o_b"])

    h = _fp32_ln(x, p["norm3"]["w"], p["norm3"]["b"])
    q, k, v = _biased_qkv(p["attn2"], h, text, n)
    q = _head_ln(q, p["rota2"]["q_norm"]["w"], p["rota2"]["q_norm"]["b"])
    k = _head_ln(k, p["rota2"]["k_norm"]["w"], p["rota2"]["k_norm"]["b"])
    q = apply_rope(q, cos, sin)      # rope on q ONLY (rotary_emb_on_k=False)
    out = attention(q, k, v, impl=attn_impl).reshape(x.shape)
    x = x + (out @ p["attn2"]["o_w"] + p["attn2"]["o_b"])

    h = _fp32_ln(x, p["norm2"]["w"], p["norm2"]["b"])
    x = x + linear(p["mlp"]["fc2"], gelu_tanh(linear(p["mlp"]["fc0"], h)))
    return x


def _attention_pool(p, x, num_heads):
    """AttentionPool (:140-173): mean token prepended, learned pos emb, one
    multi-head attention of the mean-query over all tokens."""
    b, l, c = x.shape
    x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)  # (B, L+1, C)
    x = x + p["pos"].astype(x.dtype)[None]
    q = x[:, :1] @ p["q_w"].T + p["q_b"]
    k = x @ p["k_w"].T + p["k_b"]
    v = x @ p["v_w"].T + p["v_b"]
    hd = c // num_heads
    q = q.reshape(b, 1, num_heads, hd)
    k = k.reshape(b, l + 1, num_heads, hd)
    v = v.reshape(b, l + 1, num_heads, hd)
    logits = jnp.einsum("bqnc,bknc->bnqk", q, k) / math.sqrt(hd)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bnqk,bknc->bqnc", probs, v).reshape(b, c)
    return out @ p["c_w"].T + p["c_b"]


def hunyuan_dit_forward(
    params: Dict,
    cfg: HunyuanDiTConfig,
    latents: jnp.ndarray,            # (B, H, W, 4) NHWC
    text_emb: jnp.ndarray,           # (B, 77, 1024) CLIP hidden
    text_emb_t5: jnp.ndarray,        # (B, 256, 2048) mT5 hidden
    text_mask: jnp.ndarray,          # (B, 77)
    text_mask_t5: jnp.ndarray,       # (B, 256)
    timestep: jnp.ndarray,           # (B,)
    size_emb: jnp.ndarray,           # (B, 6) image-size conditioning
    remat: bool = False,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """HunyuanDiT.forward (:348-400). Returns (B, H, W, 4)."""
    from goal_force_tpu.models.sd_unet import timestep_embedding

    b, h, w, _ = latents.shape
    th, tw = h // 2, w // 2
    dtype = params["final"]["linear"]["w"].dtype

    # text: CLIP ++ embedded T5, masked positions replaced by the learned padding
    t5 = linear(params["t5_embedder"]["fc2"], jax.nn.silu(
        linear(params["t5_embedder"]["fc0"],
               text_emb_t5.astype(dtype)).astype(jnp.float32)).astype(dtype))
    text = jnp.concatenate([text_emb.astype(dtype), t5], axis=1)
    mask = jnp.concatenate([text_mask, text_mask_t5], axis=-1).astype(bool)
    text = jnp.where(mask[..., None], text, params["text_emb_padding"].astype(dtype))

    # condition vector (:276-291)
    pooled_t5 = _attention_pool(params["t5_pooler"], text_emb_t5.astype(dtype), 8)
    temb = linear(params["time_emb"]["fc2"], jax.nn.silu(
        linear(params["time_emb"]["fc0"],
               timestep_embedding(timestep, cfg.freq_dim).astype(dtype))
        .astype(jnp.float32)).astype(dtype))
    semb = timestep_embedding(size_emb.reshape(-1), 256).reshape(b, 6 * 256)
    style = jnp.broadcast_to(params["style"].astype(dtype)[None], (b, cfg.dim))
    extra = jnp.concatenate([pooled_t5, semb.astype(dtype), style], axis=-1)
    cond = temb + linear(params["extra_emb"]["fc2"], jax.nn.silu(
        linear(params["extra_emb"]["fc0"], extra).astype(jnp.float32)).astype(dtype))

    # patchify (Conv2d k=s=2, feature order (c, p, q))
    x = latents.reshape(b, th, 2, tw, 2, cfg.in_channels)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, th * tw, cfg.in_channels * 4)
    x = linear(params["patch_embedder"], x)

    cos_np, sin_np = hunyuan_dit_rope(th, tw, cfg.head_dim)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    def down_body(carry, p):
        carry = constrain(carry, "dp", "sp", None)
        out = hunyuan_dit_block(p, carry, cond, text, cos, sin, cfg,
                                attn_impl=attn_impl)
        return out, out

    def up_body(carry, inp):
        p, res = inp
        carry = constrain(carry, "dp", "sp", None)
        return hunyuan_dit_block(p, carry, cond, text, cos, sin, cfg,
                                 residual=res, attn_impl=attn_impl), None

    if remat:
        down_body = jax.checkpoint(down_body, prevent_cse=False)
        up_body = jax.checkpoint(up_body, prevent_cse=False)

    x, ys = jax.lax.scan(down_body, x, params["down_blocks"])
    # residuals: outputs of down blocks 0..num_down-3, consumed LIFO (:383-394)
    res = ys[:cfg.num_layers_down - 2][::-1]
    x, _ = jax.lax.scan(up_body, x, (params["up_blocks"], res))

    e = linear(params["final"]["ada"],
               jax.nn.silu(cond.astype(jnp.float32)).astype(dtype))
    shift, scale = jnp.split(e, 2, axis=-1)
    x = layer_norm(x, cfg.eps) * (1 + scale[:, None]) + shift[:, None]
    x = linear(params["final"]["linear"], x)
    # unpatchify "(P Q C)" patch-major; keep the first half of channels (:394-400)
    x = x.reshape(b, th, tw, 2, 2, cfg.out_channels)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, cfg.out_channels)
    return x[..., :cfg.out_channels // 2]


# ---------------------------------------------------------------------------
# Init + converter
# ---------------------------------------------------------------------------

def _lin_init(key, d_in, d_out, dtype):
    s = 1.0 / math.sqrt(d_in)
    return {"w": jax.random.uniform(key, (d_in, d_out), dtype, -s, s),
            "b": jnp.zeros((d_out,), dtype)}


def _init_block(key, cfg, dtype, skip=False):
    d = cfg.dim
    hd = cfg.head_dim
    ks = jax.random.split(key, 12)
    ln = lambda n: {"w": jnp.ones((n,), dtype), "b": jnp.zeros((n,), dtype)}
    attn = lambda k0, kv_dim: {
        "q_w": _lin_init(k0, d, d, dtype)["w"], "q_b": jnp.zeros((d,), dtype),
        "k_w": _lin_init(k0, kv_dim, d, dtype)["w"], "k_b": jnp.zeros((d,), dtype),
        "v_w": _lin_init(k0, kv_dim, d, dtype)["w"], "v_b": jnp.zeros((d,), dtype),
        "o_w": _lin_init(k0, d, d, dtype)["w"], "o_b": jnp.zeros((d,), dtype),
    }
    p = {
        "norm1": ln(d), "norm2": ln(d), "norm3": ln(d),
        "rota1": {"q_norm": ln(hd), "k_norm": ln(hd)},
        "rota2": {"q_norm": ln(hd), "k_norm": ln(hd)},
        "attn1": attn(ks[0], d),
        "attn2": attn(ks[1], cfg.text_dim),
        "modulation": _lin_init(ks[2], d, d, dtype),
        "mlp": {"fc0": _lin_init(ks[3], d, cfg.mlp_dim, dtype),
                "fc2": _lin_init(ks[4], cfg.mlp_dim, d, dtype)},
    }
    if skip:
        p["skip_norm"] = ln(2 * d)
        p["skip_linear"] = _lin_init(ks[5], 2 * d, d, dtype)
    return p


def init_hunyuan_dit(key, cfg: HunyuanDiTConfig, dtype=jnp.bfloat16) -> Dict:
    d = cfg.dim
    ks = jax.random.split(key, 12)
    stack = lambda bs: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *bs)
    return {
        "text_emb_padding": jax.random.normal(
            ks[0], (cfg.text_len + cfg.t5_len, cfg.text_dim), dtype),
        "t5_embedder": {"fc0": _lin_init(ks[1], cfg.t5_dim, cfg.t5_dim * 4, dtype),
                        "fc2": _lin_init(ks[2], cfg.t5_dim * 4, cfg.text_dim, dtype)},
        "t5_pooler": {
            "pos": jax.random.normal(ks[3], (cfg.t5_len + 1, cfg.t5_dim), dtype)
            / cfg.t5_dim**0.5,
            "q_w": jax.random.normal(ks[3], (cfg.t5_dim, cfg.t5_dim), dtype) * 0.02,
            "q_b": jnp.zeros((cfg.t5_dim,), dtype),
            "k_w": jax.random.normal(ks[3], (cfg.t5_dim, cfg.t5_dim), dtype) * 0.02,
            "k_b": jnp.zeros((cfg.t5_dim,), dtype),
            "v_w": jax.random.normal(ks[3], (cfg.t5_dim, cfg.t5_dim), dtype) * 0.02,
            "v_b": jnp.zeros((cfg.t5_dim,), dtype),
            "c_w": jax.random.normal(ks[3], (1024, cfg.t5_dim), dtype) * 0.02,
            "c_b": jnp.zeros((1024,), dtype),
        },
        "style": jax.random.normal(ks[4], (d,), dtype),
        "patch_embedder": _lin_init(ks[5], cfg.in_channels * 4, d, dtype),
        "time_emb": {"fc0": _lin_init(ks[6], cfg.freq_dim, d, dtype),
                     "fc2": _lin_init(ks[6], d, d, dtype)},
        "extra_emb": {"fc0": _lin_init(ks[7], 256 * 6 + 1024 + d, d * 4, dtype),
                      "fc2": _lin_init(ks[7], d * 4, d, dtype)},
        "down_blocks": stack([_init_block(k, cfg, dtype)
                              for k in jax.random.split(ks[8],
                                                        cfg.num_layers_down)]),
        "up_blocks": stack([_init_block(k, cfg, dtype, skip=True)
                            for k in jax.random.split(ks[9], cfg.num_layers_up)]),
        "final": {
            "linear": _lin_init(ks[10], d, 4 * cfg.out_channels, dtype),
            "ada": _lin_init(ks[11], d, 2 * d, dtype),
        },
    }


def hunyuan_dit_params_from_torch(sd, cfg: HunyuanDiTConfig) -> Dict:
    g = lambda k: np.asarray(sd[k])
    lin = lambda p: {"w": g(p + ".weight").T, "b": g(p + ".bias")}
    ln = lambda p: {"w": g(p + ".weight"), "b": g(p + ".bias")}

    def block(i, skip):
        pre = f"blocks.{i}"
        attn = lambda a: {
            "q_w": g(f"{pre}.{a}.to_q.weight").T, "q_b": g(f"{pre}.{a}.to_q.bias"),
            "k_w": g(f"{pre}.{a}.to_k.weight").T, "k_b": g(f"{pre}.{a}.to_k.bias"),
            "v_w": g(f"{pre}.{a}.to_v.weight").T, "v_b": g(f"{pre}.{a}.to_v.bias"),
            "o_w": g(f"{pre}.{a}.to_out.weight").T, "o_b": g(f"{pre}.{a}.to_out.bias"),
        }
        p = {
            "norm1": ln(pre + ".norm1"), "norm2": ln(pre + ".norm2"),
            "norm3": ln(pre + ".norm3"),
            "rota1": {"q_norm": ln(pre + ".rota1.q_norm"),
                      "k_norm": ln(pre + ".rota1.k_norm")},
            "rota2": {"q_norm": ln(pre + ".rota2.q_norm"),
                      "k_norm": ln(pre + ".rota2.k_norm")},
            "attn1": attn("attn1"),
            "attn2": attn("attn2"),
            "modulation": lin(pre + ".modulation.1"),
            "mlp": {"fc0": lin(pre + ".mlp.0"), "fc2": lin(pre + ".mlp.2")},
        }
        if skip:
            p["skip_norm"] = ln(pre + ".skip_norm")
            p["skip_linear"] = lin(pre + ".skip_linear")
        return p

    stack = lambda bs: jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *bs)
    pe_w = g("patch_embedder.proj.weight")   # (D, C, 2, 2)
    d = pe_w.shape[0]
    return {
        "text_emb_padding": g("text_emb_padding"),
        "t5_embedder": {"fc0": lin("t5_embedder.0"), "fc2": lin("t5_embedder.2")},
        "t5_pooler": {
            "pos": g("t5_pooler.positional_embedding"),
            "q_w": g("t5_pooler.q_proj.weight"), "q_b": g("t5_pooler.q_proj.bias"),
            "k_w": g("t5_pooler.k_proj.weight"), "k_b": g("t5_pooler.k_proj.bias"),
            "v_w": g("t5_pooler.v_proj.weight"), "v_b": g("t5_pooler.v_proj.bias"),
            "c_w": g("t5_pooler.c_proj.weight"), "c_b": g("t5_pooler.c_proj.bias"),
        },
        "style": g("style_embedder"),
        "patch_embedder": {"w": pe_w.reshape(d, -1).T,
                           "b": g("patch_embedder.proj.bias")},
        "time_emb": {"fc0": lin("timestep_embedder.mlp.0"),
                     "fc2": lin("timestep_embedder.mlp.2")},
        "extra_emb": {"fc0": lin("extra_embedder.0"), "fc2": lin("extra_embedder.2")},
        "down_blocks": stack([block(i, False)
                              for i in range(cfg.num_layers_down)]),
        "up_blocks": stack([block(cfg.num_layers_down + i, True)
                            for i in range(cfg.num_layers_up)]),
        "final": {
            "linear": lin("final_layer.linear"),
            "ada": lin("final_layer.adaLN_modulation.1"),
        },
    }
