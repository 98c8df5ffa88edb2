"""OmniGen: a Phi-3 decoder LLM as multimodal diffusion backbone.

Architecture parity with /root/reference/diffsynth/models/omnigen.py:
- PatchEmbedMR (:307-323): 2x2 patch conv == patchify + matmul, feature order
  (c, dy, dx).
- 2D sincos pos embed over a 192x192 grid, base_size 64, center-cropped
  (:255-304, :426-448).
- time_token / t_embedder sinusoid MLPs with cos-before-sin embedding
  (:195-232).
- sequence = [text embeds with input-image latents spliced in, time token,
  noisy latents]; Phi3Transformer consumes a full (B, S, S) 0/1 attention mask
  (:56-124, :489-531).
- Phi-3 blocks: RMSNorm, fused qkv_proj, split-half rotary with "su"
  (LongRoPE) frequency scaling, fused gate_up SwiGLU MLP.
- FinalLayer (:235-252): adaLN(shift, scale) on the last num_tokens outputs,
  then linear to p*p*C with feature order (dy, dx, c) (:413-423).
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OmniGenConfig:
    """Phi-3-vision geometry used by OmniGen (reference :580-714)."""

    hidden_size: int = 3072
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    intermediate_size: int = 8192
    vocab: int = 32064
    eps: float = 1e-5
    rope_theta: float = 10000.0
    original_max_positions: int = 4096
    max_positions: int = 131072
    rope_short_factor: Optional[Tuple[float, ...]] = None
    rope_long_factor: Optional[Tuple[float, ...]] = None
    patch_size: int = 2
    in_channels: int = 4
    pos_embed_max_size: int = 192
    pe_interpolation: float = 1.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


# ---------------------------------------------------------------------------
# Positional / timestep embeddings
# ---------------------------------------------------------------------------

def _sincos_1d(dim: int, pos: np.ndarray) -> np.ndarray:
    omega = 1.0 / 10000.0 ** (np.arange(dim // 2, dtype=np.float64) / (dim / 2.0))
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


@lru_cache(maxsize=4)
def omnigen_pos_embed(dim: int, grid_size: int, interpolation: float,
                      base_size: int = 64) -> np.ndarray:
    """get_2d_sincos_pos_embed (:255-283): grid scaled by base_size/grid_size;
    first half of features from the W coords, second from the H coords."""
    coords = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size) \
        / interpolation
    gw, gh = np.meshgrid(coords, coords)  # 'xy': gw varies along axis 1
    emb_w = _sincos_1d(dim // 2, gw)
    emb_h = _sincos_1d(dim // 2, gh)
    return np.concatenate([emb_w, emb_h], axis=1).astype(np.float32)


def cropped_pos_embed(cfg: OmniGenConfig, height: int, width: int) -> jnp.ndarray:
    """Center crop of the max-size grid (:426-448); height/width in pixels."""
    h, w = height // cfg.patch_size, width // cfg.patch_size
    g = cfg.pos_embed_max_size
    table = omnigen_pos_embed(cfg.hidden_size, g, cfg.pe_interpolation)
    top, left = (g - h) // 2, (g - w) // 2
    grid = table.reshape(g, g, -1)[top:top + h, left:left + w]
    return jnp.asarray(grid.reshape(1, h * w, -1))


def omnigen_timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """cos-first sinusoid (:208-227)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def _time_mlp(p, t, dim, dtype):
    h = omnigen_timestep_embedding(t, 256).astype(dtype)
    h = jax.nn.silu(h @ p["fc0"]["w"] + p["fc0"]["b"])
    return h @ p["fc2"]["w"] + p["fc2"]["b"]


# ---------------------------------------------------------------------------
# Phi-3 decoder
# ---------------------------------------------------------------------------

def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return (n.astype(x.dtype)) * w


@lru_cache(maxsize=8)
def _su_rope_tables(cfg: OmniGenConfig, seq_len: int):
    """Phi-3 'su' (LongRoPE) tables: per-dim external factors scale the inverse
    frequencies; cos/sin are amplified by sqrt(1 + ln(scale)/ln(orig)) when the
    trained context exceeds the original window (transformers
    Phi3SuScaledRotaryEmbedding semantics; reference config :601-703)."""
    d = cfg.head_dim
    if seq_len > cfg.original_max_positions and cfg.rope_long_factor:
        ext = np.asarray(cfg.rope_long_factor, np.float64)
    elif cfg.rope_short_factor:
        ext = np.asarray(cfg.rope_short_factor, np.float64)
    else:
        ext = np.ones((d // 2,), np.float64)
    inv_freq = 1.0 / (ext * cfg.rope_theta
                      ** (np.arange(0, d, 2, dtype=np.float64) / d))
    scale = cfg.max_positions / cfg.original_max_positions
    amp = 1.0 if scale <= 1.0 else math.sqrt(
        1.0 + math.log(scale) / math.log(cfg.original_max_positions))
    ang = np.outer(np.arange(seq_len, dtype=np.float64), inv_freq)
    cos = (np.cos(ang) * amp).astype(np.float32)
    sin = (np.sin(ang) * amp).astype(np.float32)
    return cos, sin


def _rotate_half(x):
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


def _apply_rope_halves(x, cos, sin):
    """Split-half rotary (transformers rotate_half); cos/sin (S, d/2) are
    duplicated over both halves. x: (B, S, N, D)."""
    c = jnp.concatenate([cos, cos], axis=-1)[None, :, None, :]
    s = jnp.concatenate([sin, sin], axis=-1)[None, :, None, :]
    return x * c + _rotate_half(x) * s


def _phi3_block(p, x, mask_bias, cos, sin, cfg: OmniGenConfig,
                past_kv=None, keep_prefix: int = 0):
    """past_kv: (k, v) of the cached CONDITION prefix, (B, S_past, nk, hd)
    post-rope — new keys are appended behind it (reference OmniGenCache
    semantics, omnigen_image.py:17-110). keep_prefix > 0 returns this
    block's own prefix K/V for caching."""
    b, s, _ = x.shape
    n, nk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    h = _rms(x, p["norm1"]["w"], cfg.eps)
    qkv = h @ p["qkv"]["w"]
    q, k, v = jnp.split(qkv, [n * hd, (n + nk) * hd], axis=-1)
    q = _apply_rope_halves(q.reshape(b, s, n, hd), cos, sin)
    k = _apply_rope_halves(k.reshape(b, s, nk, hd), cos, sin)
    v = v.reshape(b, s, nk, hd)
    prefix = (k[:, :keep_prefix], v[:, :keep_prefix]) if keep_prefix else None
    if past_kv is not None:
        k = jnp.concatenate([past_kv[0].astype(k.dtype), k], axis=1)
        v = jnp.concatenate([past_kv[1].astype(v.dtype), v], axis=1)
    if nk != n:
        k = jnp.repeat(k, n // nk, axis=2)
        v = jnp.repeat(v, n // nk, axis=2)
    logits = jnp.einsum("bqnc,bknc->bnqk", q, k) / math.sqrt(hd)
    logits = logits.astype(jnp.float32) + mask_bias[:, None]
    probs = jax.nn.softmax(logits, -1).astype(x.dtype)
    att = jnp.einsum("bnqk,bknc->bqnc", probs, v).reshape(b, s, n * hd)
    x = x + att @ p["o"]["w"]

    h = _rms(x, p["norm2"]["w"], cfg.eps)
    gu = h @ p["gate_up"]["w"]
    gate, up = jnp.split(gu, 2, axis=-1)
    h = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    return x + h @ p["down"]["w"], prefix


def phi3_run(params, cfg: OmniGenConfig, embeds, attn_mask, position_ids=None,
             past_kv=None, keep_prefix: int = 0):
    """Decoder stack over precomputed input embeddings with a (B, S_q, S_kv)
    0/1 mask (reference Phi3Transformer.forward :56-188).

    past_kv: per-layer [(k, v), ...] condition-prefix cache; embeds then
    holds only the suffix tokens and position_ids must carry their absolute
    positions. keep_prefix: collect each layer's first keep_prefix K/V."""
    b, s, _ = embeds.shape
    s_total = s + (past_kv[0][0].shape[1] if past_kv is not None else 0)
    cos_np, sin_np = _su_rope_tables(cfg, s_total)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
    if position_ids is not None:
        cos = cos[position_ids[0]]
        sin = sin[position_ids[0]]
    mask_bias = (1.0 - attn_mask.astype(jnp.float32)) * jnp.finfo(jnp.float32).min
    x = embeds
    prefixes = []
    for i in range(cfg.num_layers):
        p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["blocks"])
        x, pre = _phi3_block(p, x, mask_bias, cos, sin, cfg,
                             past_kv=None if past_kv is None else past_kv[i],
                             keep_prefix=keep_prefix)
        prefixes.append(pre)
    out = _rms(x, params["final_norm"]["w"], cfg.eps)
    return (out, prefixes) if keep_prefix else out


# ---------------------------------------------------------------------------
# OmniGen top level
# ---------------------------------------------------------------------------

def _patch_embed(p, x, patch: int):
    """(B, H, W, C) -> (B, hw, D), feature order (c, dy, dx) (:307-323)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // patch, patch, w // patch, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(
        b, (h // patch) * (w // patch), c * patch * patch)
    return x @ p["w"] + p["b"]


def omnigen_unpatchify(x, height: int, width: int, patch: int, channels: int):
    """(B, T, p*p*C) feature order (dy, dx, c) -> (B, H, W, C) (:413-423)."""
    b = x.shape[0]
    gh, gw = height // patch, width // patch
    x = x.reshape(b, gh, gw, patch, patch, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, height, width, channels)


def omnigen_forward(
    params: Dict,
    cfg: OmniGenConfig,
    latents: jnp.ndarray,                 # (B, H, W, 4) noisy latents, NHWC
    timestep: jnp.ndarray,                # (B,)
    input_ids: Optional[jnp.ndarray],     # (B, L) prompt tokens
    attn_mask: jnp.ndarray,               # (B, S, S) 0/1
    input_img_latents: Sequence[jnp.ndarray] = (),   # [(1, h, w, 4), ...]
    image_slices: Sequence[Tuple[int, int, int]] = (),  # (batch, start, end)
    position_ids: Optional[jnp.ndarray] = None,
    past_kv=None,
    return_past_kv: bool = False,
) -> jnp.ndarray:
    """Reference OmniGenTransformer.forward (:717-756). input_img_latents are
    patch-embedded with input_x_embedder and spliced into the text embedding at
    image_slices; sequence = [cond, time_token, image].

    KV cache (reference OmniGenCache, omnigen_image.py:17-110): the CONDITION
    prefix (everything except time_token + image tokens) is timestep-invariant,
    so return_past_kv=True returns its per-layer K/V from a full forward, and
    past_kv replays them on subsequent steps — the model then consumes only
    [time_token, image] with a row-cropped mask and suffix position_ids."""
    b, hgt, wdt, _ = latents.shape
    dtype = params["x_embedder"]["w"].dtype
    x = _patch_embed(params["x_embedder"], latents.astype(dtype), cfg.patch_size)
    x = x + cropped_pos_embed(cfg, hgt, wdt).astype(dtype)
    num_tokens = x.shape[1]
    time_token = _time_mlp(params["time_token"], timestep, cfg.hidden_size,
                           dtype)[:, None]

    if past_kv is not None:
        seq = jnp.concatenate([time_token, x], axis=1)
    elif input_ids is not None:
        cond = jnp.asarray(params["wte"])[input_ids].astype(dtype)
        for (bi, s0, s1), lat in zip(image_slices, input_img_latents):
            emb = _patch_embed(params["input_x_embedder"], lat.astype(dtype),
                               cfg.patch_size)
            emb = emb + cropped_pos_embed(cfg, lat.shape[1],
                                          lat.shape[2]).astype(dtype)
            cond = cond.at[bi, s0:s1].set(emb[0])
        seq = jnp.concatenate([cond, time_token, x], axis=1)
    else:
        seq = jnp.concatenate([time_token, x], axis=1)

    keep = seq.shape[1] - (num_tokens + 1) if return_past_kv else 0
    out = phi3_run(params, cfg, seq, attn_mask, position_ids,
                   past_kv=past_kv, keep_prefix=keep)
    if return_past_kv:
        out, prefix_kv = out
    img = out[:, -num_tokens:]
    temb = _time_mlp(params["t_embedder"], timestep, cfg.hidden_size, dtype)
    e = jax.nn.silu(temb.astype(jnp.float32)).astype(dtype)
    e = e @ params["final_ada"]["w"] + params["final_ada"]["b"]
    shift, scale = jnp.split(e, 2, axis=-1)
    mu = img.astype(jnp.float32).mean(-1, keepdims=True)
    var = img.astype(jnp.float32).var(-1, keepdims=True)
    normed = ((img.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + 1e-6)) \
        .astype(dtype)
    h = normed * (1 + scale[:, None]) + shift[:, None]
    h = h @ params["final_linear"]["w"] + params["final_linear"]["b"]
    res = omnigen_unpatchify(h, hgt, wdt, cfg.patch_size, cfg.in_channels)
    return (res, prefix_kv) if return_past_kv else res


# ---------------------------------------------------------------------------
# Init + converter
# ---------------------------------------------------------------------------

def init_omnigen(key, cfg: OmniGenConfig, dtype=jnp.float32) -> Dict:
    d, hd = cfg.hidden_size, cfg.head_dim
    qkv_out = (cfg.num_heads + 2 * cfg.num_kv_heads) * hd
    ks = jax.random.split(key, cfg.num_layers + 8)
    lin = lambda k, di, do: {"w": jax.random.normal(k, (di, do), dtype) * 0.02,
                             "b": jnp.zeros((do,), dtype)}
    linn = lambda k, di, do: {"w": jax.random.normal(k, (di, do), dtype) * 0.02}

    def block(k):
        kk = jax.random.split(k, 4)
        return {
            "norm1": {"w": jnp.ones((d,), dtype)},
            "norm2": {"w": jnp.ones((d,), dtype)},
            "qkv": linn(kk[0], d, qkv_out),
            "o": linn(kk[1], cfg.num_heads * hd, d),
            "gate_up": linn(kk[2], d, 2 * cfg.intermediate_size),
            "down": linn(kk[3], cfg.intermediate_size, d),
        }

    blocks = [block(k) for k in ks[:cfg.num_layers]]
    pdim = cfg.in_channels * cfg.patch_size ** 2
    return {
        "wte": jax.random.normal(ks[-1], (cfg.vocab, d), dtype) * 0.02,
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        "final_norm": {"w": jnp.ones((d,), dtype)},
        "x_embedder": lin(ks[-2], pdim, d),
        "input_x_embedder": lin(ks[-3], pdim, d),
        "time_token": {"fc0": lin(ks[-4], 256, d), "fc2": lin(ks[-5], d, d)},
        "t_embedder": {"fc0": lin(ks[-6], 256, d), "fc2": lin(ks[-7], d, d)},
        "final_ada": lin(ks[-8], d, 2 * d),
        "final_linear": lin(ks[-8], d, pdim),
    }


def omnigen_params_from_torch(sd, cfg: OmniGenConfig) -> Dict:
    """Consume the OmniGen checkpoint layout (reference from_pretrained
    :363-378; the reference converter is the identity :795-803)."""
    g = lambda k: np.asarray(sd[k])
    lin = lambda pre: {"w": g(pre + ".weight").T, "b": g(pre + ".bias")}
    linn = lambda pre: {"w": g(pre + ".weight").T}

    def block(i):
        pre = f"llm.layers.{i}"
        return {
            "norm1": {"w": g(pre + ".input_layernorm.weight")},
            "norm2": {"w": g(pre + ".post_attention_layernorm.weight")},
            "qkv": linn(pre + ".self_attn.qkv_proj"),
            "o": linn(pre + ".self_attn.o_proj"),
            "gate_up": linn(pre + ".mlp.gate_up_proj"),
            "down": linn(pre + ".mlp.down_proj"),
        }

    def conv_embed(pre):
        # PatchEmbedMR Conv2d (D, C, p, p) -> matmul over (c, dy, dx) features
        w = g(pre + ".proj.weight")
        d, c, p, _ = w.shape
        return {"w": w.reshape(d, c * p * p).T, "b": g(pre + ".proj.bias")}

    blocks = [block(i) for i in range(cfg.num_layers)]
    return {
        "wte": g("llm.embed_tokens.weight"),
        "blocks": jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *blocks),
        "final_norm": {"w": g("llm.norm.weight")},
        "x_embedder": conv_embed("x_embedder"),
        "input_x_embedder": conv_embed("input_x_embedder"),
        "time_token": {"fc0": lin("time_token.mlp.0"),
                       "fc2": lin("time_token.mlp.2")},
        "t_embedder": {"fc0": lin("t_embedder.mlp.0"),
                       "fc2": lin("t_embedder.mlp.2")},
        "final_ada": lin("final_layer.adaLN_modulation.1"),
        "final_linear": lin("final_layer.linear"),
    }
