"""umt5-xxl encoder (text conditioning) as pure pytree functions.

Architecture parity with /root/reference/diffsynth/models/wan_video_text_encoder.py:
T5LayerNorm (:22-35), T5Attention (:38-89, unscaled attention + f32 softmax),
T5FeedForward (:92-110, fc1(x)*GELU(gate(x))), per-layer bidirectional relative position
buckets (shared_pos=False for umt5, :113-190).

TPU-first details: the 24 blocks are stacked and scanned; the (Lq, Lk) bucket matrix is a
static host-side numpy table (text_len is fixed at 512), so per-layer bias is one gather.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.configs import T5Config


def t5_layer_norm(x, w, eps: float = 1e-6):
    """RMS-style norm in f32; cast to weight dtype before scaling (:30-35)."""
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return w * n.astype(w.dtype)


def t5_gelu(x):
    """The reference's explicit tanh GELU (:15-19)."""
    xf = x.astype(jnp.float32)
    out = 0.5 * xf * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (xf + 0.044715 * xf**3)))
    return out.astype(x.dtype)


@lru_cache(maxsize=4)
def relative_buckets(lq: int, lk: int, num_buckets: int = 32, max_dist: int = 128) -> np.ndarray:
    """Static (Lq, Lk) int32 bucket matrix, bidirectional (:171-190)."""
    rel = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact) / math.log(max_dist / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(rel < max_exact, rel, large)
    return buckets.astype(np.int32)


def t5_attention(p, x, bias, num_heads: int):
    """Unscaled attention with additive bias, f32 softmax (:55-89)."""
    b, l, _ = x.shape
    q = jnp.matmul(x, p["q"]["w"]).reshape(b, l, num_heads, -1)
    k = jnp.matmul(x, p["k"]["w"]).reshape(b, l, num_heads, -1)
    v = jnp.matmul(x, p["v"]["w"]).reshape(b, l, num_heads, -1)
    logits = jnp.einsum("binc,bjnc->bnij", q, k, preferred_element_type=jnp.float32)
    logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bnij,bjnc->binc", probs, v).reshape(b, l, -1)
    return jnp.matmul(out, p["o"]["w"])


def t5_block(p, x, mask_bias, buckets, num_heads: int, pos_bias=None):
    """One encoder block (:113-144). mask_bias: (B,1,1,L) additive; buckets: (L,L) int32.
    pos_bias overrides the per-layer relative embedding (shared_pos models — plain T5
    v1.1 shares layer 0's bias across all layers)."""
    if pos_bias is None:
        pos_bias = p["pos_embedding"][buckets]          # (L, L, H)
        pos_bias = jnp.transpose(pos_bias, (2, 0, 1))[None]  # (1, H, L, L)
    h = t5_layer_norm(x, p["norm1"]["w"])
    x = x + t5_attention(p["attn"], h, pos_bias + mask_bias, num_heads)
    h = t5_layer_norm(x, p["norm2"]["w"])
    ff = jnp.matmul(h, p["ffn"]["fc1"]["w"]) * t5_gelu(jnp.matmul(h, p["ffn"]["gate"]["w"]))
    x = x + jnp.matmul(ff, p["ffn"]["fc2"]["w"])
    return x


def t5_encode(params, cfg: T5Config, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """ids, mask: (B, L) int32 -> embeddings (B, L, dim).

    Matches WanTextEncoder.forward (:245-254); positions past each sample's length are
    zeroed by the caller (prompter), as in wan_prompter.py:107-108.
    """
    x = params["token_embedding"][ids]
    l = ids.shape[1]
    buckets = jnp.asarray(relative_buckets(l, l, cfg.num_buckets, cfg.rel_max_dist))
    neg = jnp.finfo(jnp.float32).min
    mask_bias = jnp.where(mask[:, None, None, :] == 0, neg, 0.0).astype(jnp.float32)

    shared_bias = None
    if cfg.shared_pos:
        # plain T5 v1.1 (Flux/SD3 text encoder): layer 0's relative bias everywhere
        pe = params["blocks"]["pos_embedding"][0]            # (buckets, H)
        shared_bias = jnp.transpose(pe[buckets], (2, 0, 1))[None]

    def body(carry, p):
        return t5_block(p, carry, mask_bias, buckets, cfg.num_heads, shared_bias), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return t5_layer_norm(x, params["norm"]["w"])


def init_t5(key, cfg: T5Config, dtype=jnp.bfloat16):
    def lin(k, din, dout, std):
        return {"w": (jax.random.normal(k, (din, dout)) * std).astype(dtype)}

    def block(k):
        ks = jax.random.split(k, 8)
        return {
            "norm1": {"w": jnp.ones((cfg.dim,), dtype)},
            "norm2": {"w": jnp.ones((cfg.dim,), dtype)},
            "attn": {
                "q": lin(ks[0], cfg.dim, cfg.dim_attn, (cfg.dim * cfg.dim_attn) ** -0.5),
                "k": lin(ks[1], cfg.dim, cfg.dim_attn, cfg.dim**-0.5),
                "v": lin(ks[2], cfg.dim, cfg.dim_attn, cfg.dim**-0.5),
                "o": lin(ks[3], cfg.dim_attn, cfg.dim, (cfg.num_heads * cfg.dim_attn) ** -0.5),
            },
            "ffn": {
                "gate": lin(ks[4], cfg.dim, cfg.dim_ffn, cfg.dim**-0.5),
                "fc1": lin(ks[5], cfg.dim, cfg.dim_ffn, cfg.dim**-0.5),
                "fc2": lin(ks[6], cfg.dim_ffn, cfg.dim, cfg.dim_ffn**-0.5),
            },
            "pos_embedding": (
                jax.random.normal(ks[7], (cfg.num_buckets, cfg.num_heads))
                * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5
            ).astype(dtype),
        }

    ks = jax.random.split(key, cfg.num_layers + 2)
    blocks = [block(k) for k in ks[: cfg.num_layers]]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "token_embedding": (jax.random.normal(ks[-1], (cfg.vocab, cfg.dim))).astype(dtype),
        "norm": {"w": jnp.ones((cfg.dim,), dtype)},
        "blocks": stacked,
    }
