"""ChatGLM3-6B text encoder for Kolors as pure functions over a param pytree.

Architecture parity with /root/reference/diffsynth/models/kolors_text_encoder.py:
RMSNorm blocks with pre/post layernorms (:763-832), multi-query attention (32
heads, 2 kv groups, biased fused qkv, :571-716), CAUSAL attention through torch
sdpa (:479-496), partial rotary embeddings — interleaved pairs on the first
kv_channels/2 dims of each head, remainder passthrough (:379-438), SwiGLU MLP
(:717-760), final RMSNorm (post_layer_norm).

The Kolors prompter consumes hidden_states[-clip_skip] (the input of the
(n-clip_skip+1)-th layer) as the prompt embedding and the LAST TOKEN of the
pre-final-norm output as the pooled embedding
(/root/reference/diffsynth/prompters/kolors_prompter.py:330-341).
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ChatGLMConfig:
    """ChatGLM3-6B text-encoder geometry (reference ChatGLMConfig :227-309)."""

    hidden_size: int = 4096
    ffn_hidden_size: int = 13696
    num_layers: int = 28
    num_heads: int = 32
    kv_channels: int = 128
    kv_groups: int = 2
    vocab: int = 65024
    eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.kv_channels

    @property
    def rot_dim(self) -> int:
        # RotaryEmbedding(rotary_dim // 2) -> angles over kv_channels/2 dims,
        # applied to the first kv_channels/2 * 2 dims of each head (:1007-1013)
        return (self.kv_channels // 2) // 2 * 2


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return (n * w).astype(x.dtype)


@lru_cache(maxsize=8)
def _glm_rope(seq_len: int, n_elem: int):
    """Angle tables (S, n_elem//2) (reference forward_impl :387-410)."""
    theta = 1.0 / (10000.0 ** (np.arange(0, n_elem, 2, dtype=np.float64) / n_elem))
    ang = np.outer(np.arange(seq_len, dtype=np.float64), theta)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _apply_glm_rope(x, cos, sin):
    """Interleaved-pair rotation on the first rot_dim dims; rest passthrough
    (:419-438). x: (B, S, N, H); cos/sin (S, rot//2)."""
    rot = cos.shape[-1] * 2
    xr, xp = x[..., :rot], x[..., rot:]
    b, s, n, _ = x.shape
    xf = xr.astype(jnp.float32).reshape(b, s, n, -1, 2)
    c = cos[None, :, None, :]
    si = sin[None, :, None, :]
    out = jnp.stack([xf[..., 0] * c - xf[..., 1] * si,
                     xf[..., 1] * c + xf[..., 0] * si], axis=-1)
    return jnp.concatenate([out.reshape(b, s, n, rot).astype(x.dtype), xp],
                           axis=-1)


def _glm_block(p, x, cos, sin, cfg: ChatGLMConfig):
    b, s, hsz = x.shape
    n, g, hd = cfg.num_heads, cfg.kv_groups, cfg.head_dim

    h = _rms(x, p["norm1"]["w"], cfg.eps)
    qkv = h @ p["qkv"]["w"] + p["qkv"]["b"]
    q, k, v = jnp.split(qkv, [n * hd, n * hd + g * hd], axis=-1)
    q = q.reshape(b, s, n, hd)
    k = k.reshape(b, s, g, hd)
    v = v.reshape(b, s, g, hd)
    q = _apply_glm_rope(q, cos, sin)
    k = _apply_glm_rope(k, cos, sin)
    # expand kv groups to full heads (MQA)
    k = jnp.repeat(k, n // g, axis=2)
    v = jnp.repeat(v, n // g, axis=2)
    logits = jnp.einsum("bqnc,bknc->bnqk", q, k) / math.sqrt(hd)
    causal = jnp.tril(jnp.ones((s, s), bool))
    logits = jnp.where(causal[None, None], logits.astype(jnp.float32),
                       jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, -1).astype(x.dtype)
    att = jnp.einsum("bnqk,bknc->bqnc", probs, v).reshape(b, s, n * hd)
    x = x + (att @ p["dense"]["w"])

    h = _rms(x, p["norm2"]["w"], cfg.eps)
    up = h @ p["h_to_4h"]["w"]
    a, bgate = jnp.split(up, 2, axis=-1)
    h = jax.nn.silu(a.astype(jnp.float32)).astype(x.dtype) * bgate
    return x + (h @ p["4h_to_h"]["w"])


def chatglm_encode(params: Dict, cfg: ChatGLMConfig, ids: jnp.ndarray,
                   clip_skip: int = 2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ids (B, L) -> (prompt_emb (B, L, H) = hidden_states[-clip_skip],
    pooled (B, H) = last token of the pre-final-norm output)."""
    x = params["word_embeddings"][ids]
    s = ids.shape[1]
    cos_np, sin_np = _glm_rope(s, cfg.kv_channels // 2)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    states = [x]
    for i in range(cfg.num_layers):
        p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["blocks"])
        x = _glm_block(p, x, cos, sin, cfg)
        states.append(x)
    # states == reference all_hidden_states (inputs of each layer + final
    # pre-norm output); the final RMSNorm output feeds only the LM head.
    prompt_emb = states[-clip_skip]
    pooled = states[-1][:, -1]
    return prompt_emb, pooled


# ---------------------------------------------------------------------------
# Init + converter
# ---------------------------------------------------------------------------

def init_chatglm(key, cfg: ChatGLMConfig, dtype=jnp.float32) -> Dict:
    n, g, hd = cfg.num_heads, cfg.kv_groups, cfg.head_dim
    qkv_out = (n + 2 * g) * hd
    ks = jax.random.split(key, cfg.num_layers + 2)

    def block(k):
        kk = jax.random.split(k, 4)
        nrm = lambda: {"w": jnp.ones((cfg.hidden_size,), dtype)}
        lin = lambda kx, di, do: {"w": jax.random.normal(kx, (di, do), dtype) * 0.02}
        return {
            "norm1": nrm(), "norm2": nrm(),
            "qkv": {"w": jax.random.normal(kk[0], (cfg.hidden_size, qkv_out),
                                           dtype) * 0.02,
                    "b": jnp.zeros((qkv_out,), dtype)},
            "dense": lin(kk[1], n * hd, cfg.hidden_size),
            "h_to_4h": lin(kk[2], cfg.hidden_size, 2 * cfg.ffn_hidden_size),
            "4h_to_h": lin(kk[3], cfg.ffn_hidden_size, cfg.hidden_size),
        }

    blocks = [block(k) for k in ks[:cfg.num_layers]]
    return {
        "word_embeddings": jax.random.normal(
            ks[-1], (cfg.vocab, cfg.hidden_size), dtype) * 0.02,
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        "final_norm": {"w": jnp.ones((cfg.hidden_size,), dtype)},
    }


def chatglm_params_from_torch(sd, cfg: ChatGLMConfig) -> Dict:
    g = lambda k: np.asarray(sd[k])

    def block(i):
        pre = f"encoder.layers.{i}"
        return {
            "norm1": {"w": g(pre + ".input_layernorm.weight")},
            "norm2": {"w": g(pre + ".post_attention_layernorm.weight")},
            "qkv": {"w": g(pre + ".self_attention.query_key_value.weight").T,
                    "b": g(pre + ".self_attention.query_key_value.bias")},
            "dense": {"w": g(pre + ".self_attention.dense.weight").T},
            "h_to_4h": {"w": g(pre + ".mlp.dense_h_to_4h.weight").T},
            "4h_to_h": {"w": g(pre + ".mlp.dense_4h_to_h.weight").T},
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    return {
        "word_embeddings": g("embedding.word_embeddings.weight"),
        "blocks": jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *blocks),
        "final_norm": {"w": g("encoder.final_layernorm.weight")},
    }
