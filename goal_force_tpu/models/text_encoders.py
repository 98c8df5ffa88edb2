"""Auxiliary text encoders: HunyuanDiT CLIP (BERT) and StepVideo Step1 LLM.

Reference parity:
- HunyuanDiTCLIPTextEncoder (/root/reference/diffsynth/models/
  hunyuan_dit_text_encoder.py): a BERT tower (1024 hidden, 24 post-LN layers,
  gelu, absolute positions, token-type embeddings) returning hidden states at
  -clip_skip with the padding attention mask applied.
- STEP1TextEncoder (/root/reference/diffsynth/models/stepvideo_text_encoder.py):
  LLaMA-style embedding + pre-RMSNorm blocks with multi-query attention
  (fused wqkv, NO rotary in the vendored encoder, non-causal attention
  :257-372) and fused SwiGLU FFs (:374-402); no final norm (:509-528).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# BERT (HunyuanDiT CLIP)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BertConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    vocab: int = 47020
    max_positions: int = 512
    type_vocab: int = 2
    eps: float = 1e-12


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * p["scale"]
            + p["bias"]).astype(x.dtype)


def bert_encode(params: Dict, cfg: BertConfig, input_ids: jnp.ndarray,
                attention_mask: jnp.ndarray, clip_skip: int = 1) -> jnp.ndarray:
    """(B, S) ids + 0/1 mask -> hidden states of layer -clip_skip (B, S, H)
    (reference forward :43-115: clip_skip>1 stops clip_skip-1 layers early)."""
    b, s = input_ids.shape
    x = params["word_emb"][input_ids] \
        + params["pos_emb"][:s][None] \
        + params["type_emb"][0][None, None]
    x = _ln(params["emb_ln"], x, cfg.eps)

    bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                     jnp.finfo(jnp.float32).min)
    n, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads
    keep = cfg.num_layers - (clip_skip - 1)
    for i in range(keep):
        p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["blocks"])
        q = (x @ p["q"]["w"] + p["q"]["b"]).reshape(b, s, n, hd)
        k = (x @ p["k"]["w"] + p["k"]["b"]).reshape(b, s, n, hd)
        v = (x @ p["v"]["w"] + p["v"]["b"]).reshape(b, s, n, hd)
        logits = jnp.einsum("bqnc,bknc->bnqk", q, k) / math.sqrt(hd)
        probs = jax.nn.softmax(logits.astype(jnp.float32) + bias,
                               -1).astype(x.dtype)
        att = jnp.einsum("bnqk,bknc->bqnc", probs, v).reshape(b, s, -1)
        x = _ln(p["attn_ln"], x + (att @ p["o"]["w"] + p["o"]["b"]), cfg.eps)
        h = x @ p["fc1"]["w"] + p["fc1"]["b"]
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
        x = _ln(p["out_ln"], x + (h @ p["fc2"]["w"] + p["fc2"]["b"]), cfg.eps)
    return x


def bert_params_from_torch(sd, cfg: BertConfig, prefix: str = "") -> Dict:
    g = lambda k: jnp.asarray(np.asarray(sd[prefix + k]))
    lin = lambda pre: {"w": g(pre + ".weight").T, "b": g(pre + ".bias")}
    nrm = lambda pre: {"scale": g(pre + ".weight"), "bias": g(pre + ".bias")}

    def block(i):
        pre = f"encoder.layer.{i}"
        return {
            "q": lin(pre + ".attention.self.query"),
            "k": lin(pre + ".attention.self.key"),
            "v": lin(pre + ".attention.self.value"),
            "o": lin(pre + ".attention.output.dense"),
            "attn_ln": nrm(pre + ".attention.output.LayerNorm"),
            "fc1": lin(pre + ".intermediate.dense"),
            "fc2": lin(pre + ".output.dense"),
            "out_ln": nrm(pre + ".output.LayerNorm"),
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    return {
        "word_emb": g("embeddings.word_embeddings.weight"),
        "pos_emb": g("embeddings.position_embeddings.weight"),
        "type_emb": g("embeddings.token_type_embeddings.weight"),
        "emb_ln": nrm("embeddings.LayerNorm"),
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
    }


# ---------------------------------------------------------------------------
# Step1 LLM
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Step1Config:
    hidden_size: int = 6144
    num_layers: int = 48
    num_heads: int = 48
    num_groups: int = 8
    ffn_hidden_size: int = 16384
    vocab: int = 65536
    eps: float = 1e-5
    multiple_of: int = 256

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def ff_dim(self) -> int:
        m = self.multiple_of
        return m * ((self.ffn_hidden_size + m - 1) // m)


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return (n * w).astype(x.dtype)


def step1_encode(params: Dict, cfg: Step1Config,
                 input_ids: jnp.ndarray) -> jnp.ndarray:
    """(B, S) ids -> (B, S, H) hidden states (reference Step1Model :509-528;
    attention is bidirectional, padding handled by the caller's mask)."""
    b, s = input_ids.shape
    n, g, hd = cfg.num_heads, cfg.num_groups, cfg.head_dim
    x = jnp.asarray(params["word_emb"])[input_ids]
    for i in range(cfg.num_layers):
        p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["blocks"])
        h = _rms(x, p["attn_norm"]["w"], cfg.eps)
        qkv = h @ p["wqkv"]["w"]
        q, kv = jnp.split(qkv, [n * hd], axis=-1)
        q = q.reshape(b, s, n, hd)
        kv = kv.reshape(b, s, g, 2 * hd)
        k, v = jnp.split(kv, 2, axis=-1)
        # group expansion == repeat_interleave (reference :389-404)
        k = jnp.repeat(k, n // g, axis=2)
        v = jnp.repeat(v, n // g, axis=2)
        logits = jnp.einsum("bqnc,bknc->bnqk", q, k) / math.sqrt(hd)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
        att = jnp.einsum("bnqk,bknc->bqnc", probs, v).reshape(b, s, n * hd)
        x = x + att @ p["wo"]["w"]
        h = _rms(x, p["ffn_norm"]["w"], cfg.eps)
        up = h @ p["w1"]["w"]
        a, gate = jnp.split(up, 2, axis=-1)
        h = jax.nn.silu(a.astype(jnp.float32)).astype(x.dtype) * gate
        x = x + h @ p["w2"]["w"]
    return x


def step1_params_from_torch(sd, cfg: Step1Config) -> Dict:
    g_ = lambda k: jnp.asarray(np.asarray(sd[k]))

    def block(i):
        pre = f"transformer.layers.{i}"
        return {
            "attn_norm": {"w": g_(pre + ".attention_norm.weight")},
            "ffn_norm": {"w": g_(pre + ".ffn_norm.weight")},
            "wqkv": {"w": g_(pre + ".attention.wqkv.weight").T},
            "wo": {"w": g_(pre + ".attention.wo.weight").T},
            "w1": {"w": g_(pre + ".feed_forward.w1.weight").T},
            "w2": {"w": g_(pre + ".feed_forward.w2.weight").T},
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    return {
        "word_emb": g_("tok_embeddings.word_embeddings.weight"),
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
    }


# ---------------------------------------------------------------------------
# Llama (HunyuanVideo LLM text encoder)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """HunyuanVideo's llava-llama-3-8B text tower (reference
    hunyuan_video_text_encoder.py:6-49)."""

    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    intermediate_size: int = 14336
    vocab: int = 128320
    eps: float = 1e-5
    rope_theta: float = 500000.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _rotate_half(x):
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


def llama_encode(params: Dict, cfg: LlamaConfig, input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray,
                 hidden_state_skip_layer: int = 2) -> jnp.ndarray:
    """(B, S) ids + 0/1 mask -> hidden states with the LAST
    hidden_state_skip_layer layers skipped (reference forward :15-49; no
    final norm)."""
    x = jnp.asarray(params["word_emb"])[input_ids]
    return llama_layers(params, cfg, x, attention_mask,
                        keep=cfg.num_layers - hidden_state_skip_layer)


def llama_layers(params: Dict, cfg: LlamaConfig, x: jnp.ndarray,
                 attention_mask: jnp.ndarray, keep: int) -> jnp.ndarray:
    """The llama decoder stack on PRE-COMPUTED input embeddings (B, S, D) —
    the shared core of llama_encode and the LLaVA multimodal encoder
    (models/llava.py), which splices vision features into the embeddings
    before the layers run. Early-exits after `keep` layers (the reference's
    hidden_state_skip_layer semantics)."""
    b, s = x.shape[:2]
    n, nk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    inv_freq = 1.0 / cfg.rope_theta ** (np.arange(0, hd, 2) / hd)
    ang = np.arange(s)[:, None] * inv_freq[None]
    cos = jnp.asarray(np.concatenate([np.cos(ang), np.cos(ang)], -1),
                      jnp.float32)[None, :, None, :]
    sin = jnp.asarray(np.concatenate([np.sin(ang), np.sin(ang)], -1),
                      jnp.float32)[None, :, None, :]

    causal = jnp.tril(jnp.ones((s, s), bool))
    ok = causal[None] & (attention_mask[:, None, :] > 0)
    bias = jnp.where(ok[:, None], 0.0, jnp.finfo(jnp.float32).min)

    for i in range(keep):
        p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["blocks"])
        h = _rms(x, p["norm1"]["w"], cfg.eps)
        q = (h @ p["q"]["w"]).reshape(b, s, n, hd)
        k = (h @ p["k"]["w"]).reshape(b, s, nk, hd)
        v = (h @ p["v"]["w"]).reshape(b, s, nk, hd)
        q = (q.astype(jnp.float32) * cos
             + _rotate_half(q.astype(jnp.float32)) * sin).astype(x.dtype)
        k = (k.astype(jnp.float32) * cos
             + _rotate_half(k.astype(jnp.float32)) * sin).astype(x.dtype)
        k = jnp.repeat(k, n // nk, axis=2)
        v = jnp.repeat(v, n // nk, axis=2)
        logits = jnp.einsum("bqnc,bknc->bnqk", q, k) / math.sqrt(hd)
        probs = jax.nn.softmax(logits.astype(jnp.float32) + bias,
                               -1).astype(x.dtype)
        att = jnp.einsum("bnqk,bknc->bqnc", probs, v).reshape(b, s, -1)
        x = x + att @ p["o"]["w"]
        h = _rms(x, p["norm2"]["w"], cfg.eps)
        gate = jax.nn.silu((h @ p["gate"]["w"]).astype(jnp.float32)).astype(x.dtype)
        x = x + (gate * (h @ p["up"]["w"])) @ p["down"]["w"]
    return x


def llama_params_from_torch(sd, cfg: LlamaConfig, prefix: str = "") -> Dict:
    g = lambda k: jnp.asarray(np.asarray(sd[prefix + k]))

    def block(i):
        pre = f"{prefix}layers.{i}"
        t = lambda k: jnp.asarray(np.asarray(sd[pre + k]).T)
        return {
            "norm1": {"w": g(f"layers.{i}.input_layernorm.weight")},
            "norm2": {"w": g(f"layers.{i}.post_attention_layernorm.weight")},
            "q": {"w": t(".self_attn.q_proj.weight")},
            "k": {"w": t(".self_attn.k_proj.weight")},
            "v": {"w": t(".self_attn.v_proj.weight")},
            "o": {"w": t(".self_attn.o_proj.weight")},
            "gate": {"w": t(".mlp.gate_proj.weight")},
            "up": {"w": t(".mlp.up_proj.weight")},
            "down": {"w": t(".mlp.down_proj.weight")},
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    return {
        "word_emb": g("embed_tokens.weight"),
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
    }
