"""BLOOM causal LM — the BeautifulPrompt refiner backbone.

The reference's BeautifulPrompt runs a BLOOM-based LM (pai-bloom-1b1-
text2prompt-sd) through transformers generate
(/root/reference/diffsynth/prompters/prompt_refiners.py:6-54; the architecture
is registered in /root/reference/diffsynth/configs/model_config.py via the
`beautiful_prompt` resource). This is a from-scratch JAX port of that
decoder-only stack — ALiBi attention (no RoPE), fused per-head QKV, tanh-gelu
MLP, tied lm_head — with a KV-cached greedy/sampling decode loop, golden-
tested against transformers.BloomForCausalLM (tests/test_refiner_backends.py).

Layout notes that make or break parity:
  * the fused query_key_value weight groups rows PER HEAD as [q_h, k_h, v_h]
    (transformers BloomAttention views the projection as
    (..., n_head, 3, head_dim));
  * ALiBi bias depends only on the KEY position (alibi[h, :, j] =
    slopes[h] * j for an unpadded row) — which is exactly what makes the
    KV-cached decode step trivial;
  * attention scores and softmax run in float32, like the torch module.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BloomConfig:
    vocab: int
    hidden: int
    num_layers: int
    num_heads: int
    eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden // self.num_heads


# ---------------------------------------------------------------------------
# ALiBi
# ---------------------------------------------------------------------------

def alibi_slopes(n_heads: int) -> np.ndarray:
    """Per-head ALiBi slopes (transformers build_alibi_tensor)."""
    cp2 = 2 ** math.floor(math.log2(n_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(cp2) - 3)))
    slopes = [base ** i for i in range(1, cp2 + 1)]
    if cp2 != n_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * cp2) - 3)))
        n_rem = min(cp2, n_heads - cp2)
        slopes += [extra_base ** i for i in range(1, 2 * n_rem + 1, 2)]
    return np.asarray(slopes, np.float32)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _ln(x, p, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (out * p["w"].astype(jnp.float32)
            + p["b"].astype(jnp.float32)).astype(x.dtype)


def _bloom_gelu(x):
    """transformers BloomGelu: the tanh approximation."""
    x32 = x.astype(jnp.float32)
    out = 0.5 * x32 * (1.0 + jnp.tanh(0.79788456 * x32
                                      * (1.0 + 0.044715 * x32 * x32)))
    return out.astype(x.dtype)


def _split_qkv(p, h, cfg: BloomConfig):
    """Fused QKV projection -> per-head q, k, v (B, S, n, hd)."""
    b, s, _ = h.shape
    n, hd = cfg.num_heads, cfg.head_dim
    qkv = h @ p["qkv"]["w"] + p["qkv"]["b"]
    qkv = qkv.reshape(b, s, n, 3, hd)
    return qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]


def _attend(q, k, v, alibi_k, mask_bias, cfg: BloomConfig):
    """q (B,Q,n,hd), k/v (B,K,n,hd), alibi_k (n,K) key-position bias,
    mask_bias (Q,K) f32 additive -> (B, Q, n*hd)."""
    b, qlen, n, hd = q.shape
    scores = jnp.einsum("bqnc,bknc->bnqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / math.sqrt(hd)
    scores = scores + alibi_k[None, :, None, :] + mask_bias[None, None]
    probs = jax.nn.softmax(scores, -1).astype(q.dtype)
    return jnp.einsum("bnqk,bknc->bqnc", probs, v).reshape(b, qlen, n * hd)


def _block(p, x, alibi_k, mask_bias, cfg: BloomConfig):
    h = _ln(x, p["ln1"], cfg.eps)
    q, k, v = _split_qkv(p, h, cfg)
    att = _attend(q, k, v, alibi_k, mask_bias, cfg)
    x = x + att @ p["dense"]["w"] + p["dense"]["b"]
    h = _ln(x, p["ln2"], cfg.eps)
    h = _bloom_gelu(h @ p["fc1"]["w"] + p["fc1"]["b"])
    return x + h @ p["fc2"]["w"] + p["fc2"]["b"], (k, v)


def bloom_forward(params: Dict, cfg: BloomConfig, ids: jnp.ndarray):
    """ids (B, S) -> logits (B, S, V). Full-sequence causal forward (the
    golden-parity surface; generation uses the cached prefill/step below)."""
    b, s = ids.shape
    x = jnp.asarray(params["wte"])[ids]
    x = _ln(x, params["wte_ln"], cfg.eps)
    slopes = jnp.asarray(alibi_slopes(cfg.num_heads))
    alibi_k = slopes[:, None] * jnp.arange(s, dtype=jnp.float32)[None]
    causal = jnp.tril(jnp.ones((s, s), bool))
    mask_bias = jnp.where(causal, 0.0, jnp.finfo(jnp.float32).min)
    for i in range(cfg.num_layers):
        p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["blocks"])
        x, _ = _block(p, x, alibi_k, mask_bias, cfg)
    x = _ln(x, params["ln_f"], cfg.eps)
    return x @ jnp.asarray(params["wte"]).T


# ---------------------------------------------------------------------------
# KV-cached generation
# ---------------------------------------------------------------------------

def _prefill(params, cfg: BloomConfig, ids, cache_len: int):
    """-> (last-position logits (B, V), kcache, vcache (L, B, C, n, hd))."""
    b, s = ids.shape
    x = jnp.asarray(params["wte"])[ids]
    x = _ln(x, params["wte_ln"], cfg.eps)
    slopes = jnp.asarray(alibi_slopes(cfg.num_heads))
    alibi_k = slopes[:, None] * jnp.arange(s, dtype=jnp.float32)[None]
    causal = jnp.tril(jnp.ones((s, s), bool))
    mask_bias = jnp.where(causal, 0.0, jnp.finfo(jnp.float32).min)
    kcs, vcs = [], []
    for i in range(cfg.num_layers):
        p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["blocks"])
        x, (k, v) = _block(p, x, alibi_k, mask_bias, cfg)
        pad = [(0, 0), (0, cache_len - s), (0, 0), (0, 0)]
        kcs.append(jnp.pad(k, pad))
        vcs.append(jnp.pad(v, pad))
    x = _ln(x, params["ln_f"], cfg.eps)
    logits = x[:, -1] @ jnp.asarray(params["wte"]).T
    return logits, jnp.stack(kcs), jnp.stack(vcs)


@functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(3, 4))
def _decode_step(params, cfg: BloomConfig, tok, kcache, vcache, pos):
    """One cached token: tok (B,), pos scalar -> (logits (B, V), caches)."""
    b = tok.shape[0]
    cache_len = kcache.shape[2]
    x = jnp.asarray(params["wte"])[tok][:, None]
    x = _ln(x, params["wte_ln"], cfg.eps)
    slopes = jnp.asarray(alibi_slopes(cfg.num_heads))
    positions = jnp.arange(cache_len, dtype=jnp.float32)
    alibi_k = slopes[:, None] * positions[None]
    mask_bias = jnp.where(jnp.arange(cache_len) <= pos, 0.0,
                          jnp.finfo(jnp.float32).min)[None]
    new_k, new_v = [], []
    for i in range(cfg.num_layers):
        p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["blocks"])
        h = _ln(x, p["ln1"], cfg.eps)
        q, k1, v1 = _split_qkv(p, h, cfg)
        kc = jax.lax.dynamic_update_slice_in_dim(kcache[i], k1, pos, axis=1)
        vc = jax.lax.dynamic_update_slice_in_dim(vcache[i], v1, pos, axis=1)
        new_k.append(kc)
        new_v.append(vc)
        att = _attend(q, kc, vc, alibi_k, mask_bias, cfg)
        x = x + att @ p["dense"]["w"] + p["dense"]["b"]
        h = _ln(x, p["ln2"], cfg.eps)
        h = _bloom_gelu(h @ p["fc1"]["w"] + p["fc1"]["b"])
        x = x + h @ p["fc2"]["w"] + p["fc2"]["b"]
    x = _ln(x, params["ln_f"], cfg.eps)
    logits = x[:, 0] @ jnp.asarray(params["wte"]).T
    return logits, jnp.stack(new_k), jnp.stack(new_v)


def _pick(logits: np.ndarray, generated: List[int], *, sample: bool,
          temperature: float, top_k: int, top_p: float,
          repetition_penalty: float, rng) -> int:
    """Host-side token choice: greedy, or the reference's sampling recipe
    (do_sample, temperature 0.9, top_k 50, top_p 0.95, repetition_penalty 1.1
    — prompt_refiners.py:37-45)."""
    logits = logits.astype(np.float64).copy()
    if repetition_penalty != 1.0 and generated:
        seen = np.asarray(sorted(set(generated)))
        pos = logits[seen] > 0
        logits[seen] = np.where(pos, logits[seen] / repetition_penalty,
                                logits[seen] * repetition_penalty)
    if not sample:
        return int(np.argmax(logits))
    if temperature != 1.0:
        logits = logits / temperature
    if top_k and top_k < logits.size:
        kth = np.partition(logits, -top_k)[-top_k]
        logits[logits < kth] = -np.inf
    if top_p < 1.0:
        order = np.argsort(-logits)
        probs = np.exp(logits[order] - np.max(logits))
        probs /= probs.sum()
        keep = np.cumsum(probs) - probs < top_p   # always keep the top token
        logits[order[~keep]] = -np.inf
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    return int(rng.choice(logits.size, p=probs))


def bloom_generate(params: Dict, cfg: BloomConfig, input_ids,
                   max_new_tokens: int, eos_ids: Sequence[int] = (),
                   sample: bool = False, temperature: float = 0.9,
                   top_k: int = 50, top_p: float = 0.95,
                   repetition_penalty: float = 1.0,
                   seed: int = 0, cache_len: int = 0) -> List[int]:
    """KV-cached generation; greedy by default (parity-tested vs transformers
    generate(do_sample=False)), or the reference's BeautifulPrompt sampling
    recipe with sample=True. Returns generated ids (eos excluded)."""
    ids = np.asarray(input_ids)
    b, s = ids.shape
    cache_len = cache_len or s + max_new_tokens
    rng = np.random.default_rng(seed)
    logits, kc, vc = _prefill(params, cfg, jnp.asarray(ids), cache_len)
    kw = dict(sample=sample, temperature=temperature, top_k=top_k,
              top_p=top_p, repetition_penalty=repetition_penalty, rng=rng)
    toks = [_pick(np.asarray(logits[0]), ids[0].tolist(), **kw)]
    for i in range(max_new_tokens - 1):
        if toks[-1] in eos_ids:
            break
        cur = jnp.asarray([toks[-1]] * b)
        logits, kc, vc = _decode_step(params, cfg, cur, kc, vc, s + i)
        toks.append(_pick(np.asarray(logits[0]), ids[0].tolist() + toks, **kw))
    if toks and toks[-1] in eos_ids:
        toks.pop()
    return toks


# ---------------------------------------------------------------------------
# Converters / init
# ---------------------------------------------------------------------------

def infer_bloom_config(sd: Dict) -> BloomConfig:
    """Structural config from a BloomForCausalLM state dict (the n_head split
    is recoverable from the ALiBi-free shapes alone EXCEPT num_heads, which we
    take from the fused QKV rows: 3*hidden rows grouped per head — num_heads
    is hidden // head_dim with head_dim read from config.json by the loader;
    here we default to the largest power-of-two split <= 128 rows/head that
    divides hidden). Prefer passing num_heads explicitly via the loader."""
    pre = "transformer." if any(k.startswith("transformer.") for k in sd) else ""
    vocab, hidden = sd[f"{pre}word_embeddings.weight"].shape
    n_layers = 1 + max(int(k.split(".")[1 + bool(pre)])
                       for k in sd if f"{'h.' if not pre else 'transformer.h.'}"
                       in k and k.split(".")[1 + bool(pre)].isdigit())
    return BloomConfig(vocab=vocab, hidden=hidden, num_layers=n_layers,
                       num_heads=max(h for h in (2 ** p for p in range(8))
                                     if hidden % h == 0 and hidden // h <= 128))


def bloom_params_from_torch(sd: Dict, cfg: BloomConfig, dtype=None) -> Dict:
    """BloomForCausalLM state dict -> stacked-block param tree. Handles both
    the bare (BloomModel) and "transformer."-prefixed layouts; lm_head is tied
    to word_embeddings (the released BLOOM checkpoints all tie)."""
    import torch

    pre = "transformer." if any(k.startswith("transformer.") for k in sd) else ""

    def t(name, transpose=False):
        w = sd[pre + name]
        if isinstance(w, torch.Tensor):
            w = w.float().numpy()
        w = np.asarray(w)
        return w.T if transpose else w

    params = {
        "wte": t("word_embeddings.weight"),
        "wte_ln": {"w": t("word_embeddings_layernorm.weight"),
                   "b": t("word_embeddings_layernorm.bias")},
        "ln_f": {"w": t("ln_f.weight"), "b": t("ln_f.bias")},
    }
    blocks: Dict[str, list] = {}

    def add(path, arr):
        blocks.setdefault(path, []).append(arr)

    for i in range(cfg.num_layers):
        b = f"h.{i}."
        add("ln1.w", t(b + "input_layernorm.weight"))
        add("ln1.b", t(b + "input_layernorm.bias"))
        add("qkv.w", t(b + "self_attention.query_key_value.weight", True))
        add("qkv.b", t(b + "self_attention.query_key_value.bias"))
        add("dense.w", t(b + "self_attention.dense.weight", True))
        add("dense.b", t(b + "self_attention.dense.bias"))
        add("ln2.w", t(b + "post_attention_layernorm.weight"))
        add("ln2.b", t(b + "post_attention_layernorm.bias"))
        add("fc1.w", t(b + "mlp.dense_h_to_4h.weight", True))
        add("fc1.b", t(b + "mlp.dense_h_to_4h.bias"))
        add("fc2.w", t(b + "mlp.dense_4h_to_h.weight", True))
        add("fc2.b", t(b + "mlp.dense_4h_to_h.bias"))
    stacked: Dict = {}
    for path, arrs in blocks.items():
        node, leaf = path.split(".")
        stacked.setdefault(node, {})[leaf] = np.stack(arrs)
    params["blocks"] = stacked
    if dtype is not None:
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype), params)
    return params


def init_bloom(key, cfg: BloomConfig, dtype=jnp.float32) -> Dict:
    """Random params in the converter's layout (tests)."""
    ks = iter(jax.random.split(key, 6 * cfg.num_layers + 2))
    h = cfg.hidden

    def lin(k, i, o):
        return {"w": jax.random.normal(k, (i, o), dtype) * 0.02,
                "b": jnp.zeros((o,), dtype)}

    def ln():
        return {"w": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)}

    blocks = {"ln1": {"w": [], "b": []}, "ln2": {"w": [], "b": []},
              "qkv": {"w": [], "b": []}, "dense": {"w": [], "b": []},
              "fc1": {"w": [], "b": []}, "fc2": {"w": [], "b": []}}
    for _ in range(cfg.num_layers):
        for name, (i, o) in (("qkv", (h, 3 * h)), ("dense", (h, h)),
                             ("fc1", (h, 4 * h)), ("fc2", (4 * h, h))):
            p = lin(next(ks), i, o)
            blocks[name]["w"].append(p["w"])
            blocks[name]["b"].append(p["b"])
        for name in ("ln1", "ln2"):
            p = ln()
            blocks[name]["w"].append(p["w"])
            blocks[name]["b"].append(p["b"])
    blocks = {k: {kk: jnp.stack(vv) for kk, vv in v.items()}
              for k, v in blocks.items()}
    return {
        "wte": jax.random.normal(next(ks), (cfg.vocab, h), dtype) * 0.02,
        "wte_ln": ln(), "ln_f": ln(), "blocks": blocks,
    }
