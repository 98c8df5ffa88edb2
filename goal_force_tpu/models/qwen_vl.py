"""Qwen2.5-VL backbone: GQA text decoder with M-RoPE + windowed vision tower.

Used by two reference components: the Qwen-Image prompt embedder
(/root/reference/diffsynth/models/qwenvl.py — last-layer hidden states of
Qwen2_5_VLForConditionalGeneration) and the NexusGen autoregressive model
(/root/reference/diffsynth/models/nexus_gen_ar_model.py — same backbone plus a
vision_head and 81 learned image-prefill embeddings).

Semantics mirrored from the reference's pinned transformers implementation:
- text M-RoPE: per-(t,h,w) frequency tables, channel sections (16, 24, 24)
  interleaved over the duplicated half-dims, split-half rotation
  (apply_multimodal_rotary_pos_emb).
- get_rope_index: vision spans get 3D (t, h, w) positions, text spans run
  sequentially from the running max (+1) (nexus_gen_ar_model.py:110-285).
- vision tower: 14x14x2 patch embed, 2D rotary over within-merge-block
  (h, w) ids, window-partition reordering with per-window segment attention
  (full attention at fullatt_block_indexes), RMS-normed blocks with biased
  qkv and gated SwiGLU, then a 2x2 patch merger MLP and inverse reorder.

TPU-first: the reference's varlen (cu_seqlens) attention becomes one dense
segment-masked attention — static shapes, single fused kernel.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class QwenVLTextConfig:
    hidden_size: int = 3584
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    intermediate_size: int = 18944
    vocab: int = 152064
    eps: float = 1e-6
    rope_theta: float = 1e6
    mrope_section: Tuple[int, ...] = (16, 24, 24)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class QwenVLVisionConfig:
    hidden_size: int = 1280
    depth: int = 32
    num_heads: int = 16
    intermediate_size: int = 3420
    patch_size: int = 14
    temporal_patch_size: int = 2
    in_channels: int = 3
    spatial_merge_size: int = 2
    out_hidden_size: int = 3584
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    rope_theta: float = 1e4
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return n.astype(x.dtype) * w


def _rotate_half(x):
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


# ---------------------------------------------------------------------------
# Text decoder
# ---------------------------------------------------------------------------

def mrope_tables(cfg: QwenVLTextConfig, position_ids: jnp.ndarray):
    """position_ids (3, B, S) -> cos/sin (B, S, head_dim) with the per-channel
    (t, h, w) section layout of apply_multimodal_rotary_pos_emb."""
    d2 = cfg.head_dim // 2
    inv_freq = 1.0 / cfg.rope_theta ** (np.arange(0, cfg.head_dim, 2) / cfg.head_dim)
    ang = position_ids[..., None].astype(jnp.float32) * inv_freq  # (3, B, S, d2)
    sec = np.concatenate([np.full(n, i) for i, n in enumerate(cfg.mrope_section)])
    onehot = jnp.asarray(np.eye(3)[sec].T[:, None, None, :])      # (3, 1, 1, d2)
    cos_h = (jnp.cos(ang) * onehot).sum(0)
    sin_h = (jnp.sin(ang) * onehot).sum(0)
    return (jnp.concatenate([cos_h, cos_h], -1),
            jnp.concatenate([sin_h, sin_h], -1))


def _text_block(p, x, mask_bias, cos, sin, cfg: QwenVLTextConfig):
    b, s, _ = x.shape
    n, nk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    h = _rms(x, p["norm1"]["w"], cfg.eps)
    q = _proj(p["q"], h).reshape(b, s, n, hd)
    k = _proj(p["k"], h).reshape(b, s, nk, hd)
    v = _proj(p["v"], h).reshape(b, s, nk, hd)
    c = cos[:, :, None, :].astype(jnp.float32)
    si = sin[:, :, None, :].astype(jnp.float32)
    q = (q.astype(jnp.float32) * c + _rotate_half(q.astype(jnp.float32)) * si).astype(x.dtype)
    k = (k.astype(jnp.float32) * c + _rotate_half(k.astype(jnp.float32)) * si).astype(x.dtype)
    k = jnp.repeat(k, n // nk, axis=2)
    v = jnp.repeat(v, n // nk, axis=2)
    logits = jnp.einsum("bqnc,bknc->bnqk", q, k) / math.sqrt(hd)
    logits = logits.astype(jnp.float32) + mask_bias[:, None]
    probs = jax.nn.softmax(logits, -1).astype(x.dtype)
    att = jnp.einsum("bnqk,bknc->bqnc", probs, v).reshape(b, s, n * hd)
    x = x + att @ p["o"]["w"]

    h = _rms(x, p["norm2"]["w"], cfg.eps)
    g = jax.nn.silu((h @ p["gate"]["w"]).astype(jnp.float32)).astype(x.dtype)
    x = x + ((g * (h @ p["up"]["w"])) @ p["down"]["w"])
    return x


def qwen_vl_text_forward(params: Dict, cfg: QwenVLTextConfig,
                         embeds: jnp.ndarray, attn_mask: jnp.ndarray,
                         position_ids: jnp.ndarray) -> jnp.ndarray:
    """embeds (B, S, H), attn_mask (B, S) 0/1 padding mask, position_ids
    (3, B, S) -> final-norm hidden states (B, S, H)."""
    b, s, _ = embeds.shape
    cos, sin = mrope_tables(cfg, position_ids)
    causal = jnp.tril(jnp.ones((s, s), bool))
    ok = causal[None] & (attn_mask[:, None, :] > 0)
    mask_bias = jnp.where(ok, 0.0, jnp.finfo(jnp.float32).min)
    x = embeds
    for i in range(cfg.num_layers):
        p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["blocks"])
        x = _text_block(p, x, mask_bias, cos, sin, cfg)
    return _rms(x, params["final_norm"]["w"], cfg.eps)


def get_rope_index(input_ids: np.ndarray, image_grid_thw: Sequence[Tuple[int, int, int]],
                   image_token_id: int, vision_start_token_id: int,
                   spatial_merge_size: int = 2,
                   tokens_per_second: int = 2) -> np.ndarray:
    """Host-side 3D position ids (3, B, S) (reference get_rope_index
    :110-285, image-only path, no padding)."""
    b, s = input_ids.shape
    out = np.zeros((3, b, s), np.int32)
    for bi in range(b):
        toks = input_ids[bi].tolist()
        pos_list = []
        st, img_idx = 0, 0
        while True:
            try:
                ed = toks.index(image_token_id, st)
            except ValueError:
                break
            text_len = ed - st
            st_idx = pos_list[-1].max() + 1 if pos_list else 0
            pos_list.append(np.tile(np.arange(text_len), (3, 1)) + st_idx)
            t, h, w = image_grid_thw[img_idx]
            gh, gw = h // spatial_merge_size, w // spatial_merge_size
            # images use second_per_grid_t=0 -> all temporal ids 0 (:215)
            t_idx = np.zeros(t * gh * gw, np.int64)
            h_idx = np.tile(np.repeat(np.arange(gh), gw), t)
            w_idx = np.tile(np.arange(gw), t * gh)
            pos_list.append(np.stack([t_idx, h_idx, w_idx]) + text_len + st_idx)
            st = ed + t * gh * gw
            img_idx += 1
        if st < len(toks):
            st_idx = pos_list[-1].max() + 1 if pos_list else 0
            pos_list.append(np.tile(np.arange(len(toks) - st), (3, 1)) + st_idx)
        out[:, bi] = np.concatenate(pos_list, axis=1)
    return out


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------

def vision_rot_tables(cfg: QwenVLVisionConfig,
                      grid_thw: Sequence[Tuple[int, int, int]]) -> np.ndarray:
    """Per-token (h, w) rotary angles, within-merge-block ordering
    (rot_pos_emb). Returns (S, head_dim // 2)."""
    m = cfg.spatial_merge_size
    parts = []
    for t, h, w in grid_thw:
        hp = np.arange(h)[:, None] * np.ones((1, w), np.int64)
        wp = np.ones((h, 1), np.int64) * np.arange(w)[None]
        reorder = lambda a: a.reshape(h // m, m, w // m, m) \
            .transpose(0, 2, 1, 3).reshape(-1)
        ids = np.stack([reorder(hp), reorder(wp)], axis=-1)
        parts.append(np.tile(ids, (t, 1)))
    ids = np.concatenate(parts, axis=0)          # (S, 2)
    d = cfg.head_dim // 2
    inv_freq = 1.0 / cfg.rope_theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
    freqs = ids[..., None].astype(np.float64) * inv_freq   # (S, 2, d//2)
    return freqs.reshape(ids.shape[0], -1).astype(np.float32)


def vision_window_index(cfg: QwenVLVisionConfig,
                        grid_thw: Sequence[Tuple[int, int, int]]):
    """(window_index over merge units, per-token window segment ids, per-token
    image segment ids) — host-side (get_window_index)."""
    m = cfg.spatial_merge_size
    unit = m * m
    vw = cfg.window_size // m // cfg.patch_size
    index_list, seg_sizes = [], []
    base = 0
    img_seg = []
    for n_img, (t, h, w) in enumerate(grid_thw):
        gh, gw = h // m, w // m
        idx = np.arange(t * gh * gw).reshape(t, gh, gw)
        pad_h, pad_w = (-gh) % vw, (-gw) % vw
        nh, nw = (gh + pad_h) // vw, (gw + pad_w) // vw
        padded = np.full((t, gh + pad_h, gw + pad_w), -100, np.int64)
        padded[:, :gh, :gw] = idx
        padded = padded.reshape(t, nh, vw, nw, vw).transpose(0, 1, 3, 2, 4) \
            .reshape(t, nh * nw, vw, vw)
        seqlens = (padded != -100).sum((2, 3)).reshape(-1)
        flat = padded.reshape(-1)
        keep = flat[flat != -100]
        index_list.append(keep + base)
        seg_sizes.extend([int(x) * unit for x in seqlens if x > 0])
        base += t * gh * gw
        img_seg.extend([n_img] * (t * gh * gw * unit))
    window_index = np.concatenate(index_list)
    win_seg = np.concatenate([np.full(n, i) for i, n in enumerate(seg_sizes)])
    return window_index, win_seg, np.asarray(img_seg, np.int64)


def _seg_attention(p, x, seg_ids, n_heads, eps):
    """Dense segment-masked attention over the (S, D) token list."""
    s, d = x.shape
    hd = d // n_heads
    qkv = x @ p["qkv"]["w"] + p["qkv"]["b"]
    q, k, v = jnp.split(qkv.reshape(s, 3, n_heads, hd).transpose(1, 0, 2, 3),
                        3, axis=0)
    q, k, v = q[0], k[0], v[0]
    cos, sin = p["_cos"], p["_sin"]
    c = cos[:, None, :].astype(jnp.float32)
    si = sin[:, None, :].astype(jnp.float32)
    q = (q.astype(jnp.float32) * c + _rotate_half(q.astype(jnp.float32)) * si).astype(x.dtype)
    k = (k.astype(jnp.float32) * c + _rotate_half(k.astype(jnp.float32)) * si).astype(x.dtype)
    logits = jnp.einsum("qnc,knc->nqk", q, k) / math.sqrt(hd)
    ok = seg_ids[:, None] == seg_ids[None, :]
    logits = jnp.where(ok[None], logits.astype(jnp.float32),
                       jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, -1).astype(x.dtype)
    att = jnp.einsum("nqk,knc->qnc", probs, v).reshape(s, d)
    return att @ p["proj"]["w"] + p["proj"]["b"]


def qwen_vl_vision_forward(params: Dict, cfg: QwenVLVisionConfig,
                           pixels: jnp.ndarray,
                           grid_thw: Sequence[Tuple[int, int, int]]) -> jnp.ndarray:
    """pixels (S, in_ch * tp * p * p) flattened patches (processor layout) ->
    merged features (S / merge^2, out_hidden)."""
    unit = cfg.spatial_merge_size ** 2
    x = pixels.astype(params["patch_embed"]["w"].dtype) @ params["patch_embed"]["w"]
    s = x.shape[0]

    rot = vision_rot_tables(cfg, tuple(grid_thw))
    widx, win_seg, img_seg = vision_window_index(cfg, tuple(grid_thw))
    perm = (widx[:, None] * unit + np.arange(unit)[None]).reshape(-1)
    x = x[jnp.asarray(perm)]
    rot = rot[perm]
    emb = np.concatenate([rot, rot], axis=-1)
    cos, sin = jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))
    img_seg_perm = jnp.asarray(img_seg[perm])
    win_seg = jnp.asarray(win_seg)

    for i in range(cfg.depth):
        p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["blocks"])
        p = dict(p, attn=dict(p["attn"], _cos=cos, _sin=sin))
        seg = img_seg_perm if i in cfg.fullatt_block_indexes else win_seg
        h = _rms(x, p["norm1"]["w"], cfg.eps)
        x = x + _seg_attention(p["attn"], h, seg, cfg.num_heads, cfg.eps)
        h = _rms(x, p["norm2"]["w"], cfg.eps)
        g = jax.nn.silu((h @ p["gate"]["w"] + p["gate"]["b"]).astype(jnp.float32)).astype(x.dtype)
        x = x + ((g * (h @ p["up"]["w"] + p["up"]["b"])) @ p["down"]["w"]
                 + p["down"]["b"])

    # merger: RMS norm then 2x2-unit MLP (Qwen2_5_VLPatchMerger)
    x = _rms(x, params["merger"]["ln_q"]["w"], cfg.eps)
    x = x.reshape(s // unit, unit * cfg.hidden_size)
    x = jax.nn.gelu(x @ params["merger"]["fc0"]["w"] + params["merger"]["fc0"]["b"],
                    approximate=False)
    x = x @ params["merger"]["fc2"]["w"] + params["merger"]["fc2"]["b"]
    inv = np.argsort(widx)
    return x[jnp.asarray(inv)]


# ---------------------------------------------------------------------------
# KV-cached decoding (for autoregressive generation, e.g. NexusGen image
# tokens — reference nexus_gen_ar_model.py:508-720 drives HF's cache; here
# the cache is two stacked arrays updated inside a jitted loop)
# ---------------------------------------------------------------------------

def _proj(p, h):
    """Linear with OPTIONAL bias: Qwen2 qkv carry biases, Llama (the Omost
    chat models run on this same stack) does not."""
    out = h @ p["w"]
    return out + p["b"] if "b" in p else out


def _block_qkv(p, x, cos, sin, cfg: QwenVLTextConfig):
    """Shared projection+rope piece: x (B, S, H) -> q (B,S,n,hd), k/v (B,S,nk,hd)."""
    b, s, _ = x.shape
    n, nk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    h = _rms(x, p["norm1"]["w"], cfg.eps)
    q = _proj(p["q"], h).reshape(b, s, n, hd)
    k = _proj(p["k"], h).reshape(b, s, nk, hd)
    v = _proj(p["v"], h).reshape(b, s, nk, hd)
    c = cos[:, :, None, :].astype(jnp.float32)
    si = sin[:, :, None, :].astype(jnp.float32)
    q = (q.astype(jnp.float32) * c + _rotate_half(q.astype(jnp.float32)) * si).astype(x.dtype)
    k = (k.astype(jnp.float32) * c + _rotate_half(k.astype(jnp.float32)) * si).astype(x.dtype)
    return q, k, v


def _block_finish(p, x, att, cfg: QwenVLTextConfig):
    x = x + att @ p["o"]["w"]
    h = _rms(x, p["norm2"]["w"], cfg.eps)
    g = jax.nn.silu((h @ p["gate"]["w"]).astype(jnp.float32)).astype(x.dtype)
    return x + ((g * (h @ p["up"]["w"])) @ p["down"]["w"])


def qwen_vl_text_prefill(params: Dict, cfg: QwenVLTextConfig,
                         embeds: jnp.ndarray, position_ids: jnp.ndarray,
                         cache_len: int):
    """Causal prefill returning (hidden (B,S,H), kcache, vcache), the caches
    (L, B, cache_len, nk, hd) holding the rope'd keys/values padded to
    cache_len for subsequent qwen_vl_text_decode_step calls."""
    b, s, _ = embeds.shape
    n, nk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    cos, sin = mrope_tables(cfg, position_ids)
    causal = jnp.tril(jnp.ones((s, s), bool))
    mask_bias = jnp.where(causal, 0.0, jnp.finfo(jnp.float32).min)[None, None]
    x = embeds
    ks, vs = [], []
    pad = cache_len - s
    for i in range(cfg.num_layers):
        p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["blocks"])
        q, k, v = _block_qkv(p, x, cos, sin, cfg)
        ks.append(jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))))
        vs.append(jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))))
        kr = jnp.repeat(k, n // nk, axis=2)
        vr = jnp.repeat(v, n // nk, axis=2)
        logits = jnp.einsum("bqnc,bknc->bnqk", q, kr) / math.sqrt(hd)
        probs = jax.nn.softmax(logits.astype(jnp.float32) + mask_bias,
                               -1).astype(x.dtype)
        att = jnp.einsum("bnqk,bknc->bqnc", probs, vr).reshape(b, s, n * hd)
        x = _block_finish(p, x, att, cfg)
    return (_rms(x, params["final_norm"]["w"], cfg.eps),
            jnp.stack(ks), jnp.stack(vs))


def qwen_vl_text_decode_step(params: Dict, cfg: QwenVLTextConfig,
                             emb: jnp.ndarray, cos: jnp.ndarray,
                             sin: jnp.ndarray, kcache: jnp.ndarray,
                             vcache: jnp.ndarray, pos):
    """One cached decode step: emb (B, 1, H) is the new token's input
    embedding sitting at sequence index `pos` (traced scalar); cos/sin are its
    (B, 1, head_dim) rope tables. Returns (hidden (B, 1, H), kcache, vcache)."""
    b = emb.shape[0]
    n, nk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    cache_len = kcache.shape[2]
    visible = jnp.arange(cache_len) <= pos
    bias = jnp.where(visible, 0.0, jnp.finfo(jnp.float32).min)[None, None, None]
    x = emb
    for i in range(cfg.num_layers):
        p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["blocks"])
        q, k, v = _block_qkv(p, x, cos, sin, cfg)
        kcache = kcache.at[i].set(jax.lax.dynamic_update_slice_in_dim(
            kcache[i], k, pos, axis=1))
        vcache = vcache.at[i].set(jax.lax.dynamic_update_slice_in_dim(
            vcache[i], v, pos, axis=1))
        kr = jnp.repeat(kcache[i], n // nk, axis=2)
        vr = jnp.repeat(vcache[i], n // nk, axis=2)
        logits = jnp.einsum("bqnc,bknc->bnqk", q, kr) / math.sqrt(hd)
        probs = jax.nn.softmax(logits.astype(jnp.float32) + bias,
                               -1).astype(x.dtype)
        att = jnp.einsum("bnqk,bknc->bqnc", probs, vr).reshape(b, 1, n * hd)
        x = _block_finish(p, x, att, cfg)
    return _rms(x, params["final_norm"]["w"], cfg.eps), kcache, vcache


def qwen_vl_text_generate(params: Dict, cfg: QwenVLTextConfig, input_ids,
                          max_new_tokens: int, eos_ids=(),
                          cache_len: int = 0):
    """Greedy KV-cached token generation — Qwen2ForCausalLM.generate with
    do_sample=False, the reference's prompt-refiner decode
    (prompt_refiners.py:94-101). input_ids (1, S) host ints; returns the list
    of generated token ids (stops at, and excludes, any id in eos_ids).

    Text-only positions: all three M-RoPE streams carry the same sequence
    index, which reduces exactly to standard 1D RoPE — so the VL text stack
    doubles as the plain Qwen2 LM. lm_head comes from params["lm_head"] when
    the checkpoint has one, else the tied word embedding (Qwen2-1.5B ties)."""
    ids = np.asarray(input_ids)
    b, s = ids.shape
    head_w = params["lm_head"]["w"] if "lm_head" in params \
        else params["wte"].T
    wte = jnp.asarray(params["wte"])
    cache_len = cache_len or s + max_new_tokens
    pos = jnp.broadcast_to(jnp.arange(s)[None, None],
                           (3, b, s)).astype(jnp.int32)
    hidden, kc, vc = qwen_vl_text_prefill(params, cfg, wte[ids], pos,
                                          cache_len)
    first = int(jnp.argmax(hidden[:, -1] @ head_w, -1)[0])

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def step(p_, tok, kcache, vcache, pidx):
        posi = jnp.full((3, b, 1), pidx, jnp.int32)
        cos, sin = mrope_tables(cfg, posi)
        e = jnp.asarray(p_["wte"])[tok][:, None]
        hh, kcache, vcache = qwen_vl_text_decode_step(
            p_, cfg, e, cos, sin, kcache, vcache, pidx)
        hw = p_["lm_head"]["w"] if "lm_head" in p_ else p_["wte"].T
        return jnp.argmax(hh[:, 0] @ hw, -1), kcache, vcache

    toks = [first]
    cur = jnp.asarray([first] * b)
    for i in range(max_new_tokens - 1):
        if toks[-1] in eos_ids:
            break
        cur, kc, vc = step(params, cur, kc, vc, s + i)
        toks.append(int(cur[0]))
    if toks and toks[-1] in eos_ids:
        toks.pop()
    return toks


def init_qwen_vl_text(key, cfg: QwenVLTextConfig, dtype=jnp.float32) -> Dict:
    """Random stacked-block text params in the converter's layout (tests/init)."""
    n, nk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    d = cfg.hidden_size
    ks = iter(jax.random.split(key, 9 * cfg.num_layers + 1))
    rnd = lambda *s: jax.random.normal(next(ks), s, dtype) * 0.02

    def block():
        return {
            "norm1": {"w": jnp.ones((d,), dtype)},
            "norm2": {"w": jnp.ones((d,), dtype)},
            "q": {"w": rnd(d, n * hd), "b": jnp.zeros((n * hd,), dtype)},
            "k": {"w": rnd(d, nk * hd), "b": jnp.zeros((nk * hd,), dtype)},
            "v": {"w": rnd(d, nk * hd), "b": jnp.zeros((nk * hd,), dtype)},
            "o": {"w": rnd(n * hd, d)},
            "gate": {"w": rnd(d, cfg.intermediate_size)},
            "up": {"w": rnd(d, cfg.intermediate_size)},
            "down": {"w": rnd(cfg.intermediate_size, d)},
        }

    blocks = [block() for _ in range(cfg.num_layers)]
    return {"blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
            "final_norm": {"w": jnp.ones((d,), dtype)}}


# ---------------------------------------------------------------------------
# Full model helpers
# ---------------------------------------------------------------------------

def qwen_vl_embed(params: Dict, cfg: QwenVLTextConfig, input_ids: jnp.ndarray,
                  image_embeds: Optional[jnp.ndarray],
                  image_token_id: int) -> jnp.ndarray:
    """Token embeddings with image features scattered over image tokens
    (reference nexus_gen_ar_model.py:357-377)."""
    emb = jnp.asarray(params["wte"])[input_ids]
    if image_embeds is not None:
        mask = (input_ids == image_token_id).reshape(-1)
        idx = jnp.cumsum(mask) - 1
        flat = emb.reshape(-1, emb.shape[-1])
        flat = jnp.where(mask[:, None],
                         image_embeds.astype(emb.dtype)[jnp.clip(idx, 0)],
                         flat)
        emb = flat.reshape(emb.shape)
    return emb


# ---------------------------------------------------------------------------
# Converters (HF naming)
# ---------------------------------------------------------------------------

def _lin(sd, pre, bias=True):
    p = {"w": jnp.asarray(np.asarray(sd[pre + ".weight"]).T)}
    if bias and pre + ".bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[pre + ".bias"]))
    return p


def qwen_vl_text_params_from_torch(sd, cfg: QwenVLTextConfig,
                                   prefix: str = "model.") -> Dict:
    g = lambda k: jnp.asarray(np.asarray(sd[prefix + k]))

    def block(i):
        pre = f"{prefix}layers.{i}"
        return {
            "norm1": {"w": g(f"layers.{i}.input_layernorm.weight")},
            "norm2": {"w": g(f"layers.{i}.post_attention_layernorm.weight")},
            "q": _lin(sd, pre + ".self_attn.q_proj"),
            "k": _lin(sd, pre + ".self_attn.k_proj"),
            "v": _lin(sd, pre + ".self_attn.v_proj"),
            "o": _lin(sd, pre + ".self_attn.o_proj", bias=False),
            "gate": _lin(sd, pre + ".mlp.gate_proj", bias=False),
            "up": _lin(sd, pre + ".mlp.up_proj", bias=False),
            "down": _lin(sd, pre + ".mlp.down_proj", bias=False),
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    out = {
        "wte": g("embed_tokens.weight"),
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        "final_norm": {"w": g("norm.weight")},
    }
    # untied LM head (lm_head sits OUTSIDE the `model.` prefix); absent for
    # tied checkpoints (Qwen2-1.5B) — generate falls back to wte.T
    if "lm_head.weight" in sd:
        out["lm_head"] = {"w": jnp.asarray(np.asarray(sd["lm_head.weight"]).T)}
    return out


def qwen_vl_vision_params_from_torch(sd, cfg: QwenVLVisionConfig,
                                     prefix: str = "visual.") -> Dict:
    g = lambda k: jnp.asarray(np.asarray(sd[prefix + k]))

    def block(i):
        pre = f"{prefix}blocks.{i}"
        return {
            "norm1": {"w": g(f"blocks.{i}.norm1.weight")},
            "norm2": {"w": g(f"blocks.{i}.norm2.weight")},
            "attn": {"qkv": _lin(sd, pre + ".attn.qkv"),
                     "proj": _lin(sd, pre + ".attn.proj")},
            "gate": _lin(sd, pre + ".mlp.gate_proj"),
            "up": _lin(sd, pre + ".mlp.up_proj"),
            "down": _lin(sd, pre + ".mlp.down_proj"),
        }

    pw = np.asarray(sd[prefix + "patch_embed.proj.weight"])  # (D, C, tp, p, p)
    blocks = [block(i) for i in range(cfg.depth)]
    return {
        "patch_embed": {"w": jnp.asarray(pw.reshape(pw.shape[0], -1).T)},
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        "merger": {
            "ln_q": {"w": g("merger.ln_q.weight")},
            "fc0": _lin(sd, prefix + "merger.mlp.0"),
            "fc2": _lin(sd, prefix + "merger.mlp.2"),
        },
    }


# ---------------------------------------------------------------------------
# Host-side image preprocessing (HF Qwen2VLImageProcessor parity)
# ---------------------------------------------------------------------------

_QWEN_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
_QWEN_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280):
    """Target (h, w): multiples of `factor`, aspect preserved, pixel count in
    [min_pixels, max_pixels] (HF qwen2_vl image_processing smart_resize)."""
    import math

    if max(height, width) / min(height, width) > 200:
        raise ValueError("absolute aspect ratio must be smaller than 200")
    h_bar = max(factor, round(height / factor) * factor)
    w_bar = max(factor, round(width / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def preprocess_image_for_vision(image01: np.ndarray, cfg: QwenVLVisionConfig,
                                min_pixels: int = 56 * 56,
                                max_pixels: int = 14 * 14 * 4 * 1280):
    """(H, W, 3) float [0,1] -> (n_patches, C*T*P*P) pixel patches + grid_thw.

    Mirrors HF Qwen2VLImageProcessor._preprocess: smart-resize (bicubic) to
    multiples of patch*merge, CLIP-normalize, duplicate the frame to
    temporal_patch_size, then the (t, h//m, w//m, m, C, T, P, P) patch layout."""
    from PIL import Image

    p, m, t = cfg.patch_size, cfg.spatial_merge_size, cfg.temporal_patch_size
    h0, w0 = image01.shape[:2]
    h, w = smart_resize(h0, w0, factor=p * m, min_pixels=min_pixels,
                        max_pixels=max_pixels)
    pil = Image.fromarray((np.clip(image01, 0, 1) * 255).astype(np.uint8))
    arr = np.asarray(pil.resize((w, h), Image.BICUBIC), np.float32) / 255.0
    arr = (arr - np.asarray(_QWEN_IMAGE_MEAN)) / np.asarray(_QWEN_IMAGE_STD)
    arr = arr.transpose(2, 0, 1)[None]                     # (1, C, H, W)
    arr = np.repeat(arr, t, axis=0)                        # (T, C, H, W)
    gh, gw = h // p, w // p
    patches = arr.reshape(1, t, 3, gh // m, m, p, gw // m, m, p)
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return (patches.reshape(gh * gw, 3 * t * p * p).astype(np.float32),
            (1, gh, gw))
