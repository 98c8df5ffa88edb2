"""HunyuanVideo MMDiT as pure functions over a param pytree.

Architecture parity with /root/reference/diffsynth/models/hunyuan_video_dit.py:
HunyuanVideoRope (:10-195 — 3-axis rope over (T, H/2, W/2) ids with theta=256 and
dims (16, 56, 56)), SingleTokenRefiner (:242-273 — llama-embedding refiner with a
mask-aware mean conditioning vector), MMDoubleStreamBlock (:403-475),
MMSingleStreamBlock (:518-571), FinalLayer (:573-586), HunyuanVideoDiT.forward
(:631-676).

Faithfully reproduced quirk: attention is NOT fully joint — the reference
pipeline (`lets_dance_hunyuan_video`, pipelines/hunyuan_video.py:327-333) splits
the sequence at split_token = text_mask.sum() valid text tokens and runs TWO
block-diagonal attentions: [image + valid txt] and [padding txt] (:462-475,
:537-570). Here that varlen split is ONE joint attention with a traced
per-batch kv_len (see _joint_attention) — static shapes, no recompiles. The
text length after the refiner is fixed at 256 (:669-672).

TPU-first: the 20 double and 40 single blocks are stacked and scanned; the rope
tables are host-built f32 (S, head_dim/2) cos/sin applied with ops/rope.apply_rope
(the reference's repeat_interleave(2) tables are the pair-expanded form of the
same angles).
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.wan_dit import gelu_tanh, layer_norm, linear, rms_norm
from goal_force_tpu.ops.attention import attention
from goal_force_tpu.ops.rope import apply_rope
from goal_force_tpu.parallel.mesh import constrain


@dataclasses.dataclass(frozen=True)
class HunyuanVideoDiTConfig:
    """Defaults mirror HunyuanVideoDiT.__init__ (:589-614)."""

    dim: int = 3072
    num_heads: int = 24
    num_double_blocks: int = 20
    num_single_blocks: int = 40
    in_channels: int = 16
    text_dim: int = 4096
    pooled_dim: int = 768
    guidance_embed: bool = True
    freq_dim: int = 256
    rope_dims: Tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 256.0
    txt_len: int = 256
    refiner_depth: int = 2
    patch: Tuple[int, int, int] = (1, 2, 2)
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


@lru_cache(maxsize=8)
def hunyuan_rope_tables(t: int, gh: int, gw: int, rope_dims: Tuple[int, ...],
                        theta: float):
    """(S, head_dim//2) cos/sin over the (t, h, w) grid, row-major
    (reference get_nd_rotary_pos_embed :118-189 with use_real=True)."""
    grids = np.meshgrid(np.arange(t), np.arange(gh), np.arange(gw), indexing="ij")
    parts_cos, parts_sin = [], []
    for i, d in enumerate(rope_dims):
        freqs = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        ang = np.outer(grids[i].reshape(-1).astype(np.float64), freqs)
        parts_cos.append(np.cos(ang))
        parts_sin.append(np.sin(ang))
    return (np.concatenate(parts_cos, -1).astype(np.float32),
            np.concatenate(parts_sin, -1).astype(np.float32))


# ---------------------------------------------------------------------------
# Token refiner (text input)
# ---------------------------------------------------------------------------

def _mlp(p, x, act=jax.nn.silu):
    h = linear(p["fc0"], x)
    return linear(p["fc2"], act(h.astype(jnp.float32)).astype(h.dtype))


def token_refiner(params, cfg: HunyuanVideoDiTConfig, text_emb, timestep, mask):
    """SingleTokenRefiner.forward (:254-273). text_emb: (B, L, text_dim);
    mask: (B, L) 1/0. Returns (B, L, dim)."""
    from goal_force_tpu.models.sd_unet import timestep_embedding

    dtype = params["input_emb"]["w"].dtype
    t_vec = _mlp(params["t_emb"],
                 timestep_embedding(timestep, cfg.freq_dim).astype(dtype))
    mf = mask.astype(jnp.float32)[..., None]
    # clamp: an all-masked row (empty prompt) must not poison the batch (0/0)
    pooled = (text_emb.astype(jnp.float32) * mf).sum(1) \
        / jnp.maximum(mf.sum(1), 1.0)
    c = t_vec + _mlp(params["c_emb"], pooled.astype(dtype))

    x = linear(params["input_emb"], text_emb.astype(dtype))
    # attn mask: tokens attend within the valid set; first column forced on (:265-269)
    m = mask.astype(bool)
    attn_ok = m[:, None, :, None] & m[:, None, None, :]
    attn_ok = attn_ok.at[:, :, :, 0].set(True)
    bias = jnp.where(attn_ok, 0.0, jnp.finfo(jnp.float32).min)

    def body(x, p):
        gates = linear(p["ada"], jax.nn.silu(c.astype(jnp.float32)).astype(c.dtype))
        g_msa, g_mlp = jnp.split(gates, 2, axis=-1)
        h = layer_norm(x, cfg.eps, p["norm1"]["scale"], p["norm1"]["bias"])
        b, l, _ = h.shape
        q, k, v = jnp.split(linear(p["qkv"], h), 3, axis=-1)
        n = cfg.num_heads
        q = q.reshape(b, l, n, -1)
        k = k.reshape(b, l, n, -1)
        v = v.reshape(b, l, n, -1)
        logits = jnp.einsum("bqnc,bknc->bnqk", q, k) / math.sqrt(q.shape[-1])
        probs = jax.nn.softmax(logits.astype(jnp.float32) + bias, -1).astype(x.dtype)
        att = jnp.einsum("bnqk,bknc->bqnc", probs, v).reshape(b, l, -1)
        x = x + linear(p["proj"], att) * g_msa[:, None, :]
        h = layer_norm(x, cfg.eps, p["norm2"]["scale"], p["norm2"]["bias"])
        return x + _mlp(p["mlp"], h) * g_mlp[:, None, :], None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return x


# ---------------------------------------------------------------------------
# Stream blocks
# ---------------------------------------------------------------------------

def _mod(p, vec, n):
    e = linear(p, jax.nn.silu(vec.astype(jnp.float32)).astype(vec.dtype))
    return jnp.split(e, n, axis=-1)


def _tok(m, m_tr, tr_mask):
    """Per-token modulation select for HunyuanVideo-I2V token replace
    (reference hunyuan_video_dit.py:285-291,394-398): the first-frame image
    tokens take the t=0 modulation m_tr, everything else the normal m."""
    if m_tr is None:
        return m[:, None]
    return jnp.where(tr_mask, m_tr[:, None], m[:, None])


def _tr_mask(s: int, tr_token: int):
    return (jnp.arange(s) < tr_token)[None, :, None]


def _qkv_norm_rope(p, x, cfg, cos=None, sin=None):
    b, s, _ = x.shape
    n = cfg.num_heads
    q, k, v = jnp.split(linear(p["qkv"], x), 3, axis=-1)
    q = rms_norm(q.reshape(b, s, n, -1), p["norm_q"]["w"], cfg.eps)
    k = rms_norm(k.reshape(b, s, n, -1), p["norm_k"]["w"], cfg.eps)
    v = v.reshape(b, s, n, -1)
    if cos is not None:
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    return q, k, v


def _joint_attention(q_img, k_img, v_img, q_txt, k_txt, v_txt, cfg, attn_impl,
                     kv_valid):
    """The reference pipeline runs varlen attention over [img ++ txt[:n_valid]]
    (`lets_dance_hunyuan_video` passes split_token=text_mask.sum(),
    hunyuan_video.py:327-333, consumed at hunyuan_video_dit.py:462-475): only
    the VALID text prefix joins the image group; padding tokens attend apart.
    TPU-native form: ONE joint attention over [img ++ txt] with a traced
    per-batch kv_len = s_img + n_valid — padding keys are masked inside the
    flash kernel (no dynamic shapes, no recompile per prompt length). Padding
    ROWS get attention over the valid keys instead of the reference's
    padding-only group, but their outputs never reach valid positions (padding
    keys stay masked in every block) and the head discards the text stream."""
    b, s_img = q_img.shape[0], q_img.shape[1]
    q = jnp.concatenate([q_img, q_txt], axis=1)
    k = jnp.concatenate([k_img, k_txt], axis=1)
    v = jnp.concatenate([v_img, v_txt], axis=1)
    q = constrain(q, "dp", None, "sp", "tp")
    k = constrain(k, "dp", None, "sp", "tp")
    v = constrain(v, "dp", None, "sp", "tp")
    # per-head qk-RMS-norm (RMSNorm(head_dim), :488-489) provably bounds the
    # logits -> static max-free kernel dispatch
    out = attention(q, k, v, impl=attn_impl, kv_len=kv_valid, bounded=True)
    # keep head sharding until the o-projection (see wan_dit.self_attention)
    out = constrain(out, "dp", None, "sp", "tp").reshape(b, -1, cfg.dim)
    return out[:, :s_img], out[:, s_img:]


def double_block(p, img, txt, vec, cos, sin, cfg, attn_impl="auto",
                 kv_valid=None, vec_tr=None, tr_token=None):
    """MMDoubleStreamBlock.forward (:462-475); vec_tr/tr_token: I2V token
    replace on the image stream only (:423-452)."""
    sa1, sc1, g1a, sa2, sc2, g2a = _mod(p["a"]["mod"], vec, 6)
    sb1, scb1, g1b, sb2, scb2, g2b = _mod(p["b"]["mod"], vec, 6)
    if vec_tr is not None:
        ta1, tc1, tg1, ta2, tc2, tg2 = _mod(p["a"]["mod"], vec_tr, 6)
        mk = _tr_mask(img.shape[1], tr_token)
    else:
        ta1 = tc1 = tg1 = ta2 = tc2 = tg2 = None
        mk = None
    h_img = layer_norm(img, cfg.eps) * (1 + _tok(sc1, tc1, mk)) \
        + _tok(sa1, ta1, mk)
    h_txt = layer_norm(txt, cfg.eps) * (1 + scb1[:, None]) + sb1[:, None]
    qi, ki, vi = _qkv_norm_rope(p["a"], h_img, cfg, cos, sin)
    qt, kt, vt = _qkv_norm_rope(p["b"], h_txt, cfg)
    att_img, att_txt = _joint_attention(qi, ki, vi, qt, kt, vt, cfg, attn_impl,
                                        kv_valid)

    img = img + linear(p["a"]["out"], att_img) * _tok(g1a, tg1, mk)
    h = layer_norm(img, cfg.eps) * (1 + _tok(sc2, tc2, mk)) + _tok(sa2, ta2, mk)
    img = img + _mlp_gelu(p["a"]["ff"], h) * _tok(g2a, tg2, mk)

    txt = txt + linear(p["b"]["out"], att_txt) * g1b[:, None]
    h = layer_norm(txt, cfg.eps) * (1 + scb2[:, None]) + sb2[:, None]
    txt = txt + _mlp_gelu(p["b"]["ff"], h) * g2b[:, None]
    return img, txt


def _mlp_gelu(p, x):
    return linear(p["fc2"], gelu_tanh(linear(p["fc0"], x)))


def single_block(p, x, vec, cos, sin, cfg, attn_impl="auto", kv_valid=None,
                 vec_tr=None, tr_token=None, txt_len=None):
    """MMSingleStreamBlock.forward (:537-570): parallel attention + MLP on the
    same modulated input; rope on the image segment only; varlen joint
    attention (see _joint_attention). vec_tr/tr_token: I2V token replace on
    the first-frame image tokens (:537-569). txt_len: actual text-token count
    in x (i2v prompts carry image tokens beyond cfg.txt_len)."""
    shift, scale, gate = _mod(p["mod"], vec, 3)
    if vec_tr is not None:
        tsh, tsc, tga = _mod(p["mod"], vec_tr, 3)
        mk = _tr_mask(x.shape[1], tr_token)
        shift = _tok(shift, tsh, mk)
        scale = _tok(scale, tsc, mk)
        gate = _tok(gate, tga, mk)
    else:
        shift, scale, gate = shift[:, None], scale[:, None], gate[:, None]
    h = layer_norm(x, cfg.eps) * (1 + scale) + shift
    b, s, _ = x.shape
    n = cfg.num_heads
    tl = cfg.txt_len if txt_len is None else txt_len
    q, k, v = jnp.split(linear(p["qkv"], h), 3, axis=-1)
    q = rms_norm(q.reshape(b, s, n, -1), p["norm_q"]["w"], cfg.eps)
    k = rms_norm(k.reshape(b, s, n, -1), p["norm_k"]["w"], cfg.eps)
    v = v.reshape(b, s, n, -1)
    q = q.at[:, :-tl].set(apply_rope(q[:, :-tl], cos, sin))
    k = k.at[:, :-tl].set(apply_rope(k[:, :-tl], cos, sin))
    q = constrain(q, "dp", None, "sp", "tp")
    k = constrain(k, "dp", None, "sp", "tp")
    v = constrain(v, "dp", None, "sp", "tp")
    out = attention(q, k, v, impl=attn_impl, kv_len=kv_valid, bounded=True)
    att = constrain(out, "dp", None, "sp", "tp").reshape(b, s, cfg.dim)

    x = x + linear(p["out"], att) * gate
    ff = gelu_tanh(linear(p["ff_fc0"], h)) @ p["ff_fc2"]["w"]  # bias-free (:534)
    return x + ff * gate


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------

def patchify3d(x, patch):
    """(B, T, H, W, C) -> (B, S, C*prod(patch)) with (c, pt, ph, pw) feature
    order (Conv3d kernel layout, :196-204)."""
    pt, ph, pw = patch
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // pt, pt, h // ph, ph, w // pw, pw, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, (t // pt) * (h // ph) * (w // pw), c * pt * ph * pw)


def hunyuan_video_dit_forward(
    params: Dict,
    cfg: HunyuanVideoDiTConfig,
    latents: jnp.ndarray,          # (B, T, H, W, 16) NTHWC
    timestep: jnp.ndarray,         # (B,)
    prompt_emb: jnp.ndarray,       # (B, L, text_dim) LLM hidden states
    text_mask: jnp.ndarray,        # (B, L)
    pooled_prompt_emb: jnp.ndarray,  # (B, 768) CLIP pooled
    guidance: Optional[jnp.ndarray] = None,
    remat: bool = False,
    attn_impl: str = "auto",
    token_replace: bool = False,
) -> jnp.ndarray:
    """HunyuanVideoDiT.forward (:631-676). Returns (B, T, H, W, 16).

    token_replace: HunyuanVideo-I2V — the first latent frame holds the clean
    conditioning image, so its tokens are modulated with the t=0 conditioning
    vector (reference lets_dance_hunyuan_video_i2v, hunyuan_video.py:343-396:
    token_replace_vec = time_in(0) + vector_in(pooled), tr_token = gh*gw)."""
    pre = hunyuan_video_prelude(params, cfg, latents, timestep, prompt_emb,
                                text_mask, pooled_prompt_emb, guidance,
                                token_replace=token_replace)
    img = hunyuan_video_trunk(params, cfg, pre, remat=remat,
                              attn_impl=attn_impl)
    return hunyuan_video_head(params, cfg, img, pre["vec"],
                              latents.shape)


def hunyuan_video_prelude(params, cfg, latents, timestep, prompt_emb,
                          text_mask, pooled_prompt_emb, guidance=None,
                          token_replace: bool = False) -> Dict:
    """Everything before the block stacks (embeds, token streams, rope):
    cheap enough to run every step even when TeaCache skips the trunk."""
    from goal_force_tpu.models.sd_unet import timestep_embedding

    b, t, h, w, _ = latents.shape
    gh, gw = h // 2, w // 2
    dtype = params["final"]["linear"]["w"].dtype
    t_vec = _mlp(params["time_in"],
                 timestep_embedding(timestep, cfg.freq_dim).astype(dtype))
    p_vec = _mlp(params["vector_in"], pooled_prompt_emb.astype(dtype))
    vec = t_vec + p_vec
    vec_tr, tr_token = None, None
    if token_replace:
        vec_tr = _mlp(params["time_in"],
                      timestep_embedding(jnp.zeros_like(timestep),
                                         cfg.freq_dim).astype(dtype)) + p_vec
        tr_token = gh * gw
    if cfg.guidance_embed and guidance is not None:
        vec = vec + _mlp(params["guidance_in"],
                         timestep_embedding(guidance * 1000.0,
                                            cfg.freq_dim).astype(dtype))
    img = linear(params["img_in"], patchify3d(latents, cfg.patch))
    txt = token_refiner(params["txt_in"], cfg, prompt_emb, timestep, text_mask)

    cos_np, sin_np = hunyuan_rope_tables(t, gh, gw, tuple(cfg.rope_dims),
                                         cfg.rope_theta)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    # valid-key count for the varlen joint attention: image tokens + the VALID
    # text prefix (lets_dance_hunyuan_video's split_token=text_mask.sum())
    kv_valid = img.shape[1] + jnp.sum(text_mask.astype(jnp.int32), axis=1)
    return {"vec": vec, "vec_tr": vec_tr, "tr_token": tr_token, "img": img,
            "txt": txt, "cos": cos, "sin": sin, "kv_valid": kv_valid}


def hunyuan_video_trunk(params, cfg, pre: Dict, remat: bool = False,
                        attn_impl: str = "auto") -> jnp.ndarray:
    """The double+single block stacks: img tokens in, img tokens out."""
    vec, vec_tr, tr_token = pre["vec"], pre["vec_tr"], pre["tr_token"]
    cos, sin, kv_valid = pre["cos"], pre["sin"], pre["kv_valid"]

    def dbody(carry, p):
        i, x = carry
        i = constrain(i, "dp", "sp", None)
        return double_block(p, i, x, vec, cos, sin, cfg, attn_impl,
                            kv_valid=kv_valid, vec_tr=vec_tr,
                            tr_token=tr_token), None

    tl = pre["txt"].shape[1]

    def sbody(carry, p):
        carry = constrain(carry, "dp", "sp", None)
        return single_block(p, carry, vec, cos, sin, cfg, attn_impl,
                            kv_valid=kv_valid, vec_tr=vec_tr,
                            tr_token=tr_token, txt_len=tl), None

    if remat:
        dbody = jax.checkpoint(dbody, prevent_cse=False)
        sbody = jax.checkpoint(sbody, prevent_cse=False)

    (img, txt), _ = jax.lax.scan(dbody, (pre["img"], pre["txt"]),
                                 params["double_blocks"])
    x = jnp.concatenate([img, txt], axis=1)
    x, _ = jax.lax.scan(sbody, x, params["single_blocks"])
    return x[:, :-tl]


def hunyuan_video_head(params, cfg, img, vec, out_shape) -> jnp.ndarray:
    """Final adaLN + linear + unpatchify (:640-642)."""
    b, t, h, w, _ = out_shape
    gh, gw = h // 2, w // 2
    shift, scale = _mod(params["final"]["ada"], vec, 2)
    img = layer_norm(img, cfg.eps) * (1 + scale[:, None]) + shift[:, None]
    img = linear(params["final"]["linear"], img)
    # unpatchify "(C pT pH pW)" channel-major (:640-642)
    pt, ph, pw = cfg.patch
    img = img.reshape(b, t // pt, gh, gw, cfg.in_channels, pt, ph, pw)
    img = img.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return img.reshape(b, t, h, w, cfg.in_channels)


def hunyuan_video_teacache_signal(params, cfg, img, vec) -> jnp.ndarray:
    """The TeaCache drift signal: double_blocks[0].component_a's first
    modulated input (reference hunyuan_video.py TeaCache.check :261-266)."""
    block0 = jax.tree_util.tree_map(lambda a: a[0],
                                    params["double_blocks"])
    sa1, sc1 = _mod(block0["a"]["mod"], vec, 6)[:2]
    return layer_norm(img, cfg.eps) * (1 + sc1[:, None]) + sa1[:, None]


# ---------------------------------------------------------------------------
# Init + converter
# ---------------------------------------------------------------------------

def _lin_init(key, d_in, d_out, dtype, bias=True):
    s = 1.0 / math.sqrt(d_in)
    p = {"w": jax.random.uniform(key, (d_in, d_out), dtype, -s, s)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _init_component(key, cfg, dtype):
    d = cfg.dim
    ks = jax.random.split(key, 5)
    return {
        "mod": _lin_init(ks[0], d, 6 * d, dtype),
        "qkv": _lin_init(ks[1], d, 3 * d, dtype),
        "norm_q": {"w": jnp.ones((cfg.head_dim,), dtype)},
        "norm_k": {"w": jnp.ones((cfg.head_dim,), dtype)},
        "out": _lin_init(ks[2], d, d, dtype),
        "ff": {"fc0": _lin_init(ks[3], d, 4 * d, dtype),
               "fc2": _lin_init(ks[4], 4 * d, d, dtype)},
    }


def init_hunyuan_video_dit(key, cfg: HunyuanVideoDiTConfig,
                           dtype=jnp.bfloat16) -> Dict:
    d = cfg.dim
    ks = jax.random.split(key, 12)

    def refiner_block(k):
        kk = jax.random.split(k, 5)
        return {
            "norm1": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "qkv": _lin_init(kk[0], d, 3 * d, dtype),
            "proj": _lin_init(kk[1], d, d, dtype),
            "norm2": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "mlp": {"fc0": _lin_init(kk[2], d, 4 * d, dtype),
                    "fc2": _lin_init(kk[3], 4 * d, d, dtype)},
            "ada": _lin_init(kk[4], d, 2 * d, dtype),
        }

    stack = lambda bs: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *bs)
    params = {
        "img_in": _lin_init(ks[0], cfg.in_channels * math.prod(cfg.patch), d, dtype),
        "txt_in": {
            "input_emb": _lin_init(ks[1], cfg.text_dim, d, dtype),
            "t_emb": {"fc0": _lin_init(ks[2], cfg.freq_dim, d, dtype),
                      "fc2": _lin_init(ks[2], d, d, dtype)},
            "c_emb": {"fc0": _lin_init(ks[3], cfg.text_dim, d, dtype),
                      "fc2": _lin_init(ks[3], d, d, dtype)},
            "blocks": stack([refiner_block(k)
                             for k in jax.random.split(ks[4], cfg.refiner_depth)]),
        },
        "time_in": {"fc0": _lin_init(ks[5], cfg.freq_dim, d, dtype),
                    "fc2": _lin_init(ks[5], d, d, dtype)},
        "vector_in": {"fc0": _lin_init(ks[6], cfg.pooled_dim, d, dtype),
                      "fc2": _lin_init(ks[6], d, d, dtype)},
        "double_blocks": stack([
            {"a": _init_component(k, cfg, dtype), "b": _init_component(k, cfg, dtype)}
            for k in jax.random.split(ks[7], cfg.num_double_blocks)]),
        "single_blocks": stack([
            {
                "mod": _lin_init(jax.random.split(k, 5)[0], d, 3 * d, dtype),
                "qkv": _lin_init(jax.random.split(k, 5)[1], d, 3 * d, dtype),
                "norm_q": {"w": jnp.ones((cfg.head_dim,), dtype)},
                "norm_k": {"w": jnp.ones((cfg.head_dim,), dtype)},
                "out": _lin_init(jax.random.split(k, 5)[2], d, d, dtype),
                "ff_fc0": _lin_init(jax.random.split(k, 5)[3], d, 4 * d, dtype),
                "ff_fc2": _lin_init(jax.random.split(k, 5)[4], 4 * d, d, dtype,
                                    bias=False),
            }
            for k in jax.random.split(ks[8], cfg.num_single_blocks)]),
        "final": {
            "linear": _lin_init(ks[9], d, cfg.in_channels * math.prod(cfg.patch),
                                dtype),
            "ada": _lin_init(ks[10], d, 2 * d, dtype),
        },
    }
    if cfg.guidance_embed:
        params["guidance_in"] = {"fc0": _lin_init(ks[11], cfg.freq_dim, d, dtype),
                                 "fc2": _lin_init(ks[11], d, d, dtype)}
    return params


def hunyuan_video_dit_params_from_torch(sd, cfg: HunyuanVideoDiTConfig) -> Dict:
    """Reference module state-dict naming (hunyuan_video_dit.py class attrs)."""
    g = lambda k: np.asarray(sd[k])
    lin = lambda p, bias=True: (
        {"w": g(p + ".weight").T, "b": g(p + ".bias")} if bias
        else {"w": g(p + ".weight").T})
    mlp01 = lambda p: {"fc0": lin(p + ".0"), "fc2": lin(p + ".2")}
    temb = lambda p: {"fc0": lin(p + ".timestep_embedder.0"),
                      "fc2": lin(p + ".timestep_embedder.2")}

    def component(pre):
        return {
            "mod": lin(pre + ".mod.linear"),
            "qkv": lin(pre + ".to_qkv"),
            "norm_q": {"w": g(pre + ".norm_q.weight")},
            "norm_k": {"w": g(pre + ".norm_k.weight")},
            "out": lin(pre + ".to_out"),
            "ff": {"fc0": lin(pre + ".ff.0"), "fc2": lin(pre + ".ff.2")},
        }

    def refiner_block(i):
        pre = f"txt_in.blocks.{i}"
        return {
            "norm1": {"scale": g(pre + ".norm1.weight"), "bias": g(pre + ".norm1.bias")},
            "qkv": lin(pre + ".self_attn_qkv"),
            "proj": lin(pre + ".self_attn_proj"),
            "norm2": {"scale": g(pre + ".norm2.weight"), "bias": g(pre + ".norm2.bias")},
            "mlp": {"fc0": lin(pre + ".mlp.0"), "fc2": lin(pre + ".mlp.2")},
            "ada": lin(pre + ".adaLN_modulation.1"),
        }

    def single(i):
        pre = f"single_blocks.{i}"
        return {
            "mod": lin(pre + ".mod.linear"),
            "qkv": lin(pre + ".to_qkv"),
            "norm_q": {"w": g(pre + ".norm_q.weight")},
            "norm_k": {"w": g(pre + ".norm_k.weight")},
            "out": lin(pre + ".to_out"),
            "ff_fc0": lin(pre + ".ff.0"),
            "ff_fc2": lin(pre + ".ff.2", bias=False),
        }

    stack = lambda bs: jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *bs)
    img_w = g("img_in.proj.weight")   # (D, C, pt, ph, pw)
    d = img_w.shape[0]
    params = {
        "img_in": {"w": img_w.reshape(d, -1).T, "b": g("img_in.proj.bias")},
        "txt_in": {
            "input_emb": lin("txt_in.input_embedder"),
            "t_emb": temb("txt_in.t_embedder"),
            "c_emb": {"fc0": lin("txt_in.c_embedder.0"),
                      "fc2": lin("txt_in.c_embedder.2")},
            "blocks": stack([refiner_block(i) for i in range(cfg.refiner_depth)]),
        },
        "time_in": temb("time_in"),
        "vector_in": mlp01("vector_in"),
        "double_blocks": stack([
            {"a": component(f"double_blocks.{i}.component_a"),
             "b": component(f"double_blocks.{i}.component_b")}
            for i in range(cfg.num_double_blocks)]),
        "single_blocks": stack([single(i) for i in range(cfg.num_single_blocks)]),
        "final": {
            "linear": lin("final_layer.linear"),
            "ada": lin("final_layer.adaLN_modulation.1"),
        },
    }
    if cfg.guidance_embed and "guidance_in.timestep_embedder.0.weight" in sd:
        params["guidance_in"] = temb("guidance_in")
    return params
