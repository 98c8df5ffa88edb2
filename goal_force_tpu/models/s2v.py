"""WanS2V — speech-to-video DiT variant.

Parity with /root/reference/diffsynth/models/wan_video_dit_s2v.py:
  rope_precompute (:27-83)         -> host-side bucket cos/sin tables (f64 numpy)
  MotionEncoder_tc (:102-169)      -> causal conv1d stack, local heads + global path
  FramePackMotioner (:172-257)     -> 1x/2x/4x packed motion latents + their rope buckets
  CausalAudioEncoder (:322-339)    -> SiLU-weighted layer mix -> motion encoder
  AudioInjector_WAN (:282-319)     -> per-inject-layer cross-attn (+AdaLN on global emb)
  WanS2VDiTBlock (:342-357)        -> two-row t_mod: row 0 for video tokens, row 1 (zero
                                      timestep) for ref/motion tokens
  WanS2VModel.forward (:504-595)

Host-side audio feature extraction (wav2vec2) stays on CPU via transformers
(the reference's diffsynth/models/wav2vec.py wraps the same upstream model).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.wan_dit import (
    attention,
    gelu_tanh,
    layer_norm,
    linear,
    rms_norm,
    sinusoidal_embedding,
)
from goal_force_tpu.ops.rope import _axis_freqs, apply_rope


@dataclasses.dataclass(frozen=True)
class S2VConfig:
    """Preset mirrors hash 966cffdcc5... (:609-624)."""

    dim: int = 5120
    in_dim: int = 16
    ffn_dim: int = 13824
    out_dim: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    eps: float = 1e-6
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    num_heads: int = 40
    num_layers: int = 40
    cond_dim: int = 16
    audio_dim: int = 1024
    num_audio_token: int = 4
    audio_encoder_layers: int = 25
    enable_adain: bool = True
    audio_inject_layers: Tuple[int, ...] = (0, 4, 8, 12, 16, 20, 24, 27, 30, 33, 36, 39)
    zip_frame_buckets: Tuple[int, int, int] = (1, 2, 16)

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


def tiny_s2v(num_layers: int = 2) -> S2VConfig:
    # audio_encoder_layers stays 25: the reference hardcodes CausalAudioEncoder's
    # num_layers default (:411).
    return S2VConfig(dim=96, in_dim=4, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
                     num_heads=4, num_layers=num_layers, cond_dim=4, audio_dim=16,
                     num_audio_token=2, audio_inject_layers=(0, 1))


# ---------------------------------------------------------------------------
# Bucketed RoPE tables (host, f64 -> f32 cos/sin)
# ---------------------------------------------------------------------------

def _bucket_angles(head_dim: int, f_o: int, f: int, h: int, w: int,
                   t_f: int, t_h: int, t_w: int, max_len: int = 1024) -> np.ndarray:
    """(seq, head_dim//2) angles for one grid bucket (reference rope_precompute :41-77).

    f_o may be negative (motion history): angles are conjugated (negated)."""
    c = head_dim // 2
    d_f, d_hw = c - 2 * (c // 3), c // 3
    ang_f = _axis_freqs(2 * d_f, max_len)
    ang_h = _axis_freqs(2 * d_hw, max_len)
    ang_w = _axis_freqs(2 * d_hw, max_len)
    seq_f, seq_h, seq_w = f - f_o, h, w  # reference: seq dims are g[1]-g[0]
    if f_o >= 0:
        f_sam = np.linspace(f_o, t_f + f_o - 1, seq_f).astype(int)
        af = ang_f[f_sam]
    else:
        f_sam = np.linspace(-f_o, -t_f - f_o + 1, seq_f).astype(int)
        af = -ang_f[f_sam]  # conj
    h_sam = np.linspace(0, t_h - 1, seq_h).astype(int)
    w_sam = np.linspace(0, t_w - 1, seq_w).astype(int)
    grid = np.concatenate([
        np.broadcast_to(af[:, None, None, :], (seq_f, seq_h, seq_w, d_f)),
        np.broadcast_to(ang_h[h_sam][None, :, None, :], (seq_f, seq_h, seq_w, d_hw)),
        np.broadcast_to(ang_w[w_sam][None, None, :, :], (seq_f, seq_h, seq_w, d_hw)),
    ], axis=-1)
    return grid.reshape(seq_f * seq_h * seq_w, c)


def s2v_rope_tables(cfg: S2VConfig, grid_x: Tuple[int, int, int],
                    grid_ref: Tuple[int, int, int],
                    motion_grid: Optional[Tuple[int, int]] = None):
    """cos/sin (S_total, head_dim//2) covering [x tokens, ref tokens, motion tokens].

    x bucket: standard grid; ref bucket: single frame at time offset 30 (reference
    get_grid_sizes :492-502); motion buckets per FramePackMotioner (:218-246)."""
    f, h, w = grid_x
    rf, rh, rw = grid_ref
    angles = [
        _bucket_angles(cfg.head_dim, 0, f, h, w, f, h, w),
        _bucket_angles(cfg.head_dim, 30, 31, rh, rw, 1, rh, rw),
    ]
    if motion_grid is not None:
        lh, lw = motion_grid  # motion latent height/width
        zb = cfg.zip_frame_buckets
        # post (1 frame, 1x), 2x (2 frames), 4x (16 frames) — time offsets negative
        angles.append(_bucket_angles(cfg.head_dim, -zb[0], 0, lh // 2, lw // 2,
                                     zb[0], lh // 2, lw // 2))
        angles.append(_bucket_angles(cfg.head_dim, -(zb[0] + zb[1]),
                                     -(zb[0] + zb[1]) + zb[1] // 2, lh // 4, lw // 4,
                                     zb[1], lh // 2, lw // 2))
        angles.append(_bucket_angles(cfg.head_dim, -sum(zb), -sum(zb) + zb[2] // 4,
                                     lh // 8, lw // 8, zb[2], lh // 2, lw // 2))
    ang = np.concatenate(angles, axis=0)
    return jnp.asarray(np.cos(ang), jnp.float32), jnp.asarray(np.sin(ang), jnp.float32)


# ---------------------------------------------------------------------------
# Audio / motion encoders
# ---------------------------------------------------------------------------

def causal_conv1d(p, x, stride: int = 1):
    """x: (B, T, C); replicate-pad (k-1) front (reference CausalConv1d :86-99)."""
    k = p["w"].shape[0]
    front = jnp.repeat(x[:, :1], k - 1, axis=1)
    x = jnp.concatenate([front, x], axis=1)
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride,), [(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return out + p["b"].astype(x.dtype)


def motion_encoder_apply(p, x, num_heads: int, need_global: bool, eps: float = 1e-6):
    """x: (B, T, C_in) -> local (B, T', num_heads+1, H) [, global (B, T', 1, H)]
    (reference MotionEncoder_tc :126-169)."""
    b = x.shape[0]

    def stack(h):
        h = layer_norm(h, eps)
        h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
        h = causal_conv1d(p["conv2"], h, stride=2)
        h = layer_norm(h, eps)
        h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
        h = causal_conv1d(p["conv3"], h, stride=2)
        h = layer_norm(h, eps)
        return jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)

    loc = causal_conv1d(p["conv1_local"], x)              # (B, T, heads*H/4)
    t = loc.shape[1]
    hq = loc.shape[-1] // num_heads
    loc = loc.reshape(b, t, num_heads, hq).transpose(0, 2, 1, 3).reshape(b * num_heads, t, hq)
    loc = stack(loc)
    tp = loc.shape[1]
    loc = loc.reshape(b, num_heads, tp, -1).transpose(0, 2, 1, 3)   # (B, T', n, H)
    pad = jnp.broadcast_to(p["padding_tokens"].astype(loc.dtype),
                           (b, tp, 1, loc.shape[-1]))
    x_local = jnp.concatenate([loc, pad], axis=-2)
    if not need_global:
        return x_local
    g = stack(causal_conv1d(p["conv1_global"], x))
    g = linear(p["final_linear"], g)
    return g.reshape(b, tp, 1, -1), x_local


def causal_audio_encoder_apply(p, features, num_token: int, need_global: bool):
    """features: (B, L, C, T) wav2vec hidden states stack (reference :332-339)."""
    w = jax.nn.silu(p["weights"].astype(jnp.float32)).astype(features.dtype)  # (1, L, 1, 1)
    feat = (features * w / w.sum(axis=1, keepdims=True)).sum(axis=1)  # (B, C, T)
    feat = feat.transpose(0, 2, 1)  # (B, T, C)
    return motion_encoder_apply(p["encoder"], feat, num_token, need_global)


def frame_pack_motion(p, cfg: S2VConfig, motion_latents: jnp.ndarray):
    """motion_latents: (B, T_m, H, W, 16) -> packed tokens (B, S_m, dim).

    The 1x/2x/4x projections are conv3d with kernel==stride == patch matmuls
    (reference FramePackMotioner :186-215, padd to 19 frames, split [16, 2, 1])."""
    b, tm, hh, ww, c = motion_latents.shape
    total = sum(cfg.zip_frame_buckets)
    pad = jnp.zeros((b, total, hh, ww, c), motion_latents.dtype)
    overlap = min(total, tm)
    pad = pad.at[:, -overlap:].set(motion_latents[:, -overlap:])
    n4, n2, n1 = cfg.zip_frame_buckets[2], cfg.zip_frame_buckets[1], cfg.zip_frame_buckets[0]
    lat_4x, lat_2x, lat_post = pad[:, :n4], pad[:, n4:n4 + n2], pad[:, n4 + n2:]

    def proj(x, pp, pf, ps):
        bb, t_, h_, w_, c_ = x.shape
        x = x.reshape(bb, t_ // pf, pf, h_ // ps, ps, w_ // ps, ps, c_)
        x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(
            bb, (t_ // pf) * (h_ // ps) * (w_ // ps), c_ * pf * ps * ps)
        return linear(pp, x)

    toks = [
        proj(lat_post, p["proj"], 1, 2),
        proj(lat_2x, p["proj_2x"], 2, 4),
        proj(lat_4x, p["proj_4x"], 4, 8),
    ]
    return jnp.concatenate(toks, axis=1)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def s2v_block(p, x, context, t_mod2, seq_len_x: int, cos, sin, cfg: S2VConfig,
              attn_impl: str = "auto"):
    """t_mod2: (B, 6, 2, D) — row 0 modulates video tokens, row 1 the rest (:344-357)."""
    mod = p["modulation"].astype(t_mod2.dtype)[None, :, None, :] + t_mod2  # (B, 6, 2, D)
    s_total = x.shape[1]

    def split_mod(i):
        a = mod[:, i, 0][:, None, :]
        bqk = mod[:, i, 1][:, None, :]
        return jnp.concatenate([
            jnp.broadcast_to(a, (x.shape[0], seq_len_x, x.shape[-1])),
            jnp.broadcast_to(bqk, (x.shape[0], s_total - seq_len_x, x.shape[-1])),
        ], axis=1)

    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
        split_mod(i) for i in range(6)
    )
    b, s, d = x.shape
    h = layer_norm(x, cfg.eps) * (1 + scale_msa) + shift_msa
    q = rms_norm(linear(p["self_attn"]["q"], h), p["self_attn"]["norm_q"]["w"], cfg.eps)
    k = rms_norm(linear(p["self_attn"]["k"], h), p["self_attn"]["norm_k"]["w"], cfg.eps)
    v = linear(p["self_attn"]["v"], h).reshape(b, s, cfg.num_heads, -1)
    q = apply_rope(q.reshape(b, s, cfg.num_heads, -1), cos, sin)
    k = apply_rope(k.reshape(b, s, cfg.num_heads, -1), cos, sin)
    attn_out = attention(q, k, v, impl=attn_impl).reshape(b, s, d)
    x = x + gate_msa * linear(p["self_attn"]["o"], attn_out)

    hh = layer_norm(x, cfg.eps, p["norm3"]["w"], p["norm3"]["b"])
    t = context.shape[1]
    q = rms_norm(linear(p["cross_attn"]["q"], hh), p["cross_attn"]["norm_q"]["w"], cfg.eps)
    k = rms_norm(linear(p["cross_attn"]["k"], context), p["cross_attn"]["norm_k"]["w"], cfg.eps)
    v = linear(p["cross_attn"]["v"], context).reshape(b, t, cfg.num_heads, -1)
    ca = attention(q.reshape(b, s, cfg.num_heads, -1), k.reshape(b, t, cfg.num_heads, -1),
                   v, impl=attn_impl).reshape(b, s, d)
    x = x + linear(p["cross_attn"]["o"], ca)

    h2 = layer_norm(x, cfg.eps) * (1 + scale_mlp) + shift_mlp
    h2 = linear(p["ffn"]["fc2"], gelu_tanh(linear(p["ffn"]["fc0"], h2)))
    return x + gate_mlp * h2


def audio_inject(p, idx: int, x, audio_emb_global, audio_emb, seq_len_x: int,
                 cfg: S2VConfig, attn_impl: str = "auto"):
    """Audio cross-attention injection after selected blocks (:460-483)."""
    b = x.shape[0]
    nf = audio_emb.shape[1]
    hidden = x[:, :seq_len_x].reshape(b * nf, seq_len_x // nf, cfg.dim)
    # AdaLN over per-frame global audio embedding
    temb = audio_emb_global.reshape(b * nf, -1, cfg.dim)[:, 0]
    ada = p["adain"]
    temb = linear(ada["linear"], jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
    shift, scale = jnp.split(temb, 2, axis=1)
    hidden_n = layer_norm(hidden, 1e-5) * (1 + scale[:, None, :]) + shift[:, None, :]

    aud = audio_emb.reshape(b * nf, -1, cfg.dim)
    inj = p["injector"]
    s = hidden_n.shape[1]
    t = aud.shape[1]
    q = rms_norm(linear(inj["q"], hidden_n), inj["norm_q"]["w"], cfg.eps)
    k = rms_norm(linear(inj["k"], aud), inj["norm_k"]["w"], cfg.eps)
    v = linear(inj["v"], aud).reshape(b * nf, t, cfg.num_heads, -1)
    out = attention(q.reshape(b * nf, s, cfg.num_heads, -1),
                    k.reshape(b * nf, t, cfg.num_heads, -1), v,
                    impl=attn_impl).reshape(b * nf, s, cfg.dim)
    res = linear(inj["o"], out).reshape(b, seq_len_x, cfg.dim)
    return x.at[:, :seq_len_x].add(res)


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------

def cal_audio_emb(params, cfg: S2VConfig, audio_input, motion_frames=(73, 19)):
    """(B, L, C, T) -> global (B, T', 1, D), merged (B, T', n+1, D) (reference :485-490)."""
    first = jnp.repeat(audio_input[..., :1], motion_frames[0], axis=-1)
    audio_input = jnp.concatenate([first, audio_input], axis=-1)
    g, loc = causal_audio_encoder_apply(params["audio_encoder"], audio_input,
                                        cfg.num_audio_token, True)
    return g[:, motion_frames[1]:], loc[:, motion_frames[1]:]


def wan_s2v_forward(
    params: Dict,
    cfg: S2VConfig,
    latents: jnp.ndarray,        # (B, L, h, w, z); frame 0 is the reference latent
    timestep: jnp.ndarray,       # (B,)
    context: jnp.ndarray,        # (B, L_txt, text_dim)
    audio_input: jnp.ndarray,    # (B, layers, audio_dim, T_audio)
    motion_latents: Optional[jnp.ndarray] = None,  # (B, T_m, h, w, z)
    pose_cond: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """Mirror of WanS2VModel.forward (:504-595); channels-last latents."""
    origin_ref = latents[:, :1]
    x_lat = latents[:, 1:]
    b = latents.shape[0]

    ctx = linear(params["text_embedding"]["fc2"],
                 gelu_tanh(linear(params["text_embedding"]["fc0"], context)))

    audio_emb_global, merged_audio_emb = cal_audio_emb(params, cfg, audio_input)

    pose = jnp.zeros_like(x_lat) if pose_cond is None else pose_cond

    def patch(x, pp):
        bb, f, hh, ww, c = x.shape
        pf, ph, pw = cfg.patch_size
        x = x.reshape(bb, f // pf, pf, hh // ph, ph, ww // pw, pw, c)
        x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(
            bb, (f // pf) * (hh // ph) * (ww // pw), c * pf * ph * pw)
        return linear(pp, x), (f // pf, hh // ph, ww // pw)

    x, (f, h, w) = patch(x_lat, params["patch_embedding"])
    pc, _ = patch(pose, params["cond_encoder"])
    x = x + pc
    seq_len_x = x.shape[1]

    ref, (rf, rh, rw) = patch(origin_ref, params["patch_embedding"])
    x = jnp.concatenate([x, ref], axis=1)
    mask = [0] * seq_len_x + [1] * ref.shape[1]

    motion_grid = None
    if motion_latents is not None:
        mot = frame_pack_motion(params["frame_packer"], cfg, motion_latents)
        x = jnp.concatenate([x, mot], axis=1)
        mask = mask + [2] * mot.shape[1]
        motion_grid = (motion_latents.shape[2], motion_latents.shape[3])

    cos, sin = s2v_rope_tables(cfg, (f, h, w), (rf, rh, rw), motion_grid)
    x = x + params["trainable_cond_mask"][jnp.asarray(mask)].astype(x.dtype)

    # two-row timestep: [t, 0] (zero timestep for ref/motion tokens, :544-547)
    t2 = jnp.concatenate([timestep, jnp.zeros((1,), timestep.dtype)])
    emb = sinusoidal_embedding(cfg.freq_dim, t2).astype(x.dtype)
    t_base = linear(params["time_embedding"]["fc0"], emb)
    t_base = linear(params["time_embedding"]["fc2"],
                    jax.nn.silu(t_base.astype(jnp.float32)).astype(t_base.dtype))
    t_mod = linear(params["time_projection"],
                   jax.nn.silu(t_base.astype(jnp.float32)).astype(t_base.dtype))
    t_mod2 = t_mod.reshape(2, 6, cfg.dim).transpose(1, 0, 2)[None]  # (1, 6, 2, D)

    inject_map = {layer: i for i, layer in enumerate(cfg.audio_inject_layers)}
    for i in range(cfg.num_layers):
        blk = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
        x = s2v_block(blk, x, ctx, t_mod2, seq_len_x, cos, sin, cfg, attn_impl)
        if i in inject_map:
            inj = jax.tree_util.tree_map(lambda a, j=inject_map[i]: a[j],
                                         params["audio_injector"])
            x = audio_inject(inj, inject_map[i], x, audio_emb_global,
                             merged_audio_emb, seq_len_x, cfg, attn_impl)

    x = x[:, :seq_len_x]
    from goal_force_tpu.models.wan_dit import head, unpatchify

    out = head(params["head"], x, t_base[:1], cfg.eps)
    out = unpatchify(out, (f, h, w), cfg.patch_size, cfg.out_dim)
    return jnp.concatenate([origin_ref, out], axis=1)


# ---------------------------------------------------------------------------
# Torch conversion
# ---------------------------------------------------------------------------

def s2v_params_from_torch(sd, cfg: S2VConfig) -> Dict:
    from goal_force_tpu.io.torch_convert import _block, _lin, patch_embed_from_conv3d

    def conv1d(prefix):
        return {"w": np.ascontiguousarray(sd[prefix + ".conv.weight"].transpose(2, 1, 0)),
                "b": sd[prefix + ".conv.bias"]}

    def motion_encoder(prefix, need_global):
        p = {
            "conv1_local": conv1d(prefix + ".conv1_local"),
            "conv2": conv1d(prefix + ".conv2"),
            "conv3": conv1d(prefix + ".conv3"),
            "padding_tokens": sd[prefix + ".padding_tokens"][0, 0],  # (1, H)
        }
        if need_global:
            p["conv1_global"] = conv1d(prefix + ".conv1_global")
            p["final_linear"] = _lin(sd, prefix + ".final_linear")
        return p

    blocks = [_block(sd, f"blocks.{i}") for i in range(cfg.num_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *blocks)

    n_inj = len(cfg.audio_inject_layers)
    inj_blocks = []
    for k in range(n_inj):
        pre = f"audio_injector.injector.{k}"
        inj_blocks.append({
            "injector": {
                "q": _lin(sd, pre + ".q"), "k": _lin(sd, pre + ".k"),
                "v": _lin(sd, pre + ".v"), "o": _lin(sd, pre + ".o"),
                "norm_q": {"w": sd[pre + ".norm_q.weight"]},
                "norm_k": {"w": sd[pre + ".norm_k.weight"]},
            },
            "adain": {"linear": _lin(sd, f"audio_injector.injector_adain_layers.{k}.linear")},
        })
    inj_stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *inj_blocks)

    def pk(prefix, pf, ps):
        w = sd[prefix + ".weight"]  # (D, 16, pf, ps, ps)
        return patch_embed_from_conv3d(w, sd[prefix + ".bias"])

    return {
        "patch_embedding": patch_embed_from_conv3d(sd["patch_embedding.weight"],
                                                   sd["patch_embedding.bias"]),
        "cond_encoder": patch_embed_from_conv3d(sd["cond_encoder.weight"],
                                                sd["cond_encoder.bias"]),
        "text_embedding": {"fc0": _lin(sd, "text_embedding.0"),
                           "fc2": _lin(sd, "text_embedding.2")},
        "time_embedding": {"fc0": _lin(sd, "time_embedding.0"),
                           "fc2": _lin(sd, "time_embedding.2")},
        "time_projection": _lin(sd, "time_projection.1"),
        "blocks": stacked,
        "head": {**_lin(sd, "head.head"), "modulation": sd["head.modulation"].reshape(2, -1)},
        "trainable_cond_mask": sd["trainable_cond_mask.weight"],
        "audio_encoder": {
            "weights": sd["casual_audio_encoder.weights"],
            "encoder": motion_encoder("casual_audio_encoder.encoder", cfg.enable_adain),
        },
        "audio_injector": inj_stacked,
        "frame_packer": {
            "proj": pk("frame_packer.proj", 1, 2),
            "proj_2x": pk("frame_packer.proj_2x", 2, 4),
            "proj_4x": pk("frame_packer.proj_4x", 4, 8),
        },
    }
