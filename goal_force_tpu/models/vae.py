"""Wan2.1 3D causal video VAE — TPU-native closed form.

Architecture parity with /root/reference/diffsynth/models/wan_video_vae.py (CausalConv3d
:33-52, RMS_norm :55-70, Resample :82-195, ResidualBlock :267-301, AttentionBlock :304-342,
Encoder3d :517-617, Decoder3d :736-838, VideoVAE_ :951-1055).

The reference streams temporal chunks (1 frame, then 4) through convs with 2-frame feature
caches. That streaming is mathematically identical to processing the full sequence with
the following closed forms (derivation in DESIGN.md):

  - stride-1 causal conv (kernel 3): full-sequence conv with 2 leading zero frames;
  - encoder downsample3d time conv (kernel 3, stride 2, no pad):
        out = concat([x[:1], conv_s2(x)])           # frame 0 is an identity pass-through
  - decoder upsample3d time conv (kernel 3, stride 1, 2x channels):
        out = concat([z[:1], interleave2(conv([0, 0, z_1..z_{T-1}]))])
    (frame 0 bypasses the conv; z_0 never enters a window — the 'Rep' cache branch)

so encode/decode compile to a handful of large conv ops — no Python frame loop.

Layout: channels-last (B, T, H, W, C). Weight layouts are JAX-native; torch conversion in
io/torch_convert.py::vae_params_from_torch.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from goal_force_tpu.configs import VAE_LATENT_MEAN, VAE_LATENT_STD, VAEConfig


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------

def causal_conv3d(p, x, t_stride: int = 1, causal_pad: bool = True):
    """CausalConv3d (:33-52): kernel (kt,kh,kw), zero-pads 2*pad_t frames in FRONT.

    p: {w: (kt, kh, kw, Cin, Cout), b: (Cout,)}; x: (B, T, H, W, C).
    """
    kt, kh, kw = p["w"].shape[:3]
    pad_t = (2 * (kt // 2), 0) if causal_pad else (0, 0)
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(t_stride, 1, 1),
        padding=(pad_t, (kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return out + p["b"].astype(x.dtype)


def conv2d(p, x, stride: int = 1, zero_pad_br: bool = False):
    """x: (B*T, H, W, C); p.w: (kh, kw, Cin, Cout).

    zero_pad_br: the reference's ZeroPad2d((0,1,0,1)) before stride-2 downsample (:105-111).
    """
    kh, kw = p["w"].shape[:2]
    if zero_pad_br:
        padding = ((0, 1), (0, 1))
    else:
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(x.dtype)


def spatial_norm(p, x, eps: float = 1e-12):
    """RMS_norm (:55-70): F.normalize over channels * sqrt(C) * gamma (+ bias)."""
    xf = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    n = jnp.maximum(n, eps)
    out = (xf / n) * math.sqrt(x.shape[-1])
    out = out.astype(x.dtype) * p["gamma"].astype(x.dtype)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def silu(x):
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


def residual_block(p, x):
    """ResidualBlock (:267-301): norm-silu-conv ×2 + (1x1 conv | identity) shortcut."""
    h = x if "shortcut" not in p else causal_conv3d(p["shortcut"], x)
    y = causal_conv3d(p["conv1"], silu(spatial_norm(p["norm1"], x)))
    y = causal_conv3d(p["conv2"], silu(spatial_norm(p["norm2"], y)))
    return y + h


def attention_block(p, x):
    """Single-head per-frame spatial attention (:304-342)."""
    b, t, hh, ww, c = x.shape
    h = x.reshape(b * t, hh, ww, c)
    h = spatial_norm(p["norm"], h)
    qkv = conv2d(p["to_qkv"], h).reshape(b * t, hh * ww, 3, c)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bsc,btc->bst", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (c**-0.5), axis=-1).astype(x.dtype)
    out = jnp.einsum("bst,btc->bsc", probs, v).reshape(b * t, hh, ww, c)
    out = conv2d(p["proj"], out).reshape(b, t, hh, ww, c)
    return x + out


def _spatial(fn, x):
    """Apply a (B*T, H, W, C) function over a (B, T, H, W, C) tensor."""
    b, t = x.shape[:2]
    y = fn(x.reshape(b * t, *x.shape[2:]))
    return y.reshape(b, t, *y.shape[1:])


def downsample_spatial(p, x):
    """ZeroPad2d((0,1,0,1)) + conv 3x3 stride 2 (:104-111)."""
    return _spatial(lambda h: conv2d(p, h, stride=2, zero_pad_br=True), x)


def _up2(h):
    """nearest-exact 2x for (B*T, H, W, C) — exact pixel repeat at scale 2 (:73-79)."""
    return jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)


def downsample3d_time(p, x):
    """Encoder temporal stride-2 causal conv, closed form: concat([x[:1], conv_s2(x)])."""
    tail = causal_conv3d(p, x, t_stride=2, causal_pad=False)
    return jnp.concatenate([x[:, :1], tail], axis=1)


def upsample3d_time(p, x):
    """Decoder temporal doubling, closed form (see module docstring)."""
    b, t, hh, ww, c = x.shape
    if t == 1:
        return x  # single frame: streaming only ever passes it through
    tail_in = x[:, 1:]
    conv = causal_conv3d(p, tail_in, t_stride=1, causal_pad=True)  # (B, T-1, H, W, 2C)
    conv = conv.reshape(b, t - 1, hh, ww, 2, c)
    # channel halves -> adjacent frames (reference reshape/stack at :153-156)
    conv = conv.transpose(0, 1, 4, 2, 3, 5).reshape(b, 2 * (t - 1), hh, ww, c)
    return jnp.concatenate([x[:, :1], conv], axis=1)


# ---------------------------------------------------------------------------
# Encoder / decoder
# ---------------------------------------------------------------------------

def encoder_plan(cfg: VAEConfig) -> List[Tuple]:
    """Static module plan for Encoder3d.downsamples (:543-558)."""
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    plan = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        for _ in range(cfg.num_res_blocks):
            plan.append(("res", din, dout))
            din = dout
        if i != len(cfg.dim_mult) - 1:
            plan.append(("down3d" if cfg.temporal_downsample[i] else "down2d", dout))
    return plan


def decoder_plan(cfg: VAEConfig) -> List[Tuple]:
    """Static module plan for Decoder3d.upsamples (:766-783)."""
    dims = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    plan = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        if i in (1, 2, 3):
            din = din // 2
        for _ in range(cfg.num_res_blocks + 1):
            plan.append(("res", din, dout))
            din = dout
        if i != len(cfg.dim_mult) - 1:
            plan.append(("up3d" if cfg.temporal_upsample[i] else "up2d", dout))
    return plan


def _run_plan(plan, params, x, decoder: bool):
    for op, p in zip(plan, params):
        kind = op[0]
        if kind == "res":
            x = residual_block(p, x)
        elif kind == "attn":
            x = attention_block(p, x)
        elif kind == "down2d":
            x = downsample_spatial(p["conv"], x)
        elif kind == "down3d":
            x = downsample_spatial(p["conv"], x)
            x = downsample3d_time(p["time_conv"], x)
        elif kind == "up2d":
            x = _spatial(lambda h, pp=p: conv2d(pp["conv"], _up2(h)), x)
        elif kind == "up3d":
            x = upsample3d_time(p["time_conv"], x)
            x = _spatial(lambda h, pp=p: conv2d(pp["conv"], _up2(h)), x)
    return x


def encode(params, cfg: VAEConfig, video: jnp.ndarray) -> jnp.ndarray:
    """video (B, T, H, W, 3) in [-1,1], T = 1+4k -> unscaled mu (B, 1+k, H/8, W/8, z).

    T must be 1 mod 4 (the reference *silently drops* trailing frames otherwise —
    wan_video_vae.py:988 iter_ = 1+(t-1)//4; we fail loudly instead).
    """
    if video.shape[1] % 4 != 1:
        raise ValueError(f"encode expects T = 1+4k frames, got T={video.shape[1]}")
    x = causal_conv3d(params["encoder"]["conv1"], video)
    x = _run_plan(encoder_plan(cfg), params["encoder"]["down"], x, decoder=False)
    x = residual_block(params["encoder"]["mid_res1"], x)
    x = attention_block(params["encoder"]["mid_attn"], x)
    x = residual_block(params["encoder"]["mid_res2"], x)
    x = causal_conv3d(params["encoder"]["head_conv"], silu(spatial_norm(params["encoder"]["head_norm"], x)))
    moments = causal_conv3d(params["conv1"], x)
    mu = moments[..., : cfg.z_dim]
    return mu


def decode(params, cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """unscaled latents (B, L, h, w, z) -> video (B, 4L-3, 8h, 8w, 3), unclamped."""
    x = causal_conv3d(params["conv2"], z)
    x = causal_conv3d(params["decoder"]["conv1"], x)
    x = residual_block(params["decoder"]["mid_res1"], x)
    x = attention_block(params["decoder"]["mid_attn"], x)
    x = residual_block(params["decoder"]["mid_res2"], x)
    x = _run_plan(decoder_plan(cfg), params["decoder"]["up"], x, decoder=True)
    x = causal_conv3d(params["decoder"]["head_conv"], silu(spatial_norm(params["decoder"]["head_norm"], x)))
    return x


def latent_scale(cfg: VAEConfig, dtype=jnp.float32):
    if cfg.z_dim == 16:
        mean = jnp.asarray(VAE_LATENT_MEAN, dtype)
        std = jnp.asarray(VAE_LATENT_STD, dtype)
    else:  # tiny/test configs
        mean = jnp.zeros((cfg.z_dim,), dtype)
        std = jnp.ones((cfg.z_dim,), dtype)
    return mean, std


def encode_video(params, cfg: VAEConfig, video: jnp.ndarray) -> jnp.ndarray:
    """Scaled encode: (mu - mean) / std (reference :1001-1009)."""
    mu = encode(params, cfg, video)
    mean, std = latent_scale(cfg, mu.dtype)
    return (mu - mean) / std


def decode_video(params, cfg: VAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """Scaled decode + clamp [-1,1] (reference :1011-1020, :1215)."""
    mean, std = latent_scale(cfg, latents.dtype)
    out = decode(params, cfg, latents * std + mean)
    return jnp.clip(out, -1.0, 1.0)


# ---------------------------------------------------------------------------
# Spatially tiled encode/decode (reference tiled_encode/tiled_decode :1103-1203)
# ---------------------------------------------------------------------------

def _blend_mask_1d(length: int, left_bound: bool, right_bound: bool, border: int) -> np.ndarray:
    x = np.ones((length,), np.float32)
    if not left_bound:
        x[:border] = (np.arange(border) + 1) / border
    if not right_bound:
        x[-border:] = np.flip((np.arange(border) + 1) / border)
    return x


def _tile_tasks(size: int, tile: int, stride: int):
    out = []
    for a in range(0, size, stride):
        if a - stride >= 0 and a - stride + tile >= size:
            continue
        out.append((a, a + tile))
    return out


def tiled_apply(fn, x, tile_hw, stride_hw, scale: int, out_channels: int, out_t: int):
    """Overlap-blend spatial tiling shared by encode (scale=1/8) and decode (scale=8).

    x: (B, T, H, W, C); fn maps a spatial crop to its coded counterpart.
    """
    b, t, H, W, _ = x.shape
    oh, ow = int(H * scale), int(W * scale)
    # accumulate ON DEVICE: a decoded 81-frame tile is ~120 MB — np
    # accumulation pulled every tile over the device link (~25 s/clip on the
    # tunneled bench chip); only the caller's final materialization transfers
    values = jnp.zeros((b, out_t, oh, ow, out_channels), jnp.float32)
    weight = jnp.zeros((1, 1, oh, ow, 1), jnp.float32)
    th, tw = tile_hw
    sh, sw = stride_hw
    for h0, h1 in _tile_tasks(H, th, sh):
        for w0, w1 in _tile_tasks(W, tw, sw):
            crop = x[:, :, h0:min(h1, H), w0:min(w1, W), :]
            out = fn(crop).astype(jnp.float32)
            bh = int((th - sh) * scale)
            bw = int((tw - sw) * scale)
            mh = _blend_mask_1d(out.shape[2], h0 == 0, h1 >= H, bh)
            mw = _blend_mask_1d(out.shape[3], w0 == 0, w1 >= W, bw)
            mask = jnp.asarray(
                np.minimum(mh[:, None], mw[None, :])[None, None, :, :, None])
            to_h, to_w = int(h0 * scale), int(w0 * scale)
            values = values.at[:, :, to_h:to_h + out.shape[2],
                               to_w:to_w + out.shape[3]].add(out * mask)
            weight = weight.at[:, :, to_h:to_h + out.shape[2],
                               to_w:to_w + out.shape[3]].add(mask)
    return values / weight


@functools.lru_cache(maxsize=8)
def _jit_encode_video(cfg):
    return jax.jit(lambda p, crop: encode_video(p, cfg, crop))


@functools.lru_cache(maxsize=8)
def _jit_decode_video(cfg):
    return jax.jit(lambda p, crop: decode_video(p, cfg, crop))


def encode_video_tiled(params, cfg, video, tile_size=(34, 34), tile_stride=(18, 16)):
    """Latent-unit tile sizes as in the reference defaults (:1218).

    The per-tile coder is JITTED (cached per config; XLA caches per tile
    shape — interior/edge tiles give <=4 variants). Eager per-op dispatch
    over the device link measured 62 s for one 81-frame tiled decode."""
    f = cfg.upsampling_factor
    b, t = video.shape[:2]
    out_t = (t + 3) // 4
    jfn = _jit_encode_video(cfg)
    fn = lambda crop: jfn(params, crop)
    return jnp.asarray(tiled_apply(
        fn, video, (tile_size[0] * f, tile_size[1] * f), (tile_stride[0] * f, tile_stride[1] * f),
        1.0 / f, cfg.z_dim, out_t,
    ))


def decode_video_tiled(params, cfg, latents, tile_size=(34, 34), tile_stride=(18, 16)):
    b, t = latents.shape[:2]
    out_t = t * 4 - 3
    jfn = _jit_decode_video(cfg)
    fn = lambda crop: jfn(params, crop)
    out = tiled_apply(fn, latents, tile_size, tile_stride, float(cfg.upsampling_factor), 3, out_t)
    return jnp.clip(jnp.asarray(out), -1.0, 1.0)


# ---------------------------------------------------------------------------
# Init (tests/training-from-scratch; real weights come from the torch converter)
# ---------------------------------------------------------------------------

def _init_conv3d(key, kt, kh, kw, cin, cout, dtype):
    scale = 1.0 / math.sqrt(cin * kt * kh * kw)
    return {
        "w": jax.random.uniform(key, (kt, kh, kw, cin, cout), dtype, -scale, scale),
        "b": jnp.zeros((cout,), dtype),
    }


def _init_conv2d(key, kh, kw, cin, cout, dtype):
    scale = 1.0 / math.sqrt(cin * kh * kw)
    return {
        "w": jax.random.uniform(key, (kh, kw, cin, cout), dtype, -scale, scale),
        "b": jnp.zeros((cout,), dtype),
    }


def _init_norm(dim, dtype, bias=False):
    p = {"gamma": jnp.ones((dim,), dtype)}
    if bias:
        p["bias"] = jnp.zeros((dim,), dtype)
    return p


def _init_res(key, din, dout, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _init_norm(din, dtype),
        "conv1": _init_conv3d(k1, 3, 3, 3, din, dout, dtype),
        "norm2": _init_norm(dout, dtype),
        "conv2": _init_conv3d(k2, 3, 3, 3, dout, dout, dtype),
    }
    if din != dout:
        p["shortcut"] = _init_conv3d(k3, 1, 1, 1, din, dout, dtype)
    return p


def _init_attn_block(key, dim, dtype):
    k1, k2 = jax.random.split(key)
    p = {
        "norm": _init_norm(dim, dtype),
        "to_qkv": _init_conv2d(k1, 1, 1, dim, dim * 3, dtype),
        "proj": _init_conv2d(k2, 1, 1, dim, dim, dtype),
    }
    p["proj"]["w"] = jnp.zeros_like(p["proj"]["w"])  # zero-init (:319)
    return p


def _init_plan(key, plan, dtype, decoder: bool):
    params = []
    keys = jax.random.split(key, max(len(plan), 1))
    for op, k in zip(plan, keys):
        kind = op[0]
        if kind == "res":
            params.append(_init_res(k, op[1], op[2], dtype))
        elif kind == "attn":
            params.append(_init_attn_block(k, op[1], dtype))
        elif kind in ("down2d", "down3d"):
            d = op[1]
            p = {"conv": _init_conv2d(k, 3, 3, d, d, dtype)}
            if kind == "down3d":
                p["time_conv"] = _init_conv3d(k, 3, 1, 1, d, d, dtype)
            params.append(p)
        elif kind in ("up2d", "up3d"):
            d = op[1]
            p = {"conv": _init_conv2d(k, 3, 3, d, d // 2, dtype)}
            if kind == "up3d":
                p["time_conv"] = _init_conv3d(k, 3, 1, 1, d, d * 2, dtype)
            params.append(p)
    return params


def init_vae(key, cfg: VAEConfig, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 12)
    top = cfg.dim * cfg.dim_mult[-1]
    enc = {
        "conv1": _init_conv3d(ks[0], 3, 3, 3, 3, cfg.dim, dtype),
        "down": _init_plan(ks[1], encoder_plan(cfg), dtype, decoder=False),
        "mid_res1": _init_res(ks[2], top, top, dtype),
        "mid_attn": _init_attn_block(ks[3], top, dtype),
        "mid_res2": _init_res(ks[4], top, top, dtype),
        "head_norm": _init_norm(top, dtype),
        "head_conv": _init_conv3d(ks[5], 3, 3, 3, top, cfg.z_dim * 2, dtype),
    }
    dec = {
        "conv1": _init_conv3d(ks[6], 3, 3, 3, cfg.z_dim, top, dtype),
        "mid_res1": _init_res(ks[7], top, top, dtype),
        "mid_attn": _init_attn_block(ks[8], top, dtype),
        "mid_res2": _init_res(ks[9], top, top, dtype),
        "up": _init_plan(ks[10], decoder_plan(cfg), dtype, decoder=True),
        "head_norm": _init_norm(cfg.dim, dtype),
        "head_conv": _init_conv3d(ks[11], 3, 3, 3, cfg.dim, 3, dtype),
    }
    return {
        "encoder": enc,
        "decoder": dec,
        "conv1": _init_conv3d(ks[0], 1, 1, 1, cfg.z_dim * 2, cfg.z_dim * 2, dtype),
        "conv2": _init_conv3d(ks[6], 1, 1, 1, cfg.z_dim, cfg.z_dim, dtype),
    }
