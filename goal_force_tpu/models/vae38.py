"""Wan2.2 VAE38 — the 48-channel 16x VAE for Wan2.2-TI2V-5B.

Parity with VideoVAE38_ (/root/reference/diffsynth/models/wan_video_vae.py:1269-1383,
Encoder3d_38 :620-733, Decoder3d_38 :842-940, Down/Up_ResidualBlock :442-514,
AvgDown3D/DupUp3D :345-439): pixel-space patchify(2) (3->12 ch), residual stages with
parameter-free average-pool / duplicate-upsample shortcuts, spatial 8x + patch 2 = 16x.

Same closed-form streaming equivalence as models/vae.py: chunk boundaries align with the
temporal pooling groups, so AvgDown3D == front-padded average pooling over the full
sequence and DupUp3D(first_chunk) == 2x frame repeat with the first (factor_t-1) frames
trimmed.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from goal_force_tpu.models.vae import (
    _init_conv2d,
    _init_conv3d,
    _init_norm,
    _init_res,
    _init_attn_block,
    attention_block,
    causal_conv3d,
    conv2d,
    downsample3d_time,
    downsample_spatial,
    residual_block,
    silu,
    spatial_norm,
    upsample3d_time,
    _spatial,
    _up2,
)

# Per-channel latent stats (reference :1300-1320).
VAE38_MEAN = (
    -0.2289, -0.0052, -0.1323, -0.2339, -0.2799, 0.0174, 0.1838, 0.1557,
    -0.1382, 0.0542, 0.2813, 0.0891, 0.1570, -0.0098, 0.0375, -0.1825,
    -0.2246, -0.1207, -0.0698, 0.5109, 0.2665, -0.2108, -0.2158, 0.2502,
    -0.2055, -0.0322, 0.1109, 0.1567, -0.0729, 0.0899, -0.2799, -0.1230,
    -0.0313, -0.1649, 0.0117, 0.0723, -0.2839, -0.2083, -0.0520, 0.3748,
    0.0152, 0.1957, 0.1433, -0.2944, 0.3573, -0.0548, -0.1681, -0.0667,
)
VAE38_STD = (
    0.4765, 1.0364, 0.4514, 1.1677, 0.5313, 0.4990, 0.4818, 0.5013,
    0.8158, 1.0344, 0.5894, 1.0901, 0.6885, 0.6165, 0.8454, 0.4978,
    0.5759, 0.3523, 0.7135, 0.6804, 0.5833, 1.4146, 0.8986, 0.5659,
    0.7069, 0.5338, 0.4889, 0.4917, 0.4069, 0.4999, 0.6866, 0.4093,
    0.5709, 0.6065, 0.6415, 0.4944, 0.5726, 1.2042, 0.5458, 1.6887,
    0.3971, 1.0600, 0.3943, 0.5537, 0.5444, 0.4089, 0.7468, 0.7744,
)


@dataclasses.dataclass(frozen=True)
class VAE38Config:
    dim: int = 160
    dec_dim: int = 256
    z_dim: int = 48
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    patch_size: int = 2
    upsampling_factor: int = 16

    @property
    def temporal_upsample(self):
        return tuple(reversed(self.temporal_downsample))


def tiny_vae38() -> VAE38Config:
    return VAE38Config(dim=8, dec_dim=8, z_dim=4, num_res_blocks=1)


def pixel_patchify(x: jnp.ndarray, p: int = 2) -> jnp.ndarray:
    """(B,T,H,W,3) -> (B,T,H/p,W/p,3*p*p); feature order (c r q) matches the reference
    rearrange 'b c f (h q) (w r) -> b (c r q) f h w' (:199-211)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // p, p, w // p, p, c)
    # (q=dy at axis 3, r=dx at axis 5) -> channel order (c, r, q)
    return x.transpose(0, 1, 2, 4, 6, 5, 3).reshape(b, t, h // p, w // p, c * p * p)


def pixel_unpatchify(x: jnp.ndarray, p: int = 2) -> jnp.ndarray:
    b, t, h, w, cpp = x.shape
    c = cpp // (p * p)
    x = x.reshape(b, t, h, w, c, p, p)
    return x.transpose(0, 1, 2, 6, 3, 5, 4).reshape(b, t, h * p, w * p, c)


def avg_down3d(x: jnp.ndarray, factor_t: int, factor_s: int, out_channels: int) -> jnp.ndarray:
    """AvgDown3D (:345-395): front-pad T, group-pool (t,s,s), channel-group mean."""
    b, t, h, w, c = x.shape
    pad_t = (factor_t - t % factor_t) % factor_t
    if pad_t:
        x = jnp.concatenate([jnp.zeros((b, pad_t, h, w, c), x.dtype), x], axis=1)
        t = t + pad_t
    x = x.reshape(b, t // factor_t, factor_t, h // factor_s, factor_s,
                  w // factor_s, factor_s, c)
    # channel layout (C * factor): reference permute is (C, ft, fs_h, fs_w)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(
        b, t // factor_t, h // factor_s, w // factor_s,
        c * factor_t * factor_s * factor_s)
    group = x.shape[-1] // out_channels
    x = x.reshape(*x.shape[:-1], out_channels, group)
    return jnp.mean(x, axis=-1)


def dup_up3d(x: jnp.ndarray, factor_t: int, factor_s: int, out_channels: int,
             first_chunk: bool) -> jnp.ndarray:
    """DupUp3D (:398-439): channel-repeat -> redistribute to (t*ft, h*fs, w*fs); trim
    the first factor_t-1 frames for the first chunk (full-sequence: always trim)."""
    b, t, h, w, c = x.shape
    repeats = out_channels * factor_t * factor_s * factor_s // c
    x = jnp.repeat(x, repeats, axis=-1)
    x = x.reshape(b, t, h, w, out_channels, factor_t, factor_s, factor_s)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4).reshape(
        b, t * factor_t, h * factor_s, w * factor_s, out_channels)
    if first_chunk:
        x = x[:, factor_t - 1:]
    return x


def _enc_stages(cfg: VAE38Config) -> List[Tuple[int, int, bool, bool]]:
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    out = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        t_down = cfg.temporal_downsample[i] if i < len(cfg.temporal_downsample) else False
        out.append((din, dout, t_down, i != len(cfg.dim_mult) - 1))
    return out


def _dec_stages(cfg: VAE38Config) -> List[Tuple[int, int, bool, bool]]:
    dims = [cfg.dec_dim * u for u in (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    out = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        t_up = cfg.temporal_upsample[i] if i < len(cfg.temporal_upsample) else False
        out.append((din, dout, t_up, i != len(cfg.dim_mult) - 1))
    return out


def encode(params: Dict, cfg: VAE38Config, video: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, 3), T=1+4k -> unscaled mu (B, 1+k, H/16, W/16, z)."""
    if video.shape[1] % 4 != 1:
        raise ValueError(f"encode expects T = 1+4k frames, got T={video.shape[1]}")
    x = pixel_patchify(video, cfg.patch_size)
    x = causal_conv3d(params["encoder"]["conv1"], x)
    for sp, (din, dout, t_down, down) in zip(params["encoder"]["stages"], _enc_stages(cfg)):
        shortcut = avg_down3d(x, 2 if (t_down and down) else 1, 2 if down else 1, dout)
        for rp in sp["res"]:
            x = residual_block(rp, x)
        if down:
            x = downsample_spatial(sp["resample"]["conv"], x)
            if t_down:
                x = downsample3d_time(sp["resample"]["time_conv"], x)
        x = x + shortcut
    x = residual_block(params["encoder"]["mid_res1"], x)
    x = attention_block(params["encoder"]["mid_attn"], x)
    x = residual_block(params["encoder"]["mid_res2"], x)
    x = causal_conv3d(params["encoder"]["head_conv"],
                      silu(spatial_norm(params["encoder"]["head_norm"], x)))
    moments = causal_conv3d(params["conv1"], x)
    return moments[..., : cfg.z_dim]


def decode(params: Dict, cfg: VAE38Config, z: jnp.ndarray) -> jnp.ndarray:
    """(B, L, h, w, z) -> (B, 4L-3, 16h, 16w, 3), unclamped."""
    x = causal_conv3d(params["conv2"], z)
    x = causal_conv3d(params["decoder"]["conv1"], x)
    x = residual_block(params["decoder"]["mid_res1"], x)
    x = attention_block(params["decoder"]["mid_attn"], x)
    x = residual_block(params["decoder"]["mid_res2"], x)
    for sp, (din, dout, t_up, up) in zip(params["decoder"]["stages"], _dec_stages(cfg)):
        shortcut = None
        if up:
            shortcut = dup_up3d(x, 2 if t_up else 1, 2, dout, first_chunk=True)
        h = x
        for rp in sp["res"]:
            h = residual_block(rp, h)
        if up:
            if t_up:
                h = upsample3d_time(sp["resample"]["time_conv"], h)
            h = _spatial(lambda u, pp=sp["resample"]["conv"]: conv2d(pp, _up2(u)), h)
            x = h + shortcut
        else:
            x = h
    x = causal_conv3d(params["decoder"]["head_conv"],
                      silu(spatial_norm(params["decoder"]["head_norm"], x)))
    return pixel_unpatchify(x, cfg.patch_size)


def latent_scale38(cfg: VAE38Config, dtype=jnp.float32):
    if cfg.z_dim == 48:
        return jnp.asarray(VAE38_MEAN, dtype), jnp.asarray(VAE38_STD, dtype)
    return jnp.zeros((cfg.z_dim,), dtype), jnp.ones((cfg.z_dim,), dtype)


def encode_video(params, cfg: VAE38Config, video):
    mu = encode(params, cfg, video)
    mean, std = latent_scale38(cfg, mu.dtype)
    return (mu - mean) / std


def decode_video(params, cfg: VAE38Config, latents):
    mean, std = latent_scale38(cfg, latents.dtype)
    return jnp.clip(decode(params, cfg, latents * std + mean), -1.0, 1.0)


# ---------------------------------------------------------------------------
# Init + torch conversion
# ---------------------------------------------------------------------------

def init_vae38(key, cfg: VAE38Config, dtype=jnp.float32) -> Dict:
    ks = iter(jax.random.split(key, 256))
    in_ch = 3 * cfg.patch_size**2

    def stage(din, dout, t_flag, flag, mult, decoder):
        res = []
        d = din
        for _ in range(mult):
            res.append(_init_res(next(ks), d, dout, dtype))
            d = dout
        sp = {"res": res}
        if flag:
            rs = {"conv": _init_conv2d(next(ks), 3, 3, dout, dout, dtype)}
            if t_flag:
                ch = dout * 2 if decoder else dout
                rs["time_conv"] = _init_conv3d(next(ks), 3, 1, 1, dout, ch, dtype)
            sp["resample"] = rs
        return sp

    top = cfg.dim * cfg.dim_mult[-1]
    dec_top = cfg.dec_dim * cfg.dim_mult[-1]
    enc = {
        "conv1": _init_conv3d(next(ks), 3, 3, 3, in_ch, cfg.dim, dtype),
        "stages": [stage(*s, cfg.num_res_blocks, False) for s in _enc_stages(cfg)],
        "mid_res1": _init_res(next(ks), top, top, dtype),
        "mid_attn": _init_attn_block(next(ks), top, dtype),
        "mid_res2": _init_res(next(ks), top, top, dtype),
        "head_norm": _init_norm(top, dtype),
        "head_conv": _init_conv3d(next(ks), 3, 3, 3, top, cfg.z_dim * 2, dtype),
    }
    dec = {
        "conv1": _init_conv3d(next(ks), 3, 3, 3, cfg.z_dim, dec_top, dtype),
        "mid_res1": _init_res(next(ks), dec_top, dec_top, dtype),
        "mid_attn": _init_attn_block(next(ks), dec_top, dtype),
        "mid_res2": _init_res(next(ks), dec_top, dec_top, dtype),
        "stages": [stage(*s, cfg.num_res_blocks + 1, True) for s in _dec_stages(cfg)],
        "head_norm": _init_norm(cfg.dec_dim, dtype),
        "head_conv": _init_conv3d(next(ks), 3, 3, 3, cfg.dec_dim, in_ch, dtype),
    }
    return {
        "encoder": enc,
        "decoder": dec,
        "conv1": _init_conv3d(next(ks), 1, 1, 1, cfg.z_dim * 2, cfg.z_dim * 2, dtype),
        "conv2": _init_conv3d(next(ks), 1, 1, 1, cfg.z_dim, cfg.z_dim, dtype),
    }


def vae38_params_from_torch(sd, cfg: VAE38Config) -> Dict:
    from goal_force_tpu.io.torch_convert import _conv2d, _conv3d, _vae_attn, _vae_norm, _vae_res

    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    def stage(prefix, t_flag, flag, mult):
        res = [_vae_res(sd, f"{prefix}.{'downsamples' if 'down' in prefix else 'upsamples'}.{j}")
               for j in range(mult)]
        sp = {"res": res}
        if flag:
            seq = "downsamples" if "down" in prefix else "upsamples"
            rp = f"{prefix}.{seq}.{mult}"
            rs = {"conv": _conv2d(sd, rp + ".resample.1")}
            if t_flag:
                rs["time_conv"] = _conv3d(sd, rp + ".time_conv")
            sp["resample"] = rs
        return sp

    enc = {
        "conv1": _conv3d(sd, "encoder.conv1"),
        "stages": [
            stage(f"encoder.downsamples.{i}", t, f, cfg.num_res_blocks)
            for i, (_, _, t, f) in enumerate(_enc_stages(cfg))
        ],
        "mid_res1": _vae_res(sd, "encoder.middle.0"),
        "mid_attn": _vae_attn(sd, "encoder.middle.1"),
        "mid_res2": _vae_res(sd, "encoder.middle.2"),
        "head_norm": _vae_norm(sd, "encoder.head.0"),
        "head_conv": _conv3d(sd, "encoder.head.2"),
    }
    dec = {
        "conv1": _conv3d(sd, "decoder.conv1"),
        "mid_res1": _vae_res(sd, "decoder.middle.0"),
        "mid_attn": _vae_attn(sd, "decoder.middle.1"),
        "mid_res2": _vae_res(sd, "decoder.middle.2"),
        "stages": [
            stage(f"decoder.upsamples.{i}", t, f, cfg.num_res_blocks + 1)
            for i, (_, _, t, f) in enumerate(_dec_stages(cfg))
        ],
        "head_norm": _vae_norm(sd, "decoder.head.0"),
        "head_conv": _conv3d(sd, "decoder.head.2"),
    }
    return {
        "encoder": enc,
        "decoder": dec,
        "conv1": _conv3d(sd, "conv1"),
        "conv2": _conv3d(sd, "conv2"),
    }
