"""StepVideo 3D VAE (version 2) as pure functions over param pytrees, NTHWC.

Architecture parity with /root/reference/diffsynth/models/stepvideo_vae.py:
- version-2 group norms are SPATIAL: per (batch, frame) stats over (H, W, C)
  (base_group_norm.spatial, :32-60, :924).
- Resnet3DBlock (:498-541): norm+silu, then 2 ZERO frames prepended in the
  post-activation domain, then a VALID-time conv with spatial padding 1
  (base_group_norm_with_zero_pad :405-411 + CausalConvAfterNorm :438-464).
- CausalConv (:226-259): zero-pads time by dilation*(k-1)+max(1-stride,0) in
  front, spatial SAME.
- AttnBlock (:466-496): single-head attention, token-level causal over the
  flattened (t, h, w) sequence.
- Encoder (:563-673): ch 32, mult (4, 8, 16, 16), Downsample2D at level 0
  (zero-pad bottom/right, stride-2 spatial conv per frame :198-222),
  Downsample3D (stride (2,2,2) causal conv) at levels 1-2; v2 head =
  spatial-norm+silu -> conv pixel-unshuffle patchify + channel-averaging
  shortcut -> conv_out + channel-averaging shortcut (:616-621, :658-666).
- Decoder (:757-867): v2 stem = conv_in + channel-duplicating shortcut ->
  conv pixel-shuffle unpatchify + duplicating shortcut (:779-784, :826-832);
  Upsample3D (nearest x2 over t,h,w + Res3DBlockUpsample :676-755) at levels
  2-3, Upsample2D at level 1; drops the first temporal_downsample-1=3 frames
  of the initial chunk (:865-866).
- StepVideoVAE (:908-1110): 17-frame chunks <-> 3 latent frames, encode
  returns a diagonal-Gaussian sample of the 2*64-channel moments (:878-905),
  decode smooths chunk seams with a 0.6/0.4 frame mix (:1014-1023).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class StepVideoVAEConfig:
    enc_ch: int = 32
    enc_mult: Tuple[int, ...] = (4, 8, 16, 16)
    dec_ch: int = 128
    dec_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_dim: int = 64
    groups: int = 32
    eps: float = 1e-6
    frame_len: int = 17
    latent_len: int = 3
    temporal_downsample: int = 4

    @property
    def enc_down3d_levels(self):
        return (1, 2)       # down_sampling_layer (:571)

    @property
    def dec_up3d_levels(self):
        return (2, 3)       # temporal_up_layers (:764)


def tiny_stepvideo_vae_config():
    # constraint: block_in * 8 must divide/exceed 4*z*8 for the channel
    # duplicating/averaging shortcuts (:273, :364)
    return StepVideoVAEConfig(enc_ch=8, enc_mult=(2, 2, 4, 4), dec_ch=16,
                              dec_mult=(1, 1, 2, 2), num_res_blocks=1,
                              z_dim=4, groups=4)


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def _spatial_gn(p, x, groups, eps, silu):
    """Per-frame group norm: stats over (H, W, C/g) for each (b, t) (:32-49)."""
    b, t, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b * t, h * w, groups, c // groups)
    mu = xf.mean((1, 3), keepdims=True)
    var = xf.var((1, 3), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    out = xf.reshape(b, t, h, w, c) * p["scale"] + p["bias"]
    if silu:
        out = jax.nn.silu(out)
    return out.astype(x.dtype)


def _conv3d(p, x, stride=(1, 1, 1), t_pad=0, sp_pad=0):
    """Weight (kt, kh, kw, Ci, Co); zero pads: t_pad in FRONT of time."""
    if t_pad or sp_pad:
        x = jnp.pad(x, [(0, 0), (t_pad, 0), (sp_pad, sp_pad), (sp_pad, sp_pad),
                        (0, 0)])
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), stride, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + p["b"].astype(x.dtype)


def causal_conv(p, x, stride=(1, 1, 1)):
    """CausalConv (:226-259): time front-pad k-1 (+ stride slack), spatial SAME."""
    kt, kh, _ = p["w"].shape[:3]
    t_pad = (kt - 1) + max(1 - stride[0], 0)
    return _conv3d(p, x, stride, t_pad=t_pad, sp_pad=kh // 2)


def _norm_pad_conv(norm_p, conv_p, x, groups, eps):
    """base_group_norm_with_zero_pad + CausalConvAfterNorm k3: norm+silu, two
    zero frames in front, VALID-time conv with spatial pad 1 (:405-411, :454-464)."""
    h = _spatial_gn(norm_p, x, groups, eps, silu=True)
    h = jnp.pad(h, [(0, 0), (2, 0), (0, 0), (0, 0), (0, 0)])
    return _conv3d(conv_p, h, t_pad=0, sp_pad=1)


def _linear1x1(p, x):
    return x @ p["w"][0, 0, 0].astype(x.dtype) + p["b"].astype(x.dtype)


def _resnet(p, x, cfg):
    """Resnet3DBlock (:527-541)."""
    h = _norm_pad_conv(p["norm1"], p["conv1"], x, cfg.groups, cfg.eps)
    if "shortcut" in p:
        x = _linear1x1(p["shortcut"], x)
    return x + _norm_pad_conv(p["norm2"], p["conv2"], h, cfg.groups, cfg.eps)


def _attn(p, x, cfg):
    """AttnBlock (:466-496): 1x1 qkv, token-causal over flattened (t h w)."""
    b, t, h, w, c = x.shape
    n = _spatial_gn(p["norm"], x, cfg.groups, cfg.eps, silu=False)
    q = _linear1x1(p["q"], n).reshape(b, t * h * w, c)
    k = _linear1x1(p["k"], n).reshape(b, t * h * w, c)
    v = _linear1x1(p["v"], n).reshape(b, t * h * w, c)
    logits = jnp.einsum("bqc,bkc->bqk", q, k) / math.sqrt(c)
    causal = jnp.tril(jnp.ones((t * h * w, t * h * w), bool))
    logits = jnp.where(causal[None], logits.astype(jnp.float32),
                       jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, -1).astype(x.dtype)
    att = jnp.einsum("bqk,bkc->bqc", probs, v).reshape(b, t, h, w, c)
    return x + _linear1x1(p["proj"], att)


def _down2d(p, x):
    """Downsample2D pad=0 path (:213-222): zero-pad bottom/right, stride 2."""
    b, t, h, w, c = x.shape
    y = jnp.pad(x.reshape(b * t, h, w, c), [(0, 0), (0, 1), (0, 1), (0, 0)])
    y = jax.lax.conv_general_dilated(
        y, p["w"].astype(x.dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + p["b"].astype(x.dtype)
    return y.reshape(b, t, *y.shape[1:])


def _up2d(p, x):
    """Upsample2D (:178-195): per-frame nearest x2 + conv k3 pad 1."""
    b, t, h, w, c = x.shape
    y = jax.image.resize(x, (b, t, 2 * h, 2 * w, c), "nearest")
    y = jnp.pad(y.reshape(b * t, 2 * h, 2 * w, c),
                [(0, 0), (1, 1), (1, 1), (0, 0)])
    y = jax.lax.conv_general_dilated(
        y, p["w"].astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + p["b"].astype(x.dtype)
    return y.reshape(b, t, *y.shape[1:])


def _res3d_upsample(p, x, cfg):
    """Res3DBlockUpsample (:706-727), identity-filter case."""
    residual = x
    h = causal_conv(p["conv1"], x)
    h = _spatial_gn(p["norm1"], h, cfg.groups, cfg.eps, silu=True)
    h = causal_conv(p["conv2"], h)
    h = _spatial_gn(p["norm2"], h, cfg.groups, cfg.eps, silu=False)
    return jax.nn.silu(h + x) + residual


def _up3d(p, x, cfg):
    """Upsample3D (:742-755): nearest x2 over (t, h, w) + Res3DBlockUpsample."""
    b, t, h, w, c = x.shape
    y = jax.image.resize(x, (b, 2 * t, 2 * h, 2 * w, c), "nearest")
    return _res3d_upsample(p["conv3d"], y, cfg)


def _pixel_unshuffle_3d(x, factor):
    """(:343-351): front time pad factor-1, space-to-channel (ft, fh, fw)."""
    x = jnp.pad(x, [(0, 0), (factor - 1, 0), (0, 0), (0, 0), (0, 0)])
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // factor, factor, h // factor, factor, w // factor,
                  factor, c)
    # torch layout is NC(D)(H)(W) with channel blocks (c, ft, fh, fw)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, t // factor, h // factor, w // factor,
                     c * factor ** 3)


def _pixel_shuffle_3d(x, factor):
    """(:306-318): channel-to-space (c, ft, fh, fw), drop first factor-1 frames."""
    b, t, h, w, c = x.shape
    nc = c // factor ** 3
    x = x.reshape(b, t, h, w, nc, factor, factor, factor)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    x = x.reshape(b, t * factor, h * factor, w * factor, nc)
    return x[:, factor - 1:]


def _channel_avg_down(x, out_channels, factor):
    """PixelUnshuffleChannelAveragingDownSampleLayer3D (:367-376)."""
    if factor > 1:
        x = _pixel_unshuffle_3d(x, factor)
    b, t, h, w, c = x.shape
    return x.reshape(b, t, h, w, out_channels, c // out_channels).mean(-1)


def _channel_dup_up(x, out_channels, factor):
    """ChannelDuplicatingPixelUnshuffleUpSampleLayer3D (:276-282)."""
    b, t, h, w, c = x.shape
    repeats = out_channels * factor ** 3 // c
    x = jnp.repeat(x, repeats, axis=-1)
    if factor == 1:
        return x
    x = x.reshape(b, t, h, w, out_channels, factor, factor, factor)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    x = x.reshape(b, t * factor, h * factor, w * factor, out_channels)
    return x[:, factor - 1:]


# ---------------------------------------------------------------------------
# Encoder / decoder
# ---------------------------------------------------------------------------

def stepvideo_encode_chunk(params: Dict, video: jnp.ndarray,
                           cfg: StepVideoVAEConfig) -> jnp.ndarray:
    """(B, 17, H, W, 3) -> (B, 3, H/16, W/16, 2*z) moments (VideoEncoder v2
    forward :626-673)."""
    x = causal_conv(params["conv_in"], video)
    n_lv = len(cfg.enc_mult)
    for i in range(n_lv):
        for bp in params["down"][i]["blocks"]:
            x = _resnet(bp, x, cfg)
        if i != n_lv - 1:
            if i in cfg.enc_down3d_levels:
                x = causal_conv(params["down"][i]["downsample"], x,
                                stride=(2, 2, 2))
            else:
                x = _down2d(params["down"][i]["downsample"], x)
    x = _resnet(params["mid_block1"], x, cfg)
    x = _attn(params["mid_attn"], x, cfg)
    x = _resnet(params["mid_block2"], x, cfg)

    x = _spatial_gn(params["norm_out"], x, cfg.groups, cfg.eps, silu=True)
    channels = 4 * cfg.z_dim * 8
    short = _channel_avg_down(x, channels, 2)
    x = causal_conv(params["conv_patchify"], x)
    x = _pixel_unshuffle_3d(x, 2) + short
    short = _channel_avg_down(x, 2 * cfg.z_dim, 1)
    x = causal_conv(params["conv_out"], x) + short
    return x


def stepvideo_decode_chunk(params: Dict, z: jnp.ndarray,
                           cfg: StepVideoVAEConfig) -> jnp.ndarray:
    """(B, 3, h, w, z) -> (B, 17, 16h, 16w, 3) (VideoDecoder v2 forward
    :822-867)."""
    channels = 4 * cfg.z_dim * 8
    block_in = cfg.dec_ch * cfg.dec_mult[-1]
    x = causal_conv(params["conv_in"], z) + _channel_dup_up(z, channels, 1)
    short = _channel_dup_up(x, block_in, 2)
    x = causal_conv(params["conv_unpatchify"], x)
    x = _pixel_shuffle_3d(x, 2) + short

    x = _resnet(params["mid_block1"], x, cfg)
    x = _attn(params["mid_attn"], x, cfg)
    x = _resnet(params["mid_block2"], x, cfg)

    n_lv = len(cfg.dec_mult)
    for i in reversed(range(n_lv)):
        for bp in params["up"][i]["blocks"]:
            x = _resnet(bp, x, cfg)
        if i != 0:
            if i in cfg.dec_up3d_levels:
                x = _up3d(params["up"][i]["upsample"], x, cfg)
            else:
                x = _up2d(params["up"][i]["upsample"], x)

    x = _spatial_gn(params["norm_out"], x, cfg.groups, cfg.eps, silu=True)
    x = jnp.pad(x, [(0, 0), (2, 0), (0, 0), (0, 0), (0, 0)])
    x = _conv3d(params["conv_out"], x, t_pad=0, sp_pad=1)
    return x[:, cfg.temporal_downsample - 1:]


def stepvideo_vae_encode(params: Dict, video: jnp.ndarray,
                         cfg: StepVideoVAEConfig = StepVideoVAEConfig(),
                         key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Chunked encode (:972-981): 17-frame chunks, diagonal Gaussian; returns
    the mean when key is None, otherwise a sample."""
    chunks = []
    for t0 in range(0, video.shape[1], cfg.frame_len):
        moments = stepvideo_encode_chunk(
            params["encoder"], video[:, t0:t0 + cfg.frame_len], cfg)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if key is not None:
            key, sub = jax.random.split(key)
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(sub, mean.shape, mean.dtype)
        chunks.append(mean)
    return jnp.concatenate(chunks, axis=1)


def stepvideo_vae_decode(params: Dict, latents: jnp.ndarray,
                         cfg: StepVideoVAEConfig = StepVideoVAEConfig(),
                         smooth_scale: float = 0.6) -> jnp.ndarray:
    """Chunked decode + seam mix (:1025-1030, :1014-1023)."""
    chunks = [stepvideo_decode_chunk(params["decoder"],
                                     latents[:, t0:t0 + cfg.latent_len], cfg)
              for t0 in range(0, latents.shape[1], cfg.latent_len)]
    x = jnp.concatenate(chunks, axis=1)
    if x.shape[1] > cfg.frame_len:
        front = x[:, cfg.frame_len - 1:-1:cfg.frame_len]
        back = x[:, cfg.frame_len::cfg.frame_len]
        mixed_f = front * smooth_scale + back * (1 - smooth_scale)
        mixed_b = back * smooth_scale + front * (1 - smooth_scale)
        x = x.at[:, cfg.frame_len - 1:-1:cfg.frame_len].set(mixed_f)
        x = x.at[:, cfg.frame_len::cfg.frame_len].set(mixed_b)
    return x


def stepvideo_vae_decode_tiled(params: Dict, latents: jnp.ndarray,
                               cfg: StepVideoVAEConfig = StepVideoVAEConfig(),
                               tile_size=(34, 34), tile_stride=(16, 16)
                               ) -> jnp.ndarray:
    """Reference StepVideoVAE.tiled_decode (:1052-1101): per latent-chunk
    (latent_len frames) x spatial tile, border-ramp blend with border width
    (size - stride) * spatial_factor pixels. Like the reference, the tiled
    path does not apply the chunk-seam smooth mix."""
    from goal_force_tpu.models.vae import _blend_mask_1d

    B, T, H, W, _ = latents.shape
    sh, sw = tile_size
    rh, rw = tile_stride
    dec = jax.jit(lambda z: stepvideo_decode_chunk(params["decoder"], z, cfg))

    values = weight = None
    f = None
    for t0 in range(0, T, cfg.latent_len):
        for h0 in range(0, H, rh):
            if h0 - rh >= 0 and h0 - rh + sh >= H:
                continue
            for w0 in range(0, W, rw):
                if w0 - rw >= 0 and w0 - rw + sw >= W:
                    continue
                out = dec(latents[:, t0:t0 + cfg.latent_len,
                                  h0:min(h0 + sh, H),
                                  w0:min(w0 + sw, W)]).astype(jnp.float32)
                if values is None:
                    f = out.shape[2] // min(sh, H)
                    oT = T // cfg.latent_len * cfg.frame_len
                    values = jnp.zeros((B, oT, H * f, W * f, 3), jnp.float32)
                    weight = jnp.zeros((1, oT, H * f, W * f, 1), jnp.float32)
                mh = _blend_mask_1d(out.shape[2], h0 == 0, h0 + sh >= H,
                                    max((sh - rh) * f, 1))
                mw = _blend_mask_1d(out.shape[3], w0 == 0, w0 + sw >= W,
                                    max((sw - rw) * f, 1))
                mask = jnp.asarray(
                    np.minimum(mh[:, None], mw[None, :])
                    [None, None, :, :, None])
                tt, th, tw = t0 // cfg.latent_len * cfg.frame_len, h0 * f, w0 * f
                values = values.at[:, tt:tt + out.shape[1],
                                   th:th + out.shape[2],
                                   tw:tw + out.shape[3]].add(out * mask)
                weight = weight.at[:, tt:tt + out.shape[1],
                                   th:th + out.shape[2],
                                   tw:tw + out.shape[3]].add(mask)
    return values / weight


# ---------------------------------------------------------------------------
# Init + converter (reference naming, StepVideoVAE state dict :1124-1131)
# ---------------------------------------------------------------------------

def _c3(sd, pre):
    return {"w": jnp.asarray(np.asarray(sd[pre + ".weight"])
                             .transpose(2, 3, 4, 1, 0)),
            "b": jnp.asarray(np.asarray(sd[pre + ".bias"]))}


def _c2(sd, pre):
    return {"w": jnp.asarray(np.asarray(sd[pre + ".weight"])
                             .transpose(2, 3, 1, 0)),
            "b": jnp.asarray(np.asarray(sd[pre + ".bias"]))}


def _nrm(sd, pre):
    return {"scale": jnp.asarray(np.asarray(sd[pre + ".weight"])),
            "bias": jnp.asarray(np.asarray(sd[pre + ".bias"]))}


def _res_from(sd, pre):
    p = {"norm1": _nrm(sd, pre + ".norm1"), "conv1": _c3(sd, pre + ".conv1.conv"),
         "norm2": _nrm(sd, pre + ".norm2"), "conv2": _c3(sd, pre + ".conv2.conv")}
    if pre + ".nin_shortcut.conv.weight" in sd:
        p["shortcut"] = _c3(sd, pre + ".nin_shortcut.conv")
    return p


def _attn_from(sd, pre):
    return {"norm": _nrm(sd, pre + ".norm"),
            "q": _c3(sd, pre + ".q.conv"), "k": _c3(sd, pre + ".k.conv"),
            "v": _c3(sd, pre + ".v.conv"),
            "proj": _c3(sd, pre + ".proj_out.conv")}


def stepvideo_vae_params_from_torch(sd, cfg: StepVideoVAEConfig
                                    = StepVideoVAEConfig()) -> Dict:
    n_enc, n_dec = len(cfg.enc_mult), len(cfg.dec_mult)
    enc_down = []
    for i in range(n_enc):
        lvl = {"blocks": [_res_from(sd, f"encoder.down.{i}.block.{j}")
                          for j in range(cfg.num_res_blocks)]}
        if i != n_enc - 1:
            if i in cfg.enc_down3d_levels:
                lvl["downsample"] = _c3(sd, f"encoder.down.{i}.downsample.conv.conv")
            else:
                lvl["downsample"] = _c2(sd, f"encoder.down.{i}.downsample.conv")
        enc_down.append(lvl)
    encoder = {
        "conv_in": _c3(sd, "encoder.conv_in.conv"),
        "down": enc_down,
        "mid_block1": _res_from(sd, "encoder.mid.block_1"),
        "mid_attn": _attn_from(sd, "encoder.mid.attn_1"),
        "mid_block2": _res_from(sd, "encoder.mid.block_2"),
        "norm_out": _nrm(sd, "encoder.norm_out"),
        "conv_patchify": _c3(sd, "encoder.conv_patchify.conv.conv"),
        "conv_out": _c3(sd, "encoder.conv_out.conv"),
    }
    dec_up = []
    for i in range(n_dec):
        lvl = {"blocks": [_res_from(sd, f"decoder.up.{i}.block.{j}")
                          for j in range(cfg.num_res_blocks + 1)]}
        if i != 0:
            if i in cfg.dec_up3d_levels:
                pre = f"decoder.up.{i}.upsample.conv3d"
                lvl["upsample"] = {"conv3d": {
                    "conv1": _c3(sd, pre + ".conv1.conv"),
                    "norm1": _nrm(sd, pre + ".norm1"),
                    "conv2": _c3(sd, pre + ".conv2.conv"),
                    "norm2": _nrm(sd, pre + ".norm2")}}
            else:
                lvl["upsample"] = _c2(sd, f"decoder.up.{i}.upsample.conv")
        dec_up.append(lvl)
    decoder = {
        "conv_in": _c3(sd, "decoder.conv_in.conv"),
        "conv_unpatchify": _c3(sd, "decoder.conv_unpatchify.conv.conv"),
        "mid_block1": _res_from(sd, "decoder.mid.block_1"),
        "mid_attn": _attn_from(sd, "decoder.mid.attn_1"),
        "mid_block2": _res_from(sd, "decoder.mid.block_2"),
        "up": dec_up,
        "norm_out": _nrm(sd, "decoder.norm_out"),
        "conv_out": _c3(sd, "decoder.conv_out.conv"),
    }
    return {"encoder": encoder, "decoder": decoder}
