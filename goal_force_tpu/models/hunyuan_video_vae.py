"""HunyuanVideo 3D causal VAE (16ch, spatial 8x, temporal 4x), JAX / NTHWC.

Architecture parity with /root/reference/diffsynth/models/
hunyuan_video_vae_encoder.py and hunyuan_video_vae_decoder.py:
CausalConv3d with REPLICATE padding (k-1 leading frames, k//2 spatial — :10-21),
DownsampleCausal3D (strided causal conv), UpsampleCausal3D (nearest upsample that
leaves frame 0 un-repeated in time, :24-61), ResnetBlockCausal3D (:64-106),
UNetMidBlockCausal3D with a single-head attention over ALL (T,H,W) tokens under a
frame-causal mask (:109-214), the [128,256,512,512] encoder/decoder stacks with
spatial downsamples on the first 3 levels and temporal on levels 1..2
(:85-167 enc / :267-330 dec), scaling factor 0.476986, and the overlap-blend
tile_forward for both directions (:208-295 enc / :409-505 dec).
"""

from __future__ import annotations

import functools

import dataclasses
import math
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HunyuanVAEConfig:
    in_channels: int = 3
    z_dim: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    num_groups: int = 32
    eps: float = 1e-6
    time_ratio: int = 4
    spatial_ratio: int = 8
    scaling_factor: float = 0.476986


def tiny_hunyuan_vae_config():
    return HunyuanVAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                            num_groups=4)


# ---------------------------------------------------------------------------
# Primitives (NTHWC)
# ---------------------------------------------------------------------------

def _group_norm_3d(p, x, groups, eps):
    b, t, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t * h * w, groups, c // groups)
    mu = xf.mean((1, 3), keepdims=True)
    var = xf.var((1, 3), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xf.reshape(b, t, h, w, c) * p["scale"] + p["bias"]).astype(x.dtype)


def causal_conv3d(p, x, stride=(1, 1, 1)):
    """CausalConv3d (:10-21): REPLICATE pad — (k-1, 0) in time, (k//2, k//2)
    spatially. Weight stored (kt, kh, kw, Ci, Co)."""
    kt, kh, kw = p["w"].shape[:3]
    pads = [(0, 0), (kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)]
    x = jnp.pad(x, pads, mode="edge")
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), stride, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + p["b"].astype(x.dtype)


def _resnet(p, x, cfg):
    h = jax.nn.silu(_group_norm_3d(p["norm1"], x, cfg.num_groups, cfg.eps))
    h = causal_conv3d(p["conv1"], h)
    h = jax.nn.silu(_group_norm_3d(p["norm2"], h, cfg.num_groups, cfg.eps))
    h = causal_conv3d(p["conv2"], h)
    if "shortcut" in p:
        x = causal_conv3d(p["shortcut"], x)
    return x + h


def _mid_attention(p, x, cfg):
    """Single-head attention over all tokens with a frame-causal mask (:109-214)."""
    b, t, h, w, c = x.shape
    tokens = _group_norm_3d(p["norm"], x, cfg.num_groups, cfg.eps).reshape(
        b, t * h * w, c)
    q = tokens @ p["q_w"] + p["q_b"]
    k = tokens @ p["k_w"] + p["k_b"]
    v = tokens @ p["v_w"] + p["v_b"]
    scale = 1.0 / math.sqrt(c)
    logits = jnp.einsum("bqc,bkc->bqk", q, k) * scale
    frame = jnp.arange(t * h * w) // (h * w)
    ok = frame[None, :] <= frame[:, None]
    logits = jnp.where(ok[None], logits.astype(jnp.float32),
                       jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, -1).astype(x.dtype)
    out = jnp.einsum("bqk,bkc->bqc", probs, v)
    out = out @ p["o_w"] + p["o_b"]
    return x + out.reshape(b, t, h, w, c)


def _mid_block(p, x, cfg):
    x = _resnet(p["resnets"][0], x, cfg)
    for attn, res in zip(p["attentions"], p["resnets"][1:]):
        x = _mid_attention(attn, x, cfg)
        x = _resnet(res, x, cfg)
    return x


def _upsample(p, x, factor):
    """UpsampleCausal3D (:24-61): frame 0 only spatially upsampled; the rest get
    the full (t, h, w) nearest scale."""
    b, t, h, w, c = x.shape
    ft, fh, fw = factor
    first = jax.image.resize(x[:, :1], (b, 1, h * fh, w * fw, c), "nearest")
    if t > 1:
        rest = jax.image.resize(x[:, 1:], (b, (t - 1) * ft, h * fh, w * fw, c),
                                "nearest")
        x = jnp.concatenate([first, rest], axis=1)
    else:
        x = first
    return causal_conv3d(p["conv"], x)


def _stage_plan(cfg: HunyuanVAEConfig):
    """Per-level (out_channels, (stride_t, stride_hw)) following the reference's
    add_spatial/add_time rules (:88-111 enc, :283-305 dec)."""
    n = len(cfg.block_out_channels)
    n_sp = int(math.log2(cfg.spatial_ratio))
    n_t = int(math.log2(cfg.time_ratio))
    plan = []
    for i in range(n):
        is_final = i == n - 1
        sp = i < n_sp
        tm = (i >= n - 1 - n_t) and not is_final
        plan.append((cfg.block_out_channels[i], sp, tm))
    return plan


def hunyuan_vae_encode(params: Dict, video: jnp.ndarray,
                       cfg: HunyuanVAEConfig = HunyuanVAEConfig()) -> jnp.ndarray:
    """(B, T, H, W, 3) in [-1, 1] -> (B, (T-1)//4+1, H/8, W/8, 16) scaled means."""
    x = causal_conv3d(params["conv_in"], video)
    for blk, (_, sp, tm) in zip(params["down_blocks"], _stage_plan(cfg)):
        for res in blk["resnets"]:
            x = _resnet(res, x, cfg)
        if "down" in blk:
            stride = (2 if tm else 1, 2 if sp else 1, 2 if sp else 1)
            x = causal_conv3d(blk["down"], x, stride)
    x = _mid_block(params["mid"], x, cfg)
    x = jax.nn.silu(_group_norm_3d(params["conv_norm_out"], x, cfg.num_groups,
                                   cfg.eps))
    x = causal_conv3d(params["conv_out"], x)
    # quant_conv is a plain (non-causal) 1x1x1 Conv3d (:201)
    x = x @ params["quant_conv"]["w"] + params["quant_conv"]["b"]
    return x[..., :cfg.z_dim] * cfg.scaling_factor


def hunyuan_vae_decode(params: Dict, latents: jnp.ndarray,
                       cfg: HunyuanVAEConfig = HunyuanVAEConfig()) -> jnp.ndarray:
    """(B, lt, h, w, 16) -> (B, (lt-1)*4+1, 8h, 8w, 3)."""
    x = latents / cfg.scaling_factor
    # post_quant_conv: plain 1x1x1 Conv3d (decoder :395-404)
    x = x @ params["post_quant_conv"]["w"] + params["post_quant_conv"]["b"]
    x = causal_conv3d(params["conv_in"], x)
    x = _mid_block(params["mid"], x, cfg)
    plan = list(reversed(_stage_plan(cfg)))
    # decoder upsample placement (:283-305): spatial on first 3 up levels,
    # temporal on levels holding the time compression; recomputed directly:
    n = len(cfg.block_out_channels)
    n_sp = int(math.log2(cfg.spatial_ratio))
    n_t = int(math.log2(cfg.time_ratio))
    for i, blk in enumerate(params["up_blocks"]):
        for res in blk["resnets"]:
            x = _resnet(res, x, cfg)
        if "up" in blk:
            sp = i < n_sp
            tm = (i >= n - 1 - n_t) and i != n - 1
            x = _upsample(blk["up"], x, (2 if tm else 1, 2 if sp else 1,
                                         2 if sp else 1))
    x = jax.nn.silu(_group_norm_3d(params["conv_norm_out"], x, cfg.num_groups,
                                   cfg.eps))
    return causal_conv3d(params["conv_out"], x)


# ---------------------------------------------------------------------------
# Tiled encode/decode (overlap-blend, reference tile_forward)
# ---------------------------------------------------------------------------

def _blend_mask(shape, is_bound, border):
    def ramp(n, left_b, right_b, bw):
        m = np.ones((n,), np.float32)
        bw = max(1, min(bw, n))
        if not left_b:
            m[:bw] = (np.arange(bw) + 1) / bw
        if not right_b:
            m[-bw:] = np.flip((np.arange(bw) + 1) / bw)
        return m

    t, h, w = shape
    mt = ramp(t, is_bound[0], is_bound[1], border[0])
    mh = ramp(h, is_bound[2], is_bound[3], border[1])
    mw = ramp(w, is_bound[4], is_bound[5], border[2])
    return np.minimum.reduce(np.broadcast_arrays(
        mt[:, None, None], mh[None, :, None], mw[None, None, :]))[..., None]


@functools.lru_cache(maxsize=8)
def _jit_hv_encode(cfg):
    return jax.jit(lambda p, tile: hunyuan_vae_encode(p, tile, cfg))


@functools.lru_cache(maxsize=8)
def _jit_hv_decode(cfg):
    return jax.jit(lambda p, tile: hunyuan_vae_decode(p, tile, cfg))


def hunyuan_vae_encode_tiled(params, video, cfg=HunyuanVAEConfig(),
                             tile_size=(65, 256, 256), tile_stride=(48, 192, 192)):
    """Reference encode_video/tile_forward (:208-295): overlap-blend in latent
    space; temporally-overlapping tiles drop their first latent frame."""
    b, T, H, W, _ = video.shape
    st, sh, sw = tile_size
    rt, rh, rw = tile_stride
    lt = (T - 1) // 4 + 1
    values = np.zeros((b, lt, H // 8, W // 8, cfg.z_dim), np.float32)
    weight = np.zeros((1, lt, H // 8, W // 8, 1), np.float32)
    for t0 in range(0, T, rt):
        if t0 - rt >= 0 and t0 - rt + st >= T:
            continue
        for h0 in range(0, H, rh):
            if h0 - rh >= 0 and h0 - rh + sh >= H:
                continue
            for w0 in range(0, W, rw):
                if w0 - rw >= 0 and w0 - rw + sw >= W:
                    continue
                tile = video[:, t0:t0 + st, h0:h0 + sh, w0:w0 + sw]
                z = np.asarray(_jit_hv_encode(cfg)(params, tile), np.float32)  # jitted per tile shape
                if t0 > 0:
                    z = z[:, 1:]
                mask = _blend_mask(
                    z.shape[1:4],
                    (t0 == 0, t0 + st >= T, h0 == 0, h0 + sh >= H,
                     w0 == 0, w0 + sw >= W),
                    ((st - rt) // 4, (sh - rh) // 8, (sw - rw) // 8))
                tt = 0 if t0 == 0 else t0 // 4 + 1
                th, tw = h0 // 8, w0 // 8
                values[:, tt:tt + z.shape[1], th:th + z.shape[2],
                       tw:tw + z.shape[3]] += z * mask
                weight[:, tt:tt + z.shape[1], th:th + z.shape[2],
                       tw:tw + z.shape[3]] += mask
    return values / weight


def hunyuan_vae_decode_tiled(params, latents, cfg=HunyuanVAEConfig(),
                             tile_size=(17, 32, 32), tile_stride=(12, 24, 24)):
    b, LT, LH, LW, _ = latents.shape
    st, sh, sw = tile_size
    rt, rh, rw = tile_stride
    T = (LT - 1) * 4 + 1
    values = np.zeros((b, T, LH * 8, LW * 8, 3), np.float32)
    weight = np.zeros((1, T, LH * 8, LW * 8, 1), np.float32)
    for t0 in range(0, LT, rt):
        if t0 - rt >= 0 and t0 - rt + st >= LT:
            continue
        for h0 in range(0, LH, rh):
            if h0 - rh >= 0 and h0 - rh + sh >= LH:
                continue
            for w0 in range(0, LW, rw):
                if w0 - rw >= 0 and w0 - rw + sw >= LW:
                    continue
                tile = latents[:, t0:t0 + st, h0:h0 + sh, w0:w0 + sw]
                xf = np.asarray(_jit_hv_decode(cfg)(params, tile), np.float32)
                if t0 > 0:
                    xf = xf[:, 1:]
                mask = _blend_mask(
                    xf.shape[1:4],
                    (t0 == 0, t0 + st >= LT, h0 == 0, h0 + sh >= LH,
                     w0 == 0, w0 + sw >= LW),
                    ((st - rt) * 4, (sh - rh) * 8, (sw - rw) * 8))
                tt = 0 if t0 == 0 else t0 * 4 + 1
                th, tw = h0 * 8, w0 * 8
                values[:, tt:tt + xf.shape[1], th:th + xf.shape[2],
                       tw:tw + xf.shape[3]] += xf * mask
                weight[:, tt:tt + xf.shape[1], th:th + xf.shape[2],
                       tw:tw + xf.shape[3]] += mask
    return values / weight


# ---------------------------------------------------------------------------
# Converter + init
# ---------------------------------------------------------------------------

def _conv3(sd, pre):
    w = np.asarray(sd[pre + ".conv.weight"])   # (Co, Ci, kt, kh, kw)
    return {"w": np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0)),
            "b": np.asarray(sd[pre + ".conv.bias"])}


def _norm(sd, pre):
    return {"scale": np.asarray(sd[pre + ".weight"]),
            "bias": np.asarray(sd[pre + ".bias"])}


def _res_from_torch(sd, pre):
    p = {"norm1": _norm(sd, pre + ".norm1"), "conv1": _conv3(sd, pre + ".conv1"),
         "norm2": _norm(sd, pre + ".norm2"), "conv2": _conv3(sd, pre + ".conv2")}
    if pre + ".conv_shortcut.conv.weight" in sd:
        p["shortcut"] = _conv3(sd, pre + ".conv_shortcut")
    return p


def _mid_from_torch(sd, pre):
    resnets, attns = [], []
    i = 0
    while f"{pre}.resnets.{i}.norm1.weight" in sd:
        resnets.append(_res_from_torch(sd, f"{pre}.resnets.{i}"))
        i += 1
    i = 0
    while f"{pre}.attentions.{i}.group_norm.weight" in sd:
        a = f"{pre}.attentions.{i}"
        g = lambda k: np.asarray(sd[f"{a}.{k}"])
        attns.append({
            "norm": _norm(sd, a + ".group_norm"),
            "q_w": g("to_q.weight").T, "q_b": g("to_q.bias"),
            "k_w": g("to_k.weight").T, "k_b": g("to_k.bias"),
            "v_w": g("to_v.weight").T, "v_b": g("to_v.bias"),
            "o_w": g("to_out.0.weight").T, "o_b": g("to_out.0.bias"),
        })
        i += 1
    return {"resnets": resnets, "attentions": attns}


def hunyuan_vae_encoder_params_from_torch(sd, cfg=HunyuanVAEConfig()) -> Dict:
    """Reference HunyuanVideoVAEEncoder state dict (encoder.* + quant_conv)."""
    down = []
    for i in range(len(cfg.block_out_channels)):
        pre = f"encoder.down_blocks.{i}"
        resnets = [_res_from_torch(sd, f"{pre}.resnets.{j}")
                   for j in range(cfg.layers_per_block)]
        blk = {"resnets": resnets}
        if f"{pre}.downsamplers.0.conv.conv.weight" in sd:
            blk["down"] = _conv3(sd, f"{pre}.downsamplers.0.conv")
        down.append(blk)
    qw = np.asarray(sd["quant_conv.weight"])    # (C, C, 1, 1, 1)
    return {
        "conv_in": _conv3(sd, "encoder.conv_in"),
        "down_blocks": down,
        "mid": _mid_from_torch(sd, "encoder.mid_block"),
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv3(sd, "encoder.conv_out"),
        "quant_conv": {"w": qw[:, :, 0, 0, 0].T,
                       "b": np.asarray(sd["quant_conv.bias"])},
    }


def hunyuan_vae_decoder_params_from_torch(sd, cfg=HunyuanVAEConfig()) -> Dict:
    up = []
    for i in range(len(cfg.block_out_channels)):
        pre = f"decoder.up_blocks.{i}"
        resnets = [_res_from_torch(sd, f"{pre}.resnets.{j}")
                   for j in range(cfg.layers_per_block + 1)]
        blk = {"resnets": resnets}
        if f"{pre}.upsamplers.0.conv.conv.weight" in sd:
            blk["up"] = {"conv": _conv3(sd, f"{pre}.upsamplers.0.conv")}
        up.append(blk)
    pqw = np.asarray(sd["post_quant_conv.weight"])
    return {
        "post_quant_conv": {"w": pqw[:, :, 0, 0, 0].T,
                            "b": np.asarray(sd["post_quant_conv.bias"])},
        "conv_in": _conv3(sd, "decoder.conv_in"),
        "mid": _mid_from_torch(sd, "decoder.mid_block"),
        "up_blocks": up,
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv3(sd, "decoder.conv_out"),
    }
