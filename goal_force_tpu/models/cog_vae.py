"""CogVideoX 3D VAE as pure functions over param pytrees, NTHWC.

Architecture parity with /root/reference/diffsynth/models/cog_vae.py:
- CachedConv3d (:169-185): kernel-3 time conv whose 2-frame cache across chunks
  equals, over the full sequence, a causal conv with the first frame REPLICATED
  twice in front; spatial padding is zeros. We run the full sequence in one jit
  (TPU-first: one fused XLA program instead of a host chunk loop) — this is
  bit-equivalent to the reference's chunked evaluation because chunk boundaries
  are even and every temporal resample special-cases the odd first frame.
- Downsample3D (:7-53): odd sequences keep frame 0 and avg-pool the rest in
  pairs; then zero-pad right/bottom by 1 and stride-2 spatial conv per frame.
- Upsample3D (:57-99): odd sequences upsample frame 0 spatially only and
  nearest-×2 the rest in (t, h, w); then spatial conv per frame.
- CogVideoXSpatialNorm3D (:103-124): groupnorm modulated by 1x1 convs of the
  nearest-resized latent zq (odd first frame resized separately).
- Resnet3DBlock (:128-165), CogVAEDecoder (:189-235, scaling 0.7, latent 16),
  CogVAEEncoder (:278-320, 32-channel conv_out sliced to the 16 moments' mean).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CogVAEConfig:
    """Channel ladder of the 4-level CogVideoX VAE (reference :195-217, 284-302)."""

    channels: Tuple[int, ...] = (128, 256, 256, 512)
    latent_dim: int = 16
    scaling: float = 0.7
    groups: int = 32
    eps: float = 1e-6


def tiny_cog_vae_config():
    return CogVAEConfig(channels=(8, 8, 16, 16), latent_dim=4, groups=4)


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def _group_norm_3d(p, x, groups, eps):
    b, t, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t * h * w, groups, c // groups)
    mu = xf.mean((1, 3), keepdims=True)
    var = xf.var((1, 3), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xf.reshape(b, t, h, w, c) * p["scale"] + p["bias"]).astype(x.dtype)


def _cog_conv3d(p, x):
    """CachedConv3d over the full sequence: EDGE pad (kt-1, 0) in time (the
    first-call cache replicates frame 0 twice, :181-184), ZERO pad spatially
    (Conv3d padding=(0, 1, 1)). Weight (kt, kh, kw, Ci, Co)."""
    kt, kh, kw = p["w"].shape[:3]
    x = jnp.pad(x, [(0, 0), (kt - 1, 0), (0, 0), (0, 0), (0, 0)], mode="edge")
    x = jnp.pad(x, [(0, 0), (0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2),
                    (0, 0)])
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + p["b"].astype(x.dtype)


def _conv1x1_3d(p, x):
    return x @ p["w"][0, 0, 0].astype(x.dtype) + p["b"].astype(x.dtype)


def _conv2d_frames(p, x, stride=1):
    """Per-frame spatial conv, weight (kh, kw, Ci, Co); padding done by caller."""
    b, t, h, w, c = x.shape
    y = jax.lax.conv_general_dilated(
        x.reshape(b * t, h, w, c), p["w"].astype(x.dtype), (stride, stride),
        "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(b, t, *y.shape[1:]) + p["b"].astype(x.dtype)


def _nearest(x, shape):
    return jax.image.resize(x, shape, "nearest")


def _resize_time_split(z, t_out, h, w):
    """Nearest-resize z to (t_out, h, w) with the reference's odd-first-frame
    split (:112-120) so every ratio stays integral."""
    b, tz, _, _, c = z.shape
    if t_out > 1 and t_out % 2 == 1:
        zf = _nearest(z[:, :1], (b, 1, h, w, c))
        zr = _nearest(z[:, 1:], (b, t_out - 1, h, w, c))
        return jnp.concatenate([zf, zr], axis=1)
    return _nearest(z, (b, t_out, h, w, c))


def _spatial_norm(p, f, zq, groups, eps):
    """CogVideoXSpatialNorm3D (:103-124)."""
    b, t, h, w, c = f.shape
    z = _resize_time_split(zq, t, h, w)
    nf = _group_norm_3d(p["norm_layer"], f, groups, eps)
    return nf * _conv1x1_3d(p["conv_y"], z) + _conv1x1_3d(p["conv_b"], z)


def _resnet(p, x, zq, cfg: CogVAEConfig):
    """Resnet3DBlock (:128-165); zq=None -> plain groupnorm (encoder)."""
    norm = (lambda q, v: _spatial_norm(q, v, zq, cfg.groups, cfg.eps)) \
        if zq is not None else \
        (lambda q, v: _group_norm_3d(q, v, cfg.groups, cfg.eps))
    h = jax.nn.silu(norm(p["norm1"], x))
    h = _cog_conv3d(p["conv1"], h)
    h = jax.nn.silu(norm(p["norm2"], h))
    h = _cog_conv3d(p["conv2"], h)
    if "shortcut" in p:
        x = _conv1x1_3d(p["shortcut"], x)
    return x + h


def _downsample(p, x, compress_time: bool):
    """Downsample3D (:7-53)."""
    b, t, h, w, c = x.shape
    if compress_time:
        if t % 2 == 1 and t > 1:
            first, rest = x[:, :1], x[:, 1:]
            rest = rest.reshape(b, (t - 1) // 2, 2, h, w, c).mean(axis=2)
            x = jnp.concatenate([first, rest], axis=1)
        elif t % 2 == 0:
            x = x.reshape(b, t // 2, 2, h, w, c).mean(axis=2)
    x = jnp.pad(x, [(0, 0), (0, 0), (0, 1), (0, 1), (0, 0)])
    return _conv2d_frames(p, x, stride=2)


def _upsample(p, x, compress_time: bool):
    """Upsample3D (:57-99)."""
    b, t, h, w, c = x.shape
    if compress_time:
        if t > 1 and t % 2 == 1:
            first = _nearest(x[:, :1], (b, 1, 2 * h, 2 * w, c))
            rest = _nearest(x[:, 1:], (b, 2 * (t - 1), 2 * h, 2 * w, c))
            x = jnp.concatenate([first, rest], axis=1)
        elif t > 1:
            x = _nearest(x, (b, 2 * t, 2 * h, 2 * w, c))
        else:
            x = _nearest(x, (b, 1, 2 * h, 2 * w, c))
    else:
        x = _nearest(x, (b, t, 2 * h, 2 * w, c))
    x = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])
    return _conv2d_frames(p, x, stride=1)


# ---------------------------------------------------------------------------
# Plans (reference block lists :195-217 decoder, :284-302 encoder)
# ---------------------------------------------------------------------------

def cog_decoder_plan(cfg: CogVAEConfig):
    c0, c1, c2, c3 = cfg.channels
    return (
        [("res", c3, c3)] * 6 + [("up", c3, True)]
        + [("res", c3, c2)] + [("res", c2, c2)] * 3 + [("up", c2, True)]
        + [("res", c2, c2)] * 4 + [("up", c2, False)]
        + [("res", c2, c0)] + [("res", c0, c0)] * 3
    )


def cog_encoder_plan(cfg: CogVAEConfig):
    c0, c1, c2, c3 = cfg.channels
    return (
        [("res", c0, c0)] * 3 + [("down", c0, True)]
        + [("res", c0, c1)] + [("res", c1, c1)] * 2 + [("down", c1, True)]
        + [("res", c1, c2)] + [("res", c2, c2)] * 2 + [("down", c2, False)]
        + [("res", c2, c3)] + [("res", c3, c3)] * 4
    )


def _run_plan(params, plan, x, zq, cfg):
    for spec, p in zip(plan, params["blocks"]):
        kind = spec[0]
        if kind == "res":
            x = _resnet(p, x, zq, cfg)
        elif kind == "down":
            x = _downsample(p, x, spec[2])
        elif kind == "up":
            x = _upsample(p, x, spec[2])
    return x


def cog_vae_decode(params: Dict, latents: jnp.ndarray,
                   cfg: CogVAEConfig = CogVAEConfig()) -> jnp.ndarray:
    """(B, T, H, W, 16) latents -> (B, T', 8H, 8W, 3) video in [-1, 1]
    (reference CogVAEDecoder.forward :224-235)."""
    z = latents / cfg.scaling
    x = _cog_conv3d(params["conv_in"], z)
    x = _run_plan(params, cog_decoder_plan(cfg), x, z, cfg)
    x = jax.nn.silu(_spatial_norm(params["norm_out"], x, z, cfg.groups, cfg.eps))
    return _cog_conv3d(params["conv_out"], x)


def cog_vae_encode(params: Dict, video: jnp.ndarray,
                   cfg: CogVAEConfig = CogVAEConfig()) -> jnp.ndarray:
    """(B, T, H, W, 3) video -> (B, T', H/8, W/8, 16) scaled latent means
    (reference CogVAEEncoder.forward :309-320; conv_out's 32 channels hold
    mean+logvar, the mean half is kept)."""
    x = _cog_conv3d(params["conv_in"], video)
    x = _run_plan(params, cog_encoder_plan(cfg), x, None, cfg)
    x = jax.nn.silu(_group_norm_3d(params["norm_out"], x, cfg.groups, cfg.eps))
    x = _cog_conv3d(params["conv_out"], x)[..., :cfg.latent_dim]
    return x * cfg.scaling


def cog_vae_decode_tiled(params: Dict, latents: jnp.ndarray,
                         cfg: CogVAEConfig = CogVAEConfig(),
                         tile_size: Tuple[int, int] = (60, 90),
                         tile_stride: Tuple[int, int] = (30, 45)) -> jnp.ndarray:
    """Spatially tiled decode: latent-unit tiles over (H, W), full temporal
    extent per tile (reference CogVAEDecoder.decode_video :238-251 via
    TileWorker2Dto3D with scales (3/latent_dim, (T//2*8+T%2)/T, 8, 8))."""
    from goal_force_tpu.models.tiler import tiled_forward_2d_to_3d

    T = latents.shape[1]
    return tiled_forward_2d_to_3d(
        jax.jit(lambda z: cog_vae_decode(params, z, cfg)),
        latents, tile_size, tile_stride,
        scales=(3 / cfg.latent_dim, (T // 2 * 8 + T % 2) / T, 8.0, 8.0))


def cog_vae_encode_tiled(params: Dict, video: jnp.ndarray,
                         cfg: CogVAEConfig = CogVAEConfig(),
                         tile_size: Tuple[int, int] = (60, 90),
                         tile_stride: Tuple[int, int] = (30, 45)) -> jnp.ndarray:
    """Spatially tiled encode: latent-unit tile sizes (x8 in pixel space), as
    in reference CogVAEEncoder.encode_video :323-336 with scales
    (latent_dim/3, (T//4+T%2)/T, 1/8, 1/8)."""
    from goal_force_tpu.models.tiler import tiled_forward_2d_to_3d

    T = video.shape[1]
    return tiled_forward_2d_to_3d(
        jax.jit(lambda v: cog_vae_encode(params, v, cfg)),
        video, tuple(i * 8 for i in tile_size),
        tuple(i * 8 for i in tile_stride),
        scales=(cfg.latent_dim / 3, (T // 4 + T % 2) / T, 1 / 8, 1 / 8))


# ---------------------------------------------------------------------------
# Init + converters (diffsynth layout, reference converters :363-518)
# ---------------------------------------------------------------------------

def _init_c3(key, kt, kh, kw, ci, co, dtype):
    k1, _ = jax.random.split(key)
    return {"w": jax.random.normal(k1, (kt, kh, kw, ci, co), dtype)
            * (0.5 / np.sqrt(kt * kh * kw * ci)),
            "b": jnp.zeros((co,), dtype)}


def _init_c2(key, kh, kw, ci, co, dtype):
    k1, _ = jax.random.split(key)
    return {"w": jax.random.normal(k1, (kh, kw, ci, co), dtype)
            * (0.5 / np.sqrt(kh * kw * ci)),
            "b": jnp.zeros((co,), dtype)}


def _init_norm(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _init_res(key, ci, co, zq_dim, dtype):
    ks = jax.random.split(key, 4)
    if zq_dim is None:
        n1, n2 = _init_norm(ci, dtype), _init_norm(co, dtype)
    else:
        n1 = {"norm_layer": _init_norm(ci, dtype),
              "conv_y": _init_c3(ks[2], 1, 1, 1, zq_dim, ci, dtype),
              "conv_b": _init_c3(ks[3], 1, 1, 1, zq_dim, ci, dtype)}
        n2 = {"norm_layer": _init_norm(co, dtype),
              "conv_y": _init_c3(ks[2], 1, 1, 1, zq_dim, co, dtype),
              "conv_b": _init_c3(ks[3], 1, 1, 1, zq_dim, co, dtype)}
    p = {"norm1": n1, "norm2": n2,
         "conv1": _init_c3(ks[0], 3, 3, 3, ci, co, dtype),
         "conv2": _init_c3(ks[1], 3, 3, 3, co, co, dtype)}
    if ci != co:
        p["shortcut"] = _init_c3(ks[3], 1, 1, 1, ci, co, dtype)
    return p


def _init_plan(key, plan, zq_dim, dtype):
    blocks = []
    for k, spec in zip(jax.random.split(key, len(plan)), plan):
        if spec[0] == "res":
            blocks.append(_init_res(k, spec[1], spec[2], zq_dim, dtype))
        else:
            blocks.append(_init_c2(k, 3, 3, spec[1], spec[1], dtype))
    return blocks


def init_cog_vae_decoder(key, cfg: CogVAEConfig = CogVAEConfig(),
                         dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 4)
    c0 = cfg.channels[0]
    return {
        "conv_in": _init_c3(ks[0], 3, 3, 3, cfg.latent_dim, cfg.channels[-1],
                            dtype),
        "blocks": _init_plan(ks[1], cog_decoder_plan(cfg), cfg.latent_dim,
                             dtype),
        "norm_out": {"norm_layer": _init_norm(c0, dtype),
                     "conv_y": _init_c3(ks[2], 1, 1, 1, cfg.latent_dim, c0,
                                        dtype),
                     "conv_b": _init_c3(ks[3], 1, 1, 1, cfg.latent_dim, c0,
                                        dtype)},
        "conv_out": _init_c3(ks[3], 3, 3, 3, c0, 3, dtype),
    }


def init_cog_vae_encoder(key, cfg: CogVAEConfig = CogVAEConfig(),
                         dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 4)
    c3 = cfg.channels[-1]
    return {
        "conv_in": _init_c3(ks[0], 3, 3, 3, 3, cfg.channels[0], dtype),
        "blocks": _init_plan(ks[1], cog_encoder_plan(cfg), None, dtype),
        "norm_out": _init_norm(c3, dtype),
        "conv_out": _init_c3(ks[2], 3, 3, 3, c3, 2 * cfg.latent_dim, dtype),
    }


def _c3_from(sd, pre):
    return {"w": jnp.asarray(np.asarray(sd[pre + ".weight"]).transpose(2, 3, 4, 1, 0)),
            "b": jnp.asarray(np.asarray(sd[pre + ".bias"]))}


def _c2_from(sd, pre):
    return {"w": jnp.asarray(np.asarray(sd[pre + ".weight"]).transpose(2, 3, 1, 0)),
            "b": jnp.asarray(np.asarray(sd[pre + ".bias"]))}


def _norm_from(sd, pre):
    return {"scale": jnp.asarray(np.asarray(sd[pre + ".weight"])),
            "bias": jnp.asarray(np.asarray(sd[pre + ".bias"]))}


def _res_from(sd, pre, spatial):
    if spatial:
        norm = lambda n: {"norm_layer": _norm_from(sd, f"{pre}.{n}.norm_layer"),
                          "conv_y": _c3_from(sd, f"{pre}.{n}.conv_y"),
                          "conv_b": _c3_from(sd, f"{pre}.{n}.conv_b")}
    else:
        norm = lambda n: _norm_from(sd, f"{pre}.{n}")
    p = {"norm1": norm("norm1"), "norm2": norm("norm2"),
         "conv1": _c3_from(sd, pre + ".conv1"),
         "conv2": _c3_from(sd, pre + ".conv2")}
    if pre + ".conv_shortcut.weight" in sd:
        p["shortcut"] = _c3_from(sd, pre + ".conv_shortcut")
    return p


def cog_vae_decoder_params_from_torch(sd, cfg: CogVAEConfig = CogVAEConfig()):
    plan = cog_decoder_plan(cfg)
    blocks = [(_res_from(sd, f"blocks.{i}", spatial=True) if s[0] == "res"
               else _c2_from(sd, f"blocks.{i}.conv"))
              for i, s in enumerate(plan)]
    return {
        "conv_in": _c3_from(sd, "conv_in"),
        "blocks": blocks,
        "norm_out": {"norm_layer": _norm_from(sd, "norm_out.norm_layer"),
                     "conv_y": _c3_from(sd, "norm_out.conv_y"),
                     "conv_b": _c3_from(sd, "norm_out.conv_b")},
        "conv_out": _c3_from(sd, "conv_out"),
    }


def cog_vae_encoder_params_from_torch(sd, cfg: CogVAEConfig = CogVAEConfig()):
    plan = cog_encoder_plan(cfg)
    blocks = [(_res_from(sd, f"blocks.{i}", spatial=False) if s[0] == "res"
               else _c2_from(sd, f"blocks.{i}.conv"))
              for i, s in enumerate(plan)]
    return {
        "conv_in": _c3_from(sd, "conv_in"),
        "blocks": blocks,
        "norm_out": _norm_from(sd, "norm_out"),
        "conv_out": _c3_from(sd, "conv_out"),
    }
