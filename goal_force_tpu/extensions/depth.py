"""DPT-Hybrid monocular depth estimator (learned, checkpoint-loadable).

The reference's Annotator("depth") wraps controlnet_aux's MidasDetector
(reference: diffsynth/controlnets/processors.py:14-16), whose network is the
MiDaS 3.0 DPT-Hybrid model: a BiT/ResNetv2-bottleneck backbone feeding a
ViT-B/16 encoder, a DPT reassemble + feature-fusion neck, and a 3-conv depth
head. This is the TPU-native port as a pure param-pytree forward:

  - `DPTHybridConfig` + `init_dpt` / `dpt_depth(params, cfg, pixels)`
  - `dpt_params_from_torch` converts the HF `Intel/dpt-hybrid-midas`
    checkpoint layout (transformers DPTForDepthEstimation, is_hybrid=True) —
    the standard locally-downloadable distribution of these exact MiDaS
    weights — into the pytree.

Numerics mirrored from transformers modeling_dpt.py / modeling_bit.py:
  - weight-standardized convs (per-out-channel biased moments, eps 1e-8),
    TF-"SAME" dynamic padding (== XLA SAME), group-norm(32)+relu
  - stem maxpool 3x3/2 with SAME zero padding (post-relu, so -inf-init
    reduce_window with SAME padding is exactly equal)
  - non-preact bottleneck v1.5 blocks; every stage's layer 0 carries a
    projection downsample
  - ViT-B/16 pre-LN encoder over 1x1-projected stage-3 features + CLS,
    position embeddings bilinearly resized (half-pixel) to the input grid
  - hybrid reassemble: stages 0/1 pass the backbone features through;
    stages 2/3 take ViT layers 9/12 (pre-final-layernorm), project the CLS
    readout, 1x1 to neck width, stage 3 downsampled by a 3x3/2 conv
  - fusion: pre-act residual units, x2 bilinear upsampling with
    align_corners=True (implemented exactly; jax.image.resize is half-pixel
    only), 1x1 projection; head conv3x3 -> x2 up -> conv3x3 -> relu ->
    conv1x1 -> relu
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class DPTHybridConfig:
    # BiT backbone
    embedding_size: int = 64
    hidden_sizes: Tuple[int, ...] = (256, 512, 1024)
    depths: Tuple[int, ...] = (3, 4, 9)
    num_groups: int = 32
    # ViT encoder
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    patch_size: int = 16
    pos_grid: int = 24  # position table stored for a 384x384 train grid
    # neck/head
    neck_hidden_sizes: Tuple[int, ...] = (256, 512, 768, 768)
    fusion_hidden_size: int = 256
    vit_out_layers: Tuple[int, int] = (9, 12)  # after this many ViT layers
    layer_norm_eps: float = 1e-12
    group_norm_eps: float = 1e-5


def tiny_dpt() -> DPTHybridConfig:
    return DPTHybridConfig(embedding_size=8, hidden_sizes=(8, 16, 32),
                           depths=(1, 1, 2), num_groups=2, hidden_size=32,
                           num_layers=4, num_heads=2, intermediate_size=64,
                           pos_grid=4, neck_hidden_sizes=(8, 16, 32, 32),
                           fusion_hidden_size=16, vit_out_layers=(3, 4))


def _make_div(value: float, divisor: int = 8) -> int:
    min_value = divisor
    new_value = max(min_value, int(value + divisor / 2) // divisor * divisor)
    if new_value < 0.9 * value:
        new_value += divisor
    return new_value


# ---------------------------------------------------------------------------
# primitives (NHWC, weights HWIO)

def _ws_conv(x, w, stride: int = 1, eps: float = 1e-8):
    """Weight-standardized conv with TF-SAME padding (modeling_bit.py:82-127;
    F.batch_norm over (1, O, fan_in) uses per-out-channel BIASED moments)."""
    wf = w.astype(jnp.float32)
    mean = wf.mean(axis=(0, 1, 2), keepdims=True)
    var = wf.var(axis=(0, 1, 2), keepdims=True)
    wn = ((wf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return lax.conv_general_dilated(
        x, wn, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv(x, w, b=None, stride: int = 1, padding="SAME"):
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _group_norm(x, w, b, groups: int, eps: float, act: bool):
    n, h, wd, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h, wd, groups, c // groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(n, h, wd, c)
    out = (xf * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)
    return jax.nn.relu(out) if act else out


def _layer_norm(x, w, b, eps: float):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return (((xf - mean) * jax.lax.rsqrt(var + eps)) * w + b).astype(x.dtype)


def _max_pool_same(x, window: int = 3, stride: int = 2):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, window, window, 1),
        (1, stride, stride, 1), "SAME")


def _resize_bilinear_ac(x, out_h: int, out_w: int):
    """Bilinear resize with align_corners=True (torch F.interpolate /
    nn.Upsample semantics in the DPT fusion stage and head)."""
    n, in_h, in_w, c = x.shape
    ys = (jnp.linspace(0.0, in_h - 1.0, out_h) if out_h > 1
          else jnp.zeros((1,)))
    xs = (jnp.linspace(0.0, in_w - 1.0, out_w) if out_w > 1
          else jnp.zeros((1,)))
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, in_h - 1)
    y1 = jnp.clip(y0 + 1, 0, in_h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, in_w - 1)
    x1 = jnp.clip(x0 + 1, 0, in_w - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def _resize_bilinear_half_pixel(x, out_h: int, out_w: int):
    """align_corners=False resize (position-embedding interpolation)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, out_h, out_w, c), method="bilinear")


# ---------------------------------------------------------------------------
# init

def _init_conv(key, kh, kw, cin, cout, dtype, bias=True):
    p = {"w": jax.random.normal(key, (kh, kw, cin, cout), dtype) * 0.05}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def _init_norm(c, dtype):
    return {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def _init_linear(key, cin, cout, dtype):
    return {"w": jax.random.normal(key, (cin, cout), dtype) * 0.02,
            "b": jnp.zeros((cout,), dtype)}


def init_dpt(key, cfg: DPTHybridConfig, dtype=jnp.float32) -> Dict:
    keys = iter(jax.random.split(key, 1024))
    stem = {"conv": {"w": jax.random.normal(next(keys),
                                            (7, 7, 3, cfg.embedding_size),
                                            dtype) * 0.05},
            "norm": _init_norm(cfg.embedding_size, dtype)}
    stages = []
    prev = cfg.embedding_size
    for depth, hidden in zip(cfg.depths, cfg.hidden_sizes):
        mid = _make_div(hidden * 0.25)
        layers = []
        for i in range(depth):
            layer = {
                "conv1": {"w": jax.random.normal(next(keys), (1, 1, prev if i == 0 else hidden, mid), dtype) * 0.05},
                "norm1": _init_norm(mid, dtype),
                "conv2": {"w": jax.random.normal(next(keys), (3, 3, mid, mid), dtype) * 0.05},
                "norm2": _init_norm(mid, dtype),
                "conv3": {"w": jax.random.normal(next(keys), (1, 1, mid, hidden), dtype) * 0.05},
                "norm3": _init_norm(hidden, dtype),
            }
            if i == 0:
                layer["downsample"] = {
                    "conv": {"w": jax.random.normal(next(keys), (1, 1, prev, hidden), dtype) * 0.05},
                    "norm": _init_norm(hidden, dtype),
                }
            layers.append(layer)
        stages.append(layers)
        prev = hidden

    d = cfg.hidden_size
    vit_layers = []
    for _ in range(cfg.num_layers):
        vit_layers.append({
            "ln1": _init_norm(d, dtype), "ln2": _init_norm(d, dtype),
            "q": _init_linear(next(keys), d, d, dtype),
            "k": _init_linear(next(keys), d, d, dtype),
            "v": _init_linear(next(keys), d, d, dtype),
            "o": _init_linear(next(keys), d, d, dtype),
            "fc1": _init_linear(next(keys), d, cfg.intermediate_size, dtype),
            "fc2": _init_linear(next(keys), cfg.intermediate_size, d, dtype),
        })
    vit = {
        "proj": _init_conv(next(keys), 1, 1, cfg.hidden_sizes[-1], d, dtype),
        "cls": jnp.zeros((1, 1, d), dtype),
        "pos": jax.random.normal(next(keys),
                                 (1, cfg.pos_grid * cfg.pos_grid + 1, d),
                                 dtype) * 0.02,
        "layers": vit_layers,
    }

    nh = cfg.neck_hidden_sizes
    fh = cfg.fusion_hidden_size
    neck = {
        "readout": [None, None,
                    _init_linear(next(keys), 2 * d, d, dtype),
                    _init_linear(next(keys), 2 * d, d, dtype)],
        "project": [None, None,
                    _init_conv(next(keys), 1, 1, d, nh[2], dtype),
                    _init_conv(next(keys), 1, 1, d, nh[3], dtype)],
        "resize3": _init_conv(next(keys), 3, 3, nh[3], nh[3], dtype),
        "convs": [_init_conv(next(keys), 3, 3, c, fh, dtype, bias=False)
                  for c in nh],
        "fusion": [{
            "proj": _init_conv(next(keys), 1, 1, fh, fh, dtype),
            "res1": {"c1": _init_conv(next(keys), 3, 3, fh, fh, dtype),
                     "c2": _init_conv(next(keys), 3, 3, fh, fh, dtype)},
            "res2": {"c1": _init_conv(next(keys), 3, 3, fh, fh, dtype),
                     "c2": _init_conv(next(keys), 3, 3, fh, fh, dtype)},
        } for _ in nh],
    }
    head = {
        "c0": _init_conv(next(keys), 3, 3, fh, fh // 2, dtype),
        "c1": _init_conv(next(keys), 3, 3, fh // 2, 32, dtype),
        "c2": _init_conv(next(keys), 1, 1, 32, 1, dtype),
    }
    return {"backbone": {"stem": stem, "stages": stages}, "vit": vit,
            "neck": neck, "head": head}


# ---------------------------------------------------------------------------
# forward

def _bottleneck(p, x, cfg: DPTHybridConfig, stride: int):
    gn = lambda h, n, act: _group_norm(h, n["w"], n["b"], cfg.num_groups,
                                       cfg.group_norm_eps, act)
    shortcut = x
    if "downsample" in p:
        shortcut = gn(_ws_conv(x, p["downsample"]["conv"]["w"], stride),
                      p["downsample"]["norm"], act=False)
    h = gn(_ws_conv(x, p["conv1"]["w"]), p["norm1"], act=True)
    h = gn(_ws_conv(h, p["conv2"]["w"], stride), p["norm2"], act=True)
    h = gn(_ws_conv(h, p["conv3"]["w"]), p["norm3"], act=False)
    return jax.nn.relu(h + shortcut)


def _backbone(p, x, cfg: DPTHybridConfig) -> List[jnp.ndarray]:
    """BiT stem + stages; returns [stage1, stage2, stage3] feature maps."""
    h = _ws_conv(x, p["stem"]["conv"]["w"], stride=2)
    h = _group_norm(h, p["stem"]["norm"]["w"], p["stem"]["norm"]["b"],
                    cfg.num_groups, cfg.group_norm_eps, act=True)
    h = _max_pool_same(h)
    feats = []
    for si, layers in enumerate(p["stages"]):
        stride = 1 if si == 0 else 2
        for li, layer in enumerate(layers):
            h = _bottleneck(layer, h, cfg, stride if li == 0 else 1)
        feats.append(h)
    return feats


def _vit_layer(p, x, cfg: DPTHybridConfig):
    ln = lambda h, n: _layer_norm(h, n["w"].astype(jnp.float32),
                                  n["b"].astype(jnp.float32),
                                  cfg.layer_norm_eps)
    lin = lambda q, h: h @ q["w"].astype(h.dtype) + q["b"].astype(h.dtype)
    b, s, d = x.shape
    nh, hd = cfg.num_heads, d // cfg.num_heads
    hn = ln(x, p["ln1"])
    q = lin(p["q"], hn).reshape(b, s, nh, hd)
    k = lin(p["k"], hn).reshape(b, s, nh, hd)
    v = lin(p["v"], hn).reshape(b, s, nh, hd)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k) / math.sqrt(hd)
    attn = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bnqk,bknd->bqnd", attn, v).reshape(b, s, d)
    x = x + lin(p["o"], out)
    hn = ln(x, p["ln2"])
    return x + lin(p["fc2"], jax.nn.gelu(lin(p["fc1"], hn), approximate=False))


def _reassemble_token_map(tokens, readout, project, grid_hw):
    """Hybrid reassemble stages 2/3 (modeling_dpt.py:560-592): CLS readout
    projection, then a 1x1 conv to the neck width."""
    cls, grid = tokens[:, 0], tokens[:, 1:]
    b, n, c = grid.shape
    readout_in = jnp.concatenate(
        [grid, jnp.broadcast_to(cls[:, None], grid.shape)], -1)
    h = jax.nn.gelu(readout_in @ readout["w"].astype(grid.dtype)
                    + readout["b"].astype(grid.dtype), approximate=False)
    h = h.reshape(b, grid_hw[0], grid_hw[1], c)
    return _conv(h, project["w"], project["b"])


def _fusion_layer(p, hidden, residual):
    relu = jax.nn.relu
    res_unit = lambda rp, h: _conv(relu(_conv(relu(h), rp["c1"]["w"],
                                              rp["c1"]["b"])),
                                   rp["c2"]["w"], rp["c2"]["b"]) + h
    if residual is not None:
        if hidden.shape[1:3] != residual.shape[1:3]:
            residual = _resize_bilinear_half_pixel(
                residual, hidden.shape[1], hidden.shape[2])
        hidden = hidden + res_unit(p["res1"], residual)
    hidden = res_unit(p["res2"], hidden)
    hidden = _resize_bilinear_ac(hidden, hidden.shape[1] * 2,
                                 hidden.shape[2] * 2)
    return _conv(hidden, p["proj"]["w"], p["proj"]["b"])


def dpt_depth(params, cfg: DPTHybridConfig, pixels) -> jnp.ndarray:
    """(B, H, W, 3) normalized pixels -> (B, H, W) relative inverse depth.
    H and W must be multiples of 32 (patch grid /16, reassemble3 /32)."""
    b, H, W, _ = pixels.shape
    feats = _backbone(params["backbone"], pixels, cfg)

    gh, gw = H // cfg.patch_size, W // cfg.patch_size
    tokens = _conv(feats[-1], params["vit"]["proj"]["w"],
                   params["vit"]["proj"]["b"])
    tokens = tokens.reshape(b, gh * gw, cfg.hidden_size)
    cls = jnp.broadcast_to(params["vit"]["cls"].astype(tokens.dtype),
                           (b, 1, cfg.hidden_size))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    pos = params["vit"]["pos"].astype(tokens.dtype)
    pos_tok, pos_grid = pos[:, :1], pos[0, 1:]
    g = cfg.pos_grid
    pos_grid = _resize_bilinear_half_pixel(
        pos_grid.reshape(1, g, g, cfg.hidden_size), gh, gw
    ).reshape(1, gh * gw, cfg.hidden_size)
    tokens = tokens + jnp.concatenate([pos_tok, pos_grid], axis=1)

    taps = {}
    for i, layer in enumerate(params["vit"]["layers"]):
        tokens = _vit_layer(layer, tokens, cfg)
        if (i + 1) in cfg.vit_out_layers:
            taps[i + 1] = tokens  # pre-final-layernorm (modeling_dpt.py:1060)

    neck = params["neck"]
    maps = [feats[0], feats[1]]
    for slot, layer_id in enumerate(cfg.vit_out_layers):
        maps.append(_reassemble_token_map(
            taps[layer_id], neck["readout"][2 + slot],
            neck["project"][2 + slot], (gh, gw)))
    maps[3] = _conv(maps[3], neck["resize3"]["w"], neck["resize3"]["b"],
                    stride=2, padding=[(1, 1), (1, 1)])

    feats = [_conv(m, neck["convs"][i]["w"]) for i, m in enumerate(maps)]

    fused = None
    for fp, feat in zip(neck["fusion"], feats[::-1]):
        fused = (_fusion_layer(fp, feat, None) if fused is None
                 else _fusion_layer(fp, fused, feat))

    head = params["head"]
    h = _conv(fused, head["c0"]["w"], head["c0"]["b"])
    h = _resize_bilinear_ac(h, h.shape[1] * 2, h.shape[2] * 2)
    h = jax.nn.relu(_conv(h, head["c1"]["w"], head["c1"]["b"]))
    h = jax.nn.relu(_conv(h, head["c2"]["w"], head["c2"]["b"]))
    return h[..., 0]


# ---------------------------------------------------------------------------
# converter (HF Intel/dpt-hybrid-midas layout)

def _t_conv(w) -> jnp.ndarray:  # OIHW -> HWIO
    return jnp.asarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _t_lin(sd, name) -> Dict:
    return {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T),
            "b": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}


def _t_norm(sd, name) -> Dict:
    return {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"])),
            "b": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}


class _TrackedSD:
    """Read-tracking view so the converter can enforce full key coverage."""

    def __init__(self, base: Mapping):
        self._base = dict(base)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return np.asarray(self._base[k])

    def __contains__(self, k):
        return k in self._base

    def __iter__(self):
        return iter(self._base)

    def unconsumed(self):
        return set(self._base) - self.read


# present in checkpoints but not applied on the depth path: DPTModel's final
# layernorm only touches last_hidden_state, never the pre-norm neck taps
# (transformers modeling_dpt.py:838-840, 1055-1062)
_DROPPED_KEYS = frozenset({"dpt.layernorm.weight", "dpt.layernorm.bias"})


def dpt_params_from_torch(sd: Mapping, cfg: DPTHybridConfig,
                          strict: bool = True) -> Dict:
    """Convert a transformers DPTForDepthEstimation (is_hybrid=True) state
    dict — the HF distribution of the MiDaS DPT-Hybrid weights — to the
    pytree. strict=True raises on any unconsumed key (beyond the knowingly
    dropped final ViT layernorm), the converter-coverage contract."""
    sd = _TrackedSD(sd)
    bb = "dpt.embeddings.backbone.bit"
    stem = {"conv": {"w": _t_conv(sd[f"{bb}.embedder.convolution.weight"])},
            "norm": _t_norm(sd, f"{bb}.embedder.norm")}
    stages = []
    for si, depth in enumerate(cfg.depths):
        layers = []
        for li in range(depth):
            pre = f"{bb}.encoder.stages.{si}.layers.{li}"
            layer = {}
            for ci in (1, 2, 3):
                layer[f"conv{ci}"] = {"w": _t_conv(sd[f"{pre}.conv{ci}.weight"])}
                layer[f"norm{ci}"] = _t_norm(sd, f"{pre}.norm{ci}")
            if f"{pre}.downsample.conv.weight" in sd:
                layer["downsample"] = {
                    "conv": {"w": _t_conv(sd[f"{pre}.downsample.conv.weight"])},
                    "norm": _t_norm(sd, f"{pre}.downsample.norm"),
                }
            layers.append(layer)
        stages.append(layers)

    vit_layers = []
    for i in range(cfg.num_layers):
        pre = f"dpt.encoder.layer.{i}"
        vit_layers.append({
            "ln1": _t_norm(sd, f"{pre}.layernorm_before"),
            "ln2": _t_norm(sd, f"{pre}.layernorm_after"),
            "q": _t_lin(sd, f"{pre}.attention.attention.query"),
            "k": _t_lin(sd, f"{pre}.attention.attention.key"),
            "v": _t_lin(sd, f"{pre}.attention.attention.value"),
            "o": _t_lin(sd, f"{pre}.attention.output.dense"),
            "fc1": _t_lin(sd, f"{pre}.intermediate.dense"),
            "fc2": _t_lin(sd, f"{pre}.output.dense"),
        })
    vit = {
        "proj": {"w": _t_conv(sd["dpt.embeddings.projection.weight"]),
                 "b": jnp.asarray(sd["dpt.embeddings.projection.bias"])},
        "cls": jnp.asarray(sd["dpt.embeddings.cls_token"][0]),
        "pos": jnp.asarray(sd["dpt.embeddings.position_embeddings"]),
        "layers": vit_layers,
    }
    neck = {
        "readout": [None, None,
                    {"w": jnp.asarray(sd["neck.reassemble_stage.readout_projects.2.0.weight"].T),
                     "b": jnp.asarray(sd["neck.reassemble_stage.readout_projects.2.0.bias"])},
                    {"w": jnp.asarray(sd["neck.reassemble_stage.readout_projects.3.0.weight"].T),
                     "b": jnp.asarray(sd["neck.reassemble_stage.readout_projects.3.0.bias"])}],
        "project": [None, None,
                    {"w": _t_conv(sd["neck.reassemble_stage.layers.2.projection.weight"]),
                     "b": jnp.asarray(sd["neck.reassemble_stage.layers.2.projection.bias"])},
                    {"w": _t_conv(sd["neck.reassemble_stage.layers.3.projection.weight"]),
                     "b": jnp.asarray(sd["neck.reassemble_stage.layers.3.projection.bias"])}],
        "resize3": {"w": _t_conv(sd["neck.reassemble_stage.layers.3.resize.weight"]),
                    "b": jnp.asarray(sd["neck.reassemble_stage.layers.3.resize.bias"])},
        "convs": [{"w": _t_conv(sd[f"neck.convs.{i}.weight"])}
                  for i in range(len(cfg.neck_hidden_sizes))],
        "fusion": [{
            "proj": {"w": _t_conv(sd[f"neck.fusion_stage.layers.{i}.projection.weight"]),
                     "b": jnp.asarray(sd[f"neck.fusion_stage.layers.{i}.projection.bias"])},
            "res1": {"c1": {"w": _t_conv(sd[f"neck.fusion_stage.layers.{i}.residual_layer1.convolution1.weight"]),
                            "b": jnp.asarray(sd[f"neck.fusion_stage.layers.{i}.residual_layer1.convolution1.bias"])},
                     "c2": {"w": _t_conv(sd[f"neck.fusion_stage.layers.{i}.residual_layer1.convolution2.weight"]),
                            "b": jnp.asarray(sd[f"neck.fusion_stage.layers.{i}.residual_layer1.convolution2.bias"])}},
            "res2": {"c1": {"w": _t_conv(sd[f"neck.fusion_stage.layers.{i}.residual_layer2.convolution1.weight"]),
                            "b": jnp.asarray(sd[f"neck.fusion_stage.layers.{i}.residual_layer2.convolution1.bias"])},
                     "c2": {"w": _t_conv(sd[f"neck.fusion_stage.layers.{i}.residual_layer2.convolution2.weight"]),
                            "b": jnp.asarray(sd[f"neck.fusion_stage.layers.{i}.residual_layer2.convolution2.bias"])}},
        } for i in range(len(cfg.neck_hidden_sizes))],
    }
    head = {
        "c0": {"w": _t_conv(sd["head.head.0.weight"]),
               "b": jnp.asarray(sd["head.head.0.bias"])},
        "c1": {"w": _t_conv(sd["head.head.2.weight"]),
               "b": jnp.asarray(sd["head.head.2.bias"])},
        "c2": {"w": _t_conv(sd["head.head.4.weight"]),
               "b": jnp.asarray(sd["head.head.4.bias"])},
    }
    leftover = sd.unconsumed() - _DROPPED_KEYS
    if strict and leftover:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(leftover)[:8]}"
                         f" (+{max(0, len(leftover) - 8)} more)")
    return {"backbone": {"stem": stem, "stages": stages}, "vit": vit,
            "neck": neck, "head": head}


def dpt_config_from_state_dict(sd: Mapping) -> DPTHybridConfig:
    """Infer the hybrid geometry from a checkpoint (shape-based, like
    io/detect.py does for the zoo families)."""
    shape = lambda k: tuple(sd[k].shape)
    hidden = shape("dpt.embeddings.cls_token")[-1]
    n_layers = 1 + max(int(k.split(".")[3]) for k in sd
                       if k.startswith("dpt.encoder.layer."))
    depths = []
    sizes = []
    si = 0
    while f"dpt.embeddings.backbone.bit.encoder.stages.{si}.layers.0.conv1.weight" in sd:
        li = 0
        while (f"dpt.embeddings.backbone.bit.encoder.stages.{si}.layers.{li}"
               f".conv1.weight") in sd:
            li += 1
        depths.append(li)
        sizes.append(shape(f"dpt.embeddings.backbone.bit.encoder.stages.{si}"
                           f".layers.0.conv3.weight")[0])
        si += 1
    pos_len = shape("dpt.embeddings.position_embeddings")[1] - 1
    neck = tuple(shape(f"neck.convs.{i}.weight")[1]
                 for i in range(4))
    fusion = shape("neck.convs.0.weight")[0]
    inter = shape("dpt.encoder.layer.0.intermediate.dense.weight")[0]
    base = DPTHybridConfig()
    heads = base.num_heads if hidden % base.num_heads == 0 else max(
        h for h in (2, 4, 8, 12, 16) if hidden % h == 0)
    if hidden // heads > 64:
        heads = hidden // 64
    return dataclasses.replace(
        base, embedding_size=shape(
            "dpt.embeddings.backbone.bit.embedder.convolution.weight")[0],
        hidden_sizes=tuple(sizes), depths=tuple(depths),
        hidden_size=hidden, num_layers=n_layers, num_heads=heads,
        intermediate_size=inter, pos_grid=int(round(pos_len ** 0.5)),
        neck_hidden_sizes=neck, fusion_hidden_size=fusion,
        vit_out_layers=(max(1, n_layers * 3 // 4), n_layers),
        num_groups=2 if sizes[0] < 32 else 32)


# ---------------------------------------------------------------------------
# host-side annotator entry

_MIDAS_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
_MIDAS_STD = np.array([0.5, 0.5, 0.5], np.float32)


def depth_annotate(params, cfg: DPTHybridConfig, image: np.ndarray,
                   detect_multiple: int = 32) -> np.ndarray:
    """uint8 (H, W, 3) image -> float32 (H, W) in [0, 1], MidasDetector
    post-processing (min-max normalized inverse depth)."""
    img = np.asarray(image)
    h, w = img.shape[:2]
    rh = max(detect_multiple, int(round(h / detect_multiple)) * detect_multiple)
    rw = max(detect_multiple, int(round(w / detect_multiple)) * detect_multiple)
    x = jax.image.resize(jnp.asarray(img, jnp.float32) / 255.0,
                         (rh, rw, 3), method="bilinear")
    x = (x - _MIDAS_MEAN) / _MIDAS_STD
    depth = np.asarray(jax.jit(dpt_depth, static_argnums=1)(
        params, cfg, x[None]))[0]
    depth = np.asarray(jax.image.resize(jnp.asarray(depth), (h, w),
                                        method="bilinear"))
    lo, hi = float(depth.min()), float(depth.max())
    return ((depth - lo) / max(hi - lo, 1e-6)).astype(np.float32)
