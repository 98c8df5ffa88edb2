"""NormalBae surface-normal annotator (learned, checkpoint-loadable).

The reference's Annotator("normal") wraps controlnet_aux's NormalBaeDetector
(reference: diffsynth/controlnets/processors.py:29-31) — the "Estimating and
Exploiting the Aleatoric Uncertainty in Surface Normal Estimation" NNET,
released as ``scannet.pt``: a tf_efficientnet_b5_ap encoder (geffnet layout,
TF-SAME padding, BN eps 1e-3, swish) and a BN-architecture decoder — four
UpSampleBN skip-fusion stages, a 1/8-resolution 4-channel head
(normal xyz + kappa, ``norm_normalize``), then three dense pointwise-MLP
refinement passes at 1/4, 1/2 and 1/1 resolution, each conditioned on the
align-corners-upsampled feature map and previous prediction.

This is the TPU-native port: encoder + decoder as a param pytree with a
strict converter for the ``encoder.original_model.* / decoder.*`` checkpoint
layout, an NHWC JAX forward (eval semantics: dense refinement, BN in
inference mode), and the detector's pre/post-processing (ImageNet
normalization in, ``(n + 1)/2`` to an RGB normal map out).
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# tf_efficientnet_b5: (blocks, kernel, stride, expand, cin, cout) per stage
B5_STAGES = ((3, 3, 1, 1, 48, 24), (5, 3, 2, 6, 24, 40), (5, 5, 2, 6, 40, 64),
             (7, 3, 2, 6, 64, 128), (7, 5, 1, 6, 128, 176),
             (9, 5, 2, 6, 176, 304), (3, 3, 1, 6, 304, 512))
STEM_CH, HEAD_CH = 48, 2048
BN_EPS = 1e-3          # geffnet BN_EPS_TF_DEFAULT for tf_ variants
# decoder skips: stage outputs 0 (24ch, 1/2), 1 (40, 1/4), 2 (64, 1/8),
# 4 (176, 1/16) and the 2048ch conv_head output (1/32)
UP_PLAN = ((HEAD_CH + 176, 1024), (1024 + 64, 512), (512 + 40, 256),
           (256 + 24, 128))


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _bn(p, x):
    inv = jax.lax.rsqrt(p["var"] + BN_EPS)
    return (x - p["mean"]) * inv * p["gamma"] + p["beta"]


def _conv(p, x, stride=1, pad="SAME", groups=1):
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), pad, feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) \
        + (p["b"] if "b" in p else 0.0)


def _resize_ac(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (torch F.interpolate
    semantics) — the shared DPT helper."""
    from goal_force_tpu.extensions.depth import _resize_bilinear_ac

    if tuple(size) == x.shape[1:3]:
        return x
    return _resize_bilinear_ac(x, size[0], size[1])


# ---------------------------------------------------------------------------
# init / convert

def _conv_init(key, kh, kw, ci, co, bias, dtype):
    p = {"w": jax.random.normal(key, (kh, kw, ci, co), dtype)
         * np.sqrt(2.0 / (kh * kw * ci))}
    if bias:
        p["b"] = jnp.zeros((co,), dtype)
    return p


def _bn_init(c, dtype):
    return {"gamma": jnp.ones((c,), dtype), "beta": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


def init_normalbae(key, dtype=jnp.float32) -> Dict:
    ks = iter(jax.random.split(key, 512))
    enc: Dict = {"conv_stem": _conv_init(next(ks), 3, 3, 3, STEM_CH, False, dtype),
                 "bn1": _bn_init(STEM_CH, dtype),
                 "conv_head": _conv_init(next(ks), 1, 1, 512, HEAD_CH, False, dtype),
                 "bn2": _bn_init(HEAD_CH, dtype), "blocks": []}
    for n, k, _, e, cin, cout in B5_STAGES:
        stage = []
        for i in range(n):
            ci = cin if i == 0 else cout
            red = max(1, int(ci * 0.25))
            blk: Dict = {}
            if e == 1:
                blk["conv_dw"] = _conv_init(next(ks), k, k, 1, ci, False, dtype)
                blk["bn1"] = _bn_init(ci, dtype)
                blk["se"] = {"conv_reduce": _conv_init(next(ks), 1, 1, ci, red, True, dtype),
                             "conv_expand": _conv_init(next(ks), 1, 1, red, ci, True, dtype)}
                blk["conv_pw"] = _conv_init(next(ks), 1, 1, ci, cout, False, dtype)
                blk["bn2"] = _bn_init(cout, dtype)
            else:
                mid = ci * e
                blk["conv_pw"] = _conv_init(next(ks), 1, 1, ci, mid, False, dtype)
                blk["bn1"] = _bn_init(mid, dtype)
                blk["conv_dw"] = _conv_init(next(ks), k, k, 1, mid, False, dtype)
                blk["bn2"] = _bn_init(mid, dtype)
                blk["se"] = {"conv_reduce": _conv_init(next(ks), 1, 1, mid, red, True, dtype),
                             "conv_expand": _conv_init(next(ks), 1, 1, red, mid, True, dtype)}
                blk["conv_pwl"] = _conv_init(next(ks), 1, 1, mid, cout, False, dtype)
                blk["bn3"] = _bn_init(cout, dtype)
            stage.append(blk)
        enc["blocks"].append(stage)

    def upsample(skip, out):
        return {"conv0": _conv_init(next(ks), 3, 3, skip, out, True, dtype),
                "bn0": _bn_init(out, dtype),
                "conv1": _conv_init(next(ks), 3, 3, out, out, True, dtype),
                "bn1": _bn_init(out, dtype)}

    def mlp(cin):
        return [_conv_init(next(ks), 1, 1, cin, 128, True, dtype),
                _conv_init(next(ks), 1, 1, 128, 128, True, dtype),
                _conv_init(next(ks), 1, 1, 128, 128, True, dtype),
                _conv_init(next(ks), 1, 1, 128, 4, True, dtype)]

    dec = {"conv2": _conv_init(next(ks), 1, 1, HEAD_CH, HEAD_CH, True, dtype),
           "up": [upsample(s, o) for s, o in UP_PLAN],
           "out_conv_res8": _conv_init(next(ks), 3, 3, 512, 4, True, dtype),
           "out_conv_res4": mlp(512 + 4), "out_conv_res2": mlp(256 + 4),
           "out_conv_res1": mlp(128 + 4)}
    return {"encoder": enc, "decoder": dec}


def normalbae_params_from_torch(sd: Mapping[str, np.ndarray],
                                dtype=jnp.float32) -> Dict:
    """Convert the scannet.pt NNET state dict: keys
    ``encoder.original_model.<geffnet>`` + ``decoder.*``, optionally nested
    under {'model': ...} and 'module.'-prefixed. Classifier weights (unused
    by the decoder taps) are consumed and dropped. Strict both ways."""
    if set(sd.keys()) == {"model"}:
        sd = sd["model"]
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    sd = dict(sd)
    sd.pop("encoder.original_model.classifier.weight", None)
    sd.pop("encoder.original_model.classifier.bias", None)

    def conv(pre, depthwise=False, bias=False):
        w = np.asarray(sd.pop(pre + ".weight"))
        if w.ndim == 3:  # Conv1d (out, in, 1) — the pointwise MLPs
            w = w[:, :, :, None]
        # torch OIHW (depthwise: (C, 1, kh, kw)) -> HWIO
        w = np.transpose(w, (2, 3, 1, 0))
        p = {"w": jnp.asarray(w, dtype)}
        if bias:
            p["b"] = jnp.asarray(np.asarray(sd.pop(pre + ".bias")), dtype)
        return p

    def bn(pre):
        g = lambda s: jnp.asarray(np.asarray(sd.pop(f"{pre}.{s}")), dtype)
        out = {"gamma": g("weight"), "beta": g("bias"),
               "mean": g("running_mean"), "var": g("running_var")}
        sd.pop(pre + ".num_batches_tracked", None)
        return out

    E = "encoder.original_model"
    enc: Dict = {"conv_stem": conv(f"{E}.conv_stem"), "bn1": bn(f"{E}.bn1"),
                 "conv_head": conv(f"{E}.conv_head"), "bn2": bn(f"{E}.bn2"),
                 "blocks": []}
    for s, (n, _, _, e, _, _) in enumerate(B5_STAGES):
        stage = []
        for i in range(n):
            pre = f"{E}.blocks.{s}.{i}"
            blk: Dict = {}
            if e == 1:
                blk["conv_dw"] = conv(f"{pre}.conv_dw", depthwise=True)
                blk["bn1"] = bn(f"{pre}.bn1")
                blk["se"] = {"conv_reduce": conv(f"{pre}.se.conv_reduce", bias=True),
                             "conv_expand": conv(f"{pre}.se.conv_expand", bias=True)}
                blk["conv_pw"] = conv(f"{pre}.conv_pw")
                blk["bn2"] = bn(f"{pre}.bn2")
            else:
                blk["conv_pw"] = conv(f"{pre}.conv_pw")
                blk["bn1"] = bn(f"{pre}.bn1")
                blk["conv_dw"] = conv(f"{pre}.conv_dw", depthwise=True)
                blk["bn2"] = bn(f"{pre}.bn2")
                blk["se"] = {"conv_reduce": conv(f"{pre}.se.conv_reduce", bias=True),
                             "conv_expand": conv(f"{pre}.se.conv_expand", bias=True)}
                blk["conv_pwl"] = conv(f"{pre}.conv_pwl")
                blk["bn3"] = bn(f"{pre}.bn3")
            stage.append(blk)
        enc["blocks"].append(stage)

    def upsample(pre):
        return {"conv0": conv(f"{pre}._net.0", bias=True),
                "bn0": bn(f"{pre}._net.1"),
                "conv1": conv(f"{pre}._net.3", bias=True),
                "bn1": bn(f"{pre}._net.4")}

    def mlp(pre):
        return [conv(f"{pre}.{i}", bias=True) for i in (0, 2, 4, 6)]

    D = "decoder"
    dec = {"conv2": conv(f"{D}.conv2", bias=True),
           "up": [upsample(f"{D}.up{i + 1}") for i in range(4)],
           "out_conv_res8": conv(f"{D}.out_conv_res8", bias=True),
           "out_conv_res4": mlp(f"{D}.out_conv_res4"),
           "out_conv_res2": mlp(f"{D}.out_conv_res2"),
           "out_conv_res1": mlp(f"{D}.out_conv_res1")}
    if sd:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(sd)[:8]}")
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# forward

def _se(p, x):
    s = x.mean(axis=(1, 2), keepdims=True)
    s = _conv(p["conv_expand"], _swish(_conv(p["conv_reduce"], s)))
    return x * jax.nn.sigmoid(s)


def _block(p, x, k, stride, expand):
    if expand == 1:  # depthwise-separable
        h = _swish(_bn(p["bn1"], _conv(p["conv_dw"], x, stride,
                                       groups=x.shape[-1])))
        h = _se(p["se"], h)
        h = _bn(p["bn2"], _conv(p["conv_pw"], h))
        return h + x if stride == 1 and h.shape[-1] == x.shape[-1] else h
    h = _swish(_bn(p["bn1"], _conv(p["conv_pw"], x)))
    h = _swish(_bn(p["bn2"], _conv(p["conv_dw"], h, stride,
                                   groups=h.shape[-1])))
    h = _se(p["se"], h)
    h = _bn(p["bn3"], _conv(p["conv_pwl"], h))
    return h + x if stride == 1 and h.shape[-1] == x.shape[-1] else h


def encoder_features(enc: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """Returns the five decoder taps: stage outputs 0/1/2/4 and the raw
    conv_head output (the NNET Encoder collects per-stage features; the
    decoder consumes features[4], [5], [6], [8], [11])."""
    h = _swish(_bn(enc["bn1"], _conv(enc["conv_stem"], x, stride=2)))
    taps = []
    for s, (n, k, stride, e, _, _) in enumerate(B5_STAGES):
        for i in range(n):
            h = _block(enc["blocks"][s][i], h, k, stride if i == 0 else 1, e)
        if s in (0, 1, 2, 4):
            taps.append(h)
    taps.append(_conv(enc["conv_head"], h))
    return taps


def _norm_normalize(out):
    n = out[..., :3]
    # elu + 1 + min_kappa (the reference norm_normalize's min_kappa = 0.01)
    kappa = jax.nn.elu(out[..., 3:]) + 1.0 + 0.01
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-10)
    return jnp.concatenate([n, kappa], axis=-1)


def _upsample_bn(p, x, skip):
    x = _resize_ac(x, skip.shape[1:3])
    h = jnp.concatenate([x, skip], axis=-1)
    h = jax.nn.leaky_relu(_bn(p["bn0"], _conv(p["conv0"], h)), 0.01)
    return jax.nn.leaky_relu(_bn(p["bn1"], _conv(p["conv1"], h)), 0.01)


def _mlp(ps, x):
    for p in ps[:-1]:
        x = jax.nn.relu(_conv(p, x))
    return _conv(ps[-1], x)


def normalbae_forward(params: Dict, image: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) ImageNet-normalized image -> (B, H, W, 4) normal xyz +
    kappa at input resolution (eval path: dense refinement at 1/4, 1/2, 1/1,
    matching Decoder.forward's else-branches)."""
    f0, f1, f2, f4, head = encoder_features(params["encoder"], image)
    dec = params["decoder"]
    x_d0 = _conv(dec["conv2"], head)
    x_d1 = _upsample_bn(dec["up"][0], x_d0, f4)
    x_d2 = _upsample_bn(dec["up"][1], x_d1, f2)
    x_d3 = _upsample_bn(dec["up"][2], x_d2, f1)
    x_d4 = _upsample_bn(dec["up"][3], x_d3, f0)

    out = _norm_normalize(_conv(dec["out_conv_res8"], x_d2))
    for feat, ps in ((x_d2, dec["out_conv_res4"]),
                     (x_d3, dec["out_conv_res2"]),
                     (x_d4, dec["out_conv_res1"])):
        size = (2 * feat.shape[1], 2 * feat.shape[2])
        fm = jnp.concatenate([_resize_ac(feat, size), _resize_ac(out, size)],
                             axis=-1)
        out = _norm_normalize(_mlp(ps, fm))
    return out


_normalbae_forward_jit = jax.jit(normalbae_forward)


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalbae_annotate(params: Dict, image: np.ndarray) -> np.ndarray:
    """uint8 (H, W, 3) -> uint8 (H, W, 3) normal-map control image
    (NormalBaeDetector.__call__: x/255, ImageNet-normalize, NNET, take the
    final prediction's xyz, (n + 1)/2 to RGB)."""
    h, w = image.shape[:2]
    ph, pw = (-h) % 32, (-w) % 32
    x = jnp.asarray(image, jnp.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    x = x[None]
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    n = np.asarray(_normalbae_forward_jit(params, x)[0, :h, :w, :3])
    return (np.clip((n + 1.0) * 0.5, 0, 1) * 255.0).astype(np.uint8)
