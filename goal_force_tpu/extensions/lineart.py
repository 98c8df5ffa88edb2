"""Lineart annotator network (learned, checkpoint-loadable).

The reference's Annotator("lineart") wraps controlnet_aux's LineartDetector
(reference: diffsynth/controlnets/processors.py:21-23), whose network is the
CycleGAN-style ``Generator(3, 1, 3)`` released as ``sk_model.pth`` (and
``sk_model2.pth`` for the coarse variant): a reflection-padded 7x7 stem, two
stride-2 downsampling convs, three residual blocks with instance norm, two
stride-2 transposed convs back up, and a 7x7 sigmoid head. All instance norms
are affine-free, so the checkpoint holds conv weights only, under keys
``model0.1``, ``model1.{0,3}``, ``model2.{i}.conv_block.{1,5}``,
``model3.{0,3}``, ``model4.1``.

This is the TPU-native port: a param pytree + a strict converter for that
exact layout, and an NHWC forward. LineartDetector semantics: input RGB in
0..255 scaled to [0, 1], network emits a line map in [0, 1] (dark lines on a
white page); the detector inverts it to ControlNet's white-on-black
convention, exposed here as ``invert=True``.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

import jax
import jax.numpy as jnp

# (cin, cout) for the two downsampling and two upsampling convs
LINEART_DOWN = ((64, 128), (128, 256))
LINEART_UP = ((256, 128), (128, 64))
LINEART_RES_BLOCKS = 3
LINEART_DIM = 256


def _he(key, shape, dtype):
    fan_in = int(np.prod(shape[:-1]))
    return jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / fan_in)


def init_lineart(key, dtype=jnp.float32) -> Dict:
    n = 1 + len(LINEART_DOWN) + 2 * LINEART_RES_BLOCKS + len(LINEART_UP) + 1
    ks = iter(jax.random.split(key, n))
    conv = lambda kh, kw, ci, co: {
        "w": _he(next(ks), (kh, kw, ci, co), dtype),
        "b": jnp.zeros((co,), dtype),
    }
    return {
        "stem": conv(7, 7, 3, 64),
        "down": [conv(3, 3, ci, co) for ci, co in LINEART_DOWN],
        "res": [{"conv1": conv(3, 3, LINEART_DIM, LINEART_DIM),
                 "conv2": conv(3, 3, LINEART_DIM, LINEART_DIM)}
                for _ in range(LINEART_RES_BLOCKS)],
        "up": [conv(3, 3, ci, co) for ci, co in LINEART_UP],
        "head": conv(7, 7, 64, 1),
    }


def lineart_params_from_torch(sd: Mapping[str, np.ndarray],
                              dtype=jnp.float32) -> Dict:
    """Convert the released ``sk_model.pth`` state dict (torch OIHW convs;
    ConvTranspose2d weights are (Cin, Cout, kh, kw)). Strict: every key must
    be consumed and every expected key present."""
    sd = dict(sd)

    def conv(pre):
        w, b = sd.pop(pre + ".weight"), sd.pop(pre + ".bias")
        return {"w": jnp.asarray(np.transpose(np.asarray(w), (2, 3, 1, 0)),
                                 dtype),
                "b": jnp.asarray(np.asarray(b), dtype)}

    def convT(pre):
        # torch ConvTranspose2d weight (Cin, Cout, kh, kw): flip the spatial
        # taps and read it as an HWIO kernel for the lhs-dilated conv below.
        w, b = sd.pop(pre + ".weight"), sd.pop(pre + ".bias")
        w = np.asarray(w)[:, :, ::-1, ::-1]
        return {"w": jnp.asarray(np.transpose(w, (2, 3, 0, 1)), dtype),
                "b": jnp.asarray(np.asarray(b), dtype)}

    params = {
        "stem": conv("model0.1"),
        "down": [conv(f"model1.{3 * i}") for i in range(len(LINEART_DOWN))],
        "res": [{"conv1": conv(f"model2.{i}.conv_block.1"),
                 "conv2": conv(f"model2.{i}.conv_block.5")}
                for i in range(LINEART_RES_BLOCKS)],
        "up": [convT(f"model3.{3 * i}") for i in range(len(LINEART_UP))],
        "head": conv("model4.1"),
    }
    if sd:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(sd)[:8]}")
    return params


def _conv(p, x, stride=1, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def _conv_up2(p, x):
    """torch ConvTranspose2d(k=3, stride=2, padding=1, output_padding=1):
    lhs-dilate by 2 and pad (1, 2) per spatial dim -> exact 2x upsample."""
    return jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def _inorm(x, eps=1e-5):
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _refl_conv(p, x, pad):
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    return _conv(p, x, pad="VALID")


def lineart_forward(params: Dict, image: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) image in 0..255 float -> (B, H, W) line map in [0, 1]
    (1 = page, 0 = line; pre-inversion). H and W must be multiples of 4."""
    h = image / 255.0
    h = jax.nn.relu(_inorm(_refl_conv(params["stem"], h, 3)))
    for p in params["down"]:
        # torch Conv2d(3, stride=2, padding=1) pads (1, 1); XLA SAME would
        # pad (0, 1) on even extents
        h = jax.nn.relu(_inorm(_conv(p, h, stride=2, pad=((1, 1), (1, 1)))))
    for blk in params["res"]:
        r = jax.nn.relu(_inorm(_refl_conv(blk["conv1"], h, 1)))
        h = h + _inorm(_refl_conv(blk["conv2"], r, 1))
    for p in params["up"]:
        h = jax.nn.relu(_inorm(_conv_up2(p, h)))
    return jax.nn.sigmoid(_refl_conv(params["head"], h, 3))[..., 0]


_lineart_forward_jit = jax.jit(lineart_forward)


def lineart_annotate(params: Dict, image: np.ndarray,
                     invert: bool = True) -> np.ndarray:
    """uint8 (H, W, 3) -> uint8 (H, W, 3) lineart control image
    (LineartDetector.__call__: model on the 0..255 input / 255, back to
    0..255, then ``255 - map`` for ControlNet's white-on-black lines)."""
    h, w = image.shape[:2]
    ph, pw = (-h) % 4, (-w) % 4
    x = jnp.asarray(image, jnp.float32)[None]
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    line = np.asarray(_lineart_forward_jit(params, x)[0, :h, :w])
    line = np.clip(line * 255.0, 0, 255).astype(np.uint8)
    if invert:
        line = 255 - line
    return np.repeat(line[..., None], 3, axis=-1)
