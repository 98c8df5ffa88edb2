"""Anime-lineart annotator network (learned, checkpoint-loadable).

The reference's Annotator("lineart_anime") wraps controlnet_aux's
LineartAnimeDetector (reference: diffsynth/controlnets/processors.py:24-26),
whose network is the pix2pix ``UnetGenerator(3, 1, num_downs=8, ngf=64)``
with affine-free instance norms, released as ``netG.pth``: eight 4x4
stride-2 downsampling convs nested as recursive U-Net skip blocks, mirrored
transposed convs back up, LeakyReLU(0.2) down / ReLU up, Tanh output.

Checkpoint layout: the recursive Sequential nesting produces keys
``model.model.0`` (outer downconv), ``model.model.1.model.{1,5}`` and deeper
(middle blocks: downconv at seq index 1, upconv at 5, submodule at 3;
innermost: downconv 1, upconv 3), ``model.model.3`` (outer upconv). Instance
norms are affine-free so only conv weights/biases appear.

This is the TPU-native port: param pytree + strict converter for that exact
layout, NHWC forward, and the LineartAnimeDetector pre/post-processing
(resize to the 256-multiple grid, x/127.5 - 1 in, x*127.5 + 127.5 out,
inverted to white-on-black).
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import numpy as np

import jax
import jax.numpy as jnp

NGF = 64
NUM_DOWNS = 8
# (outer_nc, inner_nc) outer -> inner; input_nc of the outermost is 3
_BLOCKS = ((1, NGF), (NGF, NGF * 2), (NGF * 2, NGF * 4), (NGF * 4, NGF * 8),
           (NGF * 8, NGF * 8), (NGF * 8, NGF * 8), (NGF * 8, NGF * 8),
           (NGF * 8, NGF * 8))


def init_lineart_anime(key, dtype=jnp.float32) -> Dict:
    ks = iter(jax.random.split(key, 2 * NUM_DOWNS))
    conv = lambda ci, co: {
        "w": jax.random.normal(next(ks), (4, 4, ci, co), dtype)
        * np.sqrt(2.0 / (16 * ci)),
        "b": jnp.zeros((co,), dtype),
    }
    levels: List[Dict] = []
    for depth, (outer, inner) in enumerate(_BLOCKS):
        cin = 3 if depth == 0 else outer
        innermost = depth == NUM_DOWNS - 1
        up_in = inner if innermost else inner * 2
        levels.append({"down": conv(cin, inner), "up": conv(up_in, outer)})
    return {"levels": levels}


def lineart_anime_params_from_torch(sd: Mapping[str, np.ndarray],
                                    dtype=jnp.float32) -> Dict:
    """Convert the released ``netG.pth`` state dict (torch OIHW convs,
    ConvTranspose2d (Cin, Cout, kh, kw); optional ``module.`` prefixes).
    Strict both ways."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    sd = dict(sd)

    def conv(pre):
        w = np.asarray(sd.pop(pre + ".weight"))
        return {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype),
                "b": jnp.asarray(np.asarray(sd.pop(pre + ".bias")), dtype)}

    def convT(pre):
        w = np.asarray(sd.pop(pre + ".weight"))[:, :, ::-1, ::-1]
        return {"w": jnp.asarray(np.transpose(w, (2, 3, 0, 1)), dtype),
                "b": jnp.asarray(np.asarray(sd.pop(pre + ".bias")), dtype)}

    levels: List[Dict] = []
    prefix = "model"
    for depth in range(NUM_DOWNS):
        outermost = depth == 0
        innermost = depth == NUM_DOWNS - 1
        di = 0 if outermost else 1
        ui = 3 if outermost or innermost else 5
        levels.append({"down": conv(f"{prefix}.model.{di}"),
                       "up": convT(f"{prefix}.model.{ui}")})
        si = 1 if outermost else 3
        prefix = f"{prefix}.model.{si}"
    if sd:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(sd)[:8]}")
    return {"levels": levels}


def _down(p, x):
    # Conv2d(4, stride=2, padding=1)
    return jax.lax.conv_general_dilated(
        x, p["w"], (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def _up(p, x):
    # ConvTranspose2d(4, stride=2, padding=1)
    return jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def _inorm(x, eps=1e-5):
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def lineart_anime_forward(params: Dict, image: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) in [-1, 1], H/W multiples of 256 -> (B, H, W) in
    [-1, 1] (Tanh; dark lines on a light page)."""

    def block(depth, x):
        lv = params["levels"][depth]
        outermost = depth == 0
        innermost = depth == NUM_DOWNS - 1
        h = x if outermost else jax.nn.leaky_relu(x, 0.2)
        h = _down(lv["down"], h)
        if not (outermost or innermost):
            h = _inorm(h)
        if not innermost:
            h = block(depth + 1, h)
        h = _up(lv["up"], jax.nn.relu(h))
        if outermost:
            return jnp.tanh(h)
        h = _inorm(h)
        return jnp.concatenate([x, h], axis=-1)

    return block(0, image)[..., 0]


_lineart_anime_forward_jit = jax.jit(lineart_anime_forward)


def lineart_anime_annotate(params: Dict, image: np.ndarray,
                           invert: bool = True) -> np.ndarray:
    """uint8 (H, W, 3) -> uint8 (H, W, 3) anime lineart control image
    (LineartAnimeDetector.__call__: cubic-resize to the next 256-multiple,
    net on x/127.5 - 1, back via *127.5 + 127.5, resize to the input size,
    then ``255 - map``)."""
    import cv2

    h, w = image.shape[:2]
    hn, wn = 256 * ((h + 255) // 256), 256 * ((w + 255) // 256)
    img = cv2.resize(image, (wn, hn), interpolation=cv2.INTER_CUBIC)
    x = jnp.asarray(img, jnp.float32)[None] / 127.5 - 1.0
    line = np.asarray(_lineart_anime_forward_jit(params, x)[0]) * 127.5 + 127.5
    line = cv2.resize(line, (w, h), interpolation=cv2.INTER_CUBIC)
    line = np.clip(line, 0, 255).astype(np.uint8)
    if invert:
        line = 255 - line
    return np.repeat(line[..., None], 3, axis=-1)
