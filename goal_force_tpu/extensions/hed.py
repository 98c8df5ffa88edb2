"""HED soft-edge annotator network (learned, checkpoint-loadable).

The reference's Annotator("softedge") wraps controlnet_aux's HEDdetector
(reference: diffsynth/controlnets/processors.py:18-20), whose network is
lllyasviel's `ControlNetHED_Apache2` — a 5-stage VGG-style edge detector with
a per-stage 1x1 projection head, distributed as `ControlNetHED.pth` with keys
`norm`, `block{k}.convs.{i}.weight/bias`, `block{k}.projection.weight/bias`.
This is the TPU-native port: a param pytree + converter for that exact
checkpoint layout, the stage maps bilinearly resized to the input size,
averaged, and squashed with a sigmoid (HEDdetector semantics).

(Chosen over the depth annotator because MidasDetector's DPT network needs the
`timm` backbone stack, absent in this image; HED is self-contained.)
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

import jax
import jax.numpy as jnp

# (in_ch, out_ch, n_convs, downsample-before)
HED_STAGES = ((3, 64, 2, False), (64, 128, 2, True), (128, 256, 3, True),
              (256, 512, 3, True), (512, 512, 3, True))


def init_hed(key, dtype=jnp.float32) -> Dict:
    ks = iter(jax.random.split(key, sum(s[2] + 1 for s in HED_STAGES)))
    blocks = []
    for cin, cout, n, _ in HED_STAGES:
        convs = []
        for i in range(n):
            ci = cin if i == 0 else cout
            convs.append({
                "w": jax.random.normal(next(ks), (3, 3, ci, cout), dtype) * 0.05,
                "b": jnp.zeros((cout,), dtype),
            })
        proj = {"w": jax.random.normal(next(ks), (1, 1, cout, 1), dtype) * 0.05,
                "b": jnp.zeros((1,), dtype)}
        blocks.append({"convs": convs, "projection": proj})
    return {"norm": jnp.zeros((3,), dtype), "blocks": blocks}


def hed_params_from_torch(sd: Mapping[str, np.ndarray],
                          dtype=jnp.float32) -> Dict:
    """Convert the released `ControlNetHED.pth` state dict (torch OIHW convs,
    norm of shape (1, 3, 1, 1))."""
    g = lambda k: np.asarray(sd[k])
    conv = lambda pre: {
        "w": jnp.asarray(np.transpose(g(pre + ".weight"), (2, 3, 1, 0)), dtype),
        "b": jnp.asarray(g(pre + ".bias"), dtype),
    }
    blocks = []
    for k, (_, _, n, _) in enumerate(HED_STAGES, start=1):
        blocks.append({
            "convs": [conv(f"block{k}.convs.{i}") for i in range(n)],
            "projection": conv(f"block{k}.projection"),
        })
    return {"norm": jnp.asarray(g("norm").reshape(3), dtype), "blocks": blocks}


def _conv(p, x, stride=1):
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def hed_forward(params: Dict, image: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) image in 0..255 float -> (B, H, W) soft edge in [0, 1].

    Mirrors ControlNetHED_Apache2.forward (x - norm; per stage: optional 2x2
    maxpool, 3x3 convs each followed by ReLU, and a 1x1 projection of the
    stage features) + HEDdetector's post-processing (resize each stage map to
    the input size, average, sigmoid)."""
    b, hh, ww, _ = image.shape
    h = image - params["norm"]
    maps = []
    for blk, (_, _, _, down) in zip(params["blocks"], HED_STAGES):
        if down:
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        for cp in blk["convs"]:
            h = jax.nn.relu(_conv(cp, h))
        maps.append(_conv(blk["projection"], h)[..., 0])
    up = [jax.image.resize(m, (b, hh, ww), "bilinear") for m in maps]
    return jax.nn.sigmoid(jnp.mean(jnp.stack(up), axis=0))
