"""Quantized linear layers.

Parity role: the reference's FP8 `torch._scaled_mm` linear path
(/root/reference/diffsynth/vram_management/layers.py:141-148). v5e's fast low-precision
unit is the int8 MXU (2x bf16 peak), so the TPU-native equivalent is W8A8 with per-channel
weight scales and per-token dynamic activation scales (SmoothQuant-style, no smoothing).
fp8 dtypes (float8_e4m3fn) are used when the compiler supports them natively (v5p+).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def quantize_weight_int8(w: jnp.ndarray) -> Dict:
    """(..., in, out) -> int8 weights + per-output-channel f32 scales.

    Reduces over the INPUT axis (-2) so stacked per-layer weights (L, in, out)
    keep their leading layer axis — required for lax.scan over block stacks."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    wi = jnp.round(w.astype(jnp.float32) / scale).astype(jnp.int8)
    return {"w_i8": wi, "w_scale": scale[..., 0, :]}


def int8_linear(qp: Dict, x: jnp.ndarray, bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """W8A8 matmul: per-token dynamic activation quantization + int8 MXU dot."""
    xf = x.astype(jnp.float32)
    x_amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_scale = jnp.maximum(x_amax, 1e-8) / 127.0
    xi = jnp.round(xf / x_scale).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xi, qp["w_i8"],
        (((xi.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_scale * qp["w_scale"]
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def quantize_linear_tree(params: Dict, paths=("ffn",)) -> Dict:
    """Replace {'w','b'} leaves under matching sub-paths with int8 packs (weight-only
    transform; apply with int8_linear at the call site).

    norm* nodes are never quantized: on a STACKED block tree their weight is
    (L, dim) — 2-D like a linear, but the leading axis is layers, and
    quantizing it would reduce the scales over the layer axis."""
    def walk(node, in_target, name=""):
        if isinstance(node, dict):
            if (set(node) >= {"w"} and in_target and node["w"].ndim >= 2
                    and not name.startswith("norm")):
                qp = quantize_weight_int8(node["w"])
                out = dict(qp)
                if "b" in node:
                    out["b"] = node["b"]
                return out
            return {k: walk(v, in_target or k in paths, k)
                    for k, v in node.items()}
        return node

    return walk(params, False)


# ---------------------------------------------------------------------------
# FP8 path (the literal analog of the reference's torch._scaled_mm linear,
# diffsynth/vram_management/layers.py:141-148): e4m3 weights with per-channel
# scales, e4m3 dynamically-scaled activations, fp8 x fp8 dot_general. Native
# on v5p+ MXUs; on v5e/CPU XLA emulates the dtype (correct, not faster) — the
# int8 W8A8 path above is the v5e-native choice.
# ---------------------------------------------------------------------------

FP8_MAX = 448.0            # float8_e4m3fn finite max


def quantize_weight_fp8(w: jnp.ndarray) -> Dict:
    """(..., in, out) -> e4m3 weights + per-output-channel f32 scales
    (input-axis reduction keeps stacked (L, in, out) scannable, as int8)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / FP8_MAX
    wq = (w.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
    return {"w_f8": wq, "w_scale": scale[..., 0, :]}


def fp8_linear(qp: Dict, x: jnp.ndarray, bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """scaled_mm semantics: dynamic per-token e4m3 activations, fp8 dot with
    f32 accumulation, rescale by (x_scale * w_scale)."""
    xf = x.astype(jnp.float32)
    x_amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_scale = jnp.maximum(x_amax, 1e-8) / FP8_MAX
    xq = (xf / x_scale).astype(jnp.float8_e4m3fn)
    acc = jax.lax.dot_general(
        xq, qp["w_f8"],
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = acc * x_scale * qp["w_scale"]
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def quantize_linear_tree_fp8(params: Dict, paths=("ffn",)) -> Dict:
    """fp8 variant of quantize_linear_tree (leaves become {'w_f8','w_scale'})."""
    def walk(node, in_target):
        if isinstance(node, dict):
            if set(node) >= {"w"} and in_target and node["w"].ndim >= 2:
                qp = quantize_weight_fp8(node["w"])
                out = dict(qp)
                if "b" in node:
                    out["b"] = node["b"]
                return out
            return {k: walk(v, in_target or k in paths) for k, v in node.items()}
        return node

    return walk(params, False)
