"""Attention dispatch.

The reference picks FlashAttention-3 -> FlashAttention-2 -> SageAttention -> torch SDPA at
import time (/root/reference/diffsynth/models/wan_video_dit.py:9-61). Here the backends are
TPU-native: a Pallas flash-attention kernel for long self-attention, and an XLA einsum path
(f32 softmax) as the always-correct fallback/reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, scale):
    """(B, S, N, H) einsum attention with f32 softmax."""
    logits = jnp.einsum("bsnh,btnh->bnst", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bnst,btnh->bsnh", probs, v)


def attention(q, k, v, impl: str = "auto", scale: float | None = None):
    """q: (B, Sq, N, H); k/v: (B, Skv, N, H) -> (B, Sq, N, H).

    impl: "auto" | "xla" | "pallas". "auto" uses the Pallas flash kernel on TPU when shapes
    qualify, else XLA.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "auto":
        impl = _default_impl(q)
    if impl == "pallas":
        from goal_force_tpu.ops.flash_attention import flash_attention as _pallas

        return _pallas(q, k, v, scale=scale)
    if impl == "pallas_int8":
        from goal_force_tpu.ops.flash_attention import flash_attention_int8 as _pallas8

        return _pallas8(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale)


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _default_impl(q) -> str:
    if not _on_tpu():
        return "xla"
    # Pallas kernel needs lane-aligned head dim and enough tokens to tile.
    if q.shape[-1] % 128 == 0 and q.shape[1] >= 256:
        return "pallas"
    return "xla"
