"""3D rotary position embeddings for video tokens.

The reference precomputes complex128 tables split (f, h, w) over the head dim —
44/42/42 dims for head_dim 128 (/root/reference/diffsynth/models/wan_video_dit.py:75-97) —
and rotates q/k in float64. TPUs have no f64, so the angle tables are built on host in
numpy float64 and stored as f32 cos/sin; the rotation runs in f32. The complex product
(a+bi)(cosθ+sinθ·i) becomes the real pair rotation used in apply_rope.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

import jax.numpy as jnp


def _axis_freqs(dim: int, end: int, theta: float = 10000.0) -> np.ndarray:
    """(end, dim//2) float64 angle table for one axis (reference :83-89)."""
    exponents = np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim
    freqs = 1.0 / theta**exponents
    return np.outer(np.arange(end, dtype=np.float64), freqs)


@lru_cache(maxsize=8)
def rope_tables_3d(head_dim: int, max_len: int = 1024, theta: float = 10000.0):
    """Per-axis (cos, sin) tables: f gets head_dim - 2*(head_dim//3) dims, h/w get
    head_dim//3 each (reference :75-80). Returns dict of numpy f32 arrays."""
    d_f = head_dim - 2 * (head_dim // 3)
    d_hw = head_dim // 3
    out = {}
    for name, d in (("f", d_f), ("h", d_hw), ("w", d_hw)):
        ang = _axis_freqs(d, max_len, theta)
        out[name] = (ang.astype(np.float64),)
        out[name] = (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))
    return out


def assemble_rope(tables, f: int, h: int, w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build (S, head_dim//2) cos/sin for the (f, h, w) token grid, row-major f->h->w
    (matches the expand/concat at reference :1474-1478)."""
    def grid(axis_cos, axis_sin, n, pos):
        # pos: 0 for f, 1 for h, 2 for w
        shape = [1, 1, 1, axis_cos.shape[1]]
        shape[pos] = n
        reps = [f, h, w, 1]
        reps[pos] = 1
        c = jnp.tile(jnp.asarray(axis_cos[:n]).reshape(shape), reps)
        s = jnp.tile(jnp.asarray(axis_sin[:n]).reshape(shape), reps)
        return c, s

    cf, sf = grid(*tables["f"], f, 0)
    ch, sh = grid(*tables["h"], h, 1)
    cw, sw = grid(*tables["w"], w, 2)
    cos = jnp.concatenate([cf, ch, cw], axis=-1).reshape(f * h * w, -1)
    sin = jnp.concatenate([sf, sh, sw], axis=-1).reshape(f * h * w, -1)
    return cos, sin


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved pairs. x: (B, S, N, D_h); cos/sin: (S, D_h//2).

    Matches reference rope_apply (:92-97): view as complex pairs (x[2i], x[2i+1]) and
    multiply by e^{i theta}; computed in f32, cast back to x.dtype.
    """
    b, s, n, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, s, n, d // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    c = cos.reshape(1, s, 1, d // 2)
    si = sin.reshape(1, s, 1, d // 2)
    # cast each rotated half back to x.dtype BEFORE assembling: halves the materialized
    # temp (f32 (B,S,N*D) copies showed up as the largest HBM allocations at A14B scale)
    out = jnp.stack(
        [(x0 * c - x1 * si).astype(x.dtype), (x0 * si + x1 * c).astype(x.dtype)], axis=-1
    )
    return out.reshape(b, s, n, d)
