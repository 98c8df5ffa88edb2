"""Pallas TPU flash attention (forward).

Replaces the reference's FlashAttention-2/3 CUDA dependency
(/root/reference/diffsynth/models/wan_video_dit.py:35-48). Online-softmax tiling per the
standard TPU recipe: grid (batch*heads, Q tiles, KV tiles), f32 running max/sum/accumulator
in VMEM scratch, output written on the last KV tile. Non-causal (video DiT self/cross
attention), arbitrary kv length via scalar-prefetched true length + key masking (the Wan
sequence 32,760 pads to 32,768).

Head dim must be 128 (lane width) — true for Wan A14B (5120/40) and umt5 (4096/64? no:
the T5 path uses its own einsum attention; this kernel serves the DiT).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


def _fa_kernel(kv_len_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, bk):
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    kv_len = kv_len_ref[0]

    @pl.when(kv_idx * bk < kv_len)
    def _compute():
        q = q_ref[0]                       # (bq, H)
        k = k_ref[0]                       # (bk, H)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                           # (bq, bk)
        # NOTE: keep the mask straight-line. Branching it behind lax.cond (to skip the
        # two VPU passes on interior tiles) stalls Mosaic's pipeline and costs +70%
        # (343ms -> 582ms measured at the Wan shape).
        col = kv_idx * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, MASK_VALUE)

        m_prev = m_scr[...]                # (bq, LANES), lanes all equal
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)          # (bq, 1)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)                     # (bq, LANES)
        p = jnp.exp(s - jnp.max(m_next, axis=-1, keepdims=True))  # (bq, bk)
        l_next = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
        )
        m_scr[...] = m_next
        l_scr[...] = l_next

        v = v_ref[0]                       # (bk, H)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_attention(q, k, v, scale: float, block_q: int = 1024, block_k: int = 1024):
    """q: (B, Sq, N, H); k/v: (B, Skv, N, H) -> (B, Sq, N, H). H must be 128."""
    b, sq, n, h = q.shape
    skv = k.shape[1]
    if h != LANES:
        raise ValueError(f"flash_attention requires head_dim=128, got {h}")
    block_q = min(block_q, max(LANES, sq))
    block_k = min(block_k, max(LANES, skv))

    def to_bn(x):  # (B,S,N,H) -> (B*N, S, H)
        return x.transpose(0, 2, 1, 3).reshape(b * n, x.shape[1], h)

    qb = _pad_to(to_bn(q), 1, block_q)
    kb = _pad_to(to_bn(k), 1, block_k)
    vb = _pad_to(to_bn(v), 1, block_k)
    sq_p, skv_p = qb.shape[1], kb.shape[1]

    grid = (b * n, sq_p // block_q, skv_p // block_k)
    kernel = functools.partial(_fa_kernel, scale=scale, bk=block_k)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * n, sq_p, h), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, h), lambda bn, iq, ik, _len: (bn, iq, 0)),
                pl.BlockSpec((1, block_k, h), lambda bn, iq, ik, _len: (bn, ik, 0)),
                pl.BlockSpec((1, block_k, h), lambda bn, iq, ik, _len: (bn, ik, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, h), lambda bn, iq, ik, _len: (bn, iq, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, h), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(jnp.asarray([skv], jnp.int32), qb, kb, vb)

    out = out[:, :sq].reshape(b, n, sq, h).transpose(0, 2, 1, 3)
    return out
