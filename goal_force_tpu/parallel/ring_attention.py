"""Ring attention: sequence-parallel attention with KV blocks rotating over an ICI ring.

The reference plumbs ring attention through xfuser but never enables it (ring_degree
hardcoded to 1 — /root/reference/src/goal_force/wan_video_new.py:460-463). Here it is a
first-class alternative to the Ulysses (head-resharding) path: each device holds a token
shard, KV blocks ppermute around the ring, and per-block partial attentions merge through
streaming logsumexp — communication is point-to-point and overlaps with compute.

Use inside shard_map with q/k/v sharded on the sequence axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from goal_force_tpu.ops.attention import _xla_attention


def _xla_attention_with_lse(q, k, v, scale):
    logits = jnp.einsum("bsnh,btnh->bnst", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    lse = jax.nn.logsumexp(logits, axis=-1)                       # (B, N, Sq)
    out = jnp.einsum(
        "bnst,btnh->bsnh", jax.nn.softmax(logits, axis=-1).astype(q.dtype), v
    )
    return out, lse.transpose(0, 2, 1)                            # lse -> (B, Sq, N)


def _pallas_attention_with_lse(q, k, v, scale):
    from goal_force_tpu.ops.flash_attention import _fa_forward

    b, sq, n, h = q.shape
    out, lse_p = _fa_forward(q, k, v, scale, min(1024, max(128, sq)),
                             min(1024, max(128, k.shape[1])), with_lse=True)
    lse = lse_p[:, :sq, 0].reshape(b, n, sq).transpose(0, 2, 1)   # (B, Sq, N)
    return out, lse


def block_attention_with_lse(q, k, v, scale, impl: str = "auto"):
    if impl == "pallas" or (impl == "auto" and q.shape[-1] == 128
                            and jax.devices()[0].platform == "tpu"):
        return _pallas_attention_with_lse(q, k, v, scale)
    return _xla_attention_with_lse(q, k, v, scale)


def ring_attention(q, k, v, scale, axis_name: str, axis_size: int, impl: str = "auto"):
    """q/k/v: per-device token shards (B, S_local, N, H) -> local attention output over
    the GLOBAL sequence. KV rotates axis_size-1 times via ppermute (non-causal, so every
    device processes every block; no step-dependent masking needed)."""
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    o, lse = block_attention_with_lse(q, k, v, scale, impl)
    acc = o.astype(jnp.float32)
    m = lse                                  # running max over block lses
    l = jnp.ones_like(lse)                   # running sum of exp(lse_i - m)

    k_blk, v_blk = k, v
    for _ in range(axis_size - 1):
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        o_i, lse_i = block_attention_with_lse(q, k_blk, v_blk, scale, impl)
        m_new = jnp.maximum(m, lse_i)
        c_old = jnp.exp(m - m_new)
        c_new = jnp.exp(lse_i - m_new)
        acc = acc * c_old[..., None] + o_i.astype(jnp.float32) * c_new[..., None]
        l = l * c_old + c_new
        m = m_new
    return (acc / l[..., None]).astype(q.dtype)
