"""AnimateDiff temporal motion modules for SD / SDXL UNets.

Parity with /root/reference/diffsynth/models/sd_motion.py: TemporalBlock
(GroupNorm -> proj_in -> N TemporalTransformerBlocks -> proj_out + residual,
:52-92) where each transformer block runs self+cross(-style) attention over the
FRAME axis with learned positional embeddings (:6-49). The SD model hangs 21
modules off plan indices (:94-142); SDXL hangs 15 (sdxl_motion.py:6-48).

Converter consumes the AnimateDiff mm_sd_v15 "diffusers"-naming checkpoints the
reference maps at :151-214.
"""

from __future__ import annotations

import math
from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.sd_unet import group_norm, layer_norm

# plan-index -> module-index maps (reference sd_motion.py:120-142,
# sdxl_motion.py:31-48)
SD_MOTION_CALL = {1: 0, 4: 1, 9: 2, 12: 3, 17: 4, 20: 5, 24: 6, 26: 7, 29: 8,
                  32: 9, 34: 10, 36: 11, 40: 12, 43: 13, 46: 14, 50: 15, 53: 16,
                  56: 17, 60: 18, 63: 19, 66: 20}
SDXL_MOTION_CALL = {0: 0, 2: 1, 7: 2, 10: 3, 15: 4, 18: 5, 25: 6, 28: 7, 31: 8,
                    35: 9, 38: 10, 41: 11, 44: 12, 46: 13, 48: 14}


def _temporal_attn(p, x, num_heads):
    """Attention over the frame axis. x: (BH, F, C) where BH = batch*pixels."""
    bh, f, c = x.shape
    q = (x @ p["q_w"]).reshape(bh, f, num_heads, -1)
    k = (x @ p["k_w"]).reshape(bh, f, num_heads, -1)
    v = (x @ p["v_w"]).reshape(bh, f, num_heads, -1)
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqnc,bknc->bnqk", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bnqk,bknc->bqnc", probs, v).reshape(bh, f, c)
    return out @ p["o_w"] + p["o_b"]


def temporal_transformer_block(p, x, num_heads, video_batch):
    """x: (B*F, HW, C) -> same (reference TemporalTransformerBlock.forward :27-49).
    Both attentions are temporal (the 'cross' one has no external context)."""
    bf, hw, c = x.shape
    f = bf // video_batch

    def to_frames(t):
        t = t.reshape(video_batch, f, hw, c).transpose(0, 2, 1, 3)
        return t.reshape(video_batch * hw, f, c)

    def from_frames(t):
        t = t.reshape(video_batch, hw, f, c).transpose(0, 2, 1, 3)
        return t.reshape(bf, hw, c)

    h = to_frames(layer_norm(p["norm1"], x))
    h = h + p["pe1"][:, :f].astype(h.dtype)
    x = x + from_frames(_temporal_attn(p["attn1"], h, num_heads))

    h = to_frames(layer_norm(p["norm2"], x))
    h = h + p["pe2"][:, :f].astype(h.dtype)
    x = x + from_frames(_temporal_attn(p["attn2"], h, num_heads))

    h = layer_norm(p["norm3"], x)
    g = h @ p["geglu_w"] + p["geglu_b"]
    a, gate = jnp.split(g, 2, axis=-1)
    h = a * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(x.dtype)
    return x + (h @ p["ff_w"] + p["ff_b"])


def temporal_block_apply(p, x, groups=32, video_batch=1, num_heads=8, eps=1e-6):
    """x: (B*F, H, W, C) NHWC -> same (reference TemporalBlock.forward :73-92)."""
    bf, h, w, c = x.shape
    residual = x
    t = group_norm(p["norm"], x, groups, eps=eps).reshape(bf, h * w, c)
    t = t @ p["proj_in_w"] + p["proj_in_b"]
    for tb in p["transformer_blocks"]:
        t = temporal_transformer_block(tb, t, num_heads, video_batch)
    t = t @ p["proj_out_w"] + p["proj_out_b"]
    return t.reshape(bf, h, w, c) + residual


# ---------------------------------------------------------------------------
# Converter + init
# ---------------------------------------------------------------------------


def _tb_from_torch(g, pre):
    def attn(a):
        return {
            "q_w": g(f"{pre}.{a}.to_q.weight").T,
            "k_w": g(f"{pre}.{a}.to_k.weight").T,
            "v_w": g(f"{pre}.{a}.to_v.weight").T,
            "o_w": g(f"{pre}.{a}.to_out.weight").T,
            "o_b": g(f"{pre}.{a}.to_out.bias"),
        }

    return {
        "pe1": g(f"{pre}.pe1"),
        "pe2": g(f"{pre}.pe2"),
        "norm1": {"scale": g(f"{pre}.norm1.weight"), "bias": g(f"{pre}.norm1.bias")},
        "norm2": {"scale": g(f"{pre}.norm2.weight"), "bias": g(f"{pre}.norm2.bias")},
        "norm3": {"scale": g(f"{pre}.norm3.weight"), "bias": g(f"{pre}.norm3.bias")},
        "attn1": attn("attn1"),
        "attn2": attn("attn2"),
        "geglu_w": g(f"{pre}.act_fn.proj.weight").T,
        "geglu_b": g(f"{pre}.act_fn.proj.bias"),
        "ff_w": g(f"{pre}.ff.weight").T,
        "ff_b": g(f"{pre}.ff.bias"),
    }


def motion_params_from_torch(sd, call_map=SD_MOTION_CALL) -> Dict:
    """diffsynth-format SDMotionModel/SDXLMotionModel state dict
    (motion_modules.{i}.* naming)."""
    g = lambda k: np.asarray(sd[k])
    modules = []
    i = 0
    while f"motion_modules.{i}.norm.weight" in sd:
        pre = f"motion_modules.{i}"
        tbs = []
        j = 0
        while f"{pre}.transformer_blocks.{j}.norm1.weight" in sd:
            tbs.append(_tb_from_torch(g, f"{pre}.transformer_blocks.{j}"))
            j += 1
        modules.append({
            "norm": {"scale": g(f"{pre}.norm.weight"), "bias": g(f"{pre}.norm.bias")},
            "proj_in_w": g(f"{pre}.proj_in.weight").T,
            "proj_in_b": g(f"{pre}.proj_in.bias"),
            "transformer_blocks": tbs,
            "proj_out_w": g(f"{pre}.proj_out.weight").T,
            "proj_out_b": g(f"{pre}.proj_out.bias"),
        })
        i += 1
    return {"modules": modules, "call": dict(call_map)}


def init_motion_modules(key, channels: List[int], call_map, heads=8,
                        max_pos=32, dtype=jnp.float32) -> Dict:
    """Random init (tests): one TemporalBlock per channel entry."""
    ks = iter(jax.random.split(key, 12 * len(channels) + 2))
    n = lambda *s: jax.random.normal(next(ks), s, dtype) * 0.02

    def tb(c):
        return {
            "pe1": jnp.zeros((1, max_pos, c), dtype),
            "pe2": jnp.zeros((1, max_pos, c), dtype),
            "norm1": {"scale": jnp.ones(c, dtype), "bias": jnp.zeros(c, dtype)},
            "norm2": {"scale": jnp.ones(c, dtype), "bias": jnp.zeros(c, dtype)},
            "norm3": {"scale": jnp.ones(c, dtype), "bias": jnp.zeros(c, dtype)},
            "attn1": {"q_w": n(c, c), "k_w": n(c, c), "v_w": n(c, c),
                      "o_w": n(c, c), "o_b": jnp.zeros(c, dtype)},
            "attn2": {"q_w": n(c, c), "k_w": n(c, c), "v_w": n(c, c),
                      "o_w": n(c, c), "o_b": jnp.zeros(c, dtype)},
            "geglu_w": n(c, 8 * c), "geglu_b": jnp.zeros(8 * c, dtype),
            "ff_w": n(4 * c, c), "ff_b": jnp.zeros(c, dtype),
        }

    modules = [{
        "norm": {"scale": jnp.ones(c, dtype), "bias": jnp.zeros(c, dtype)},
        "proj_in_w": n(c, c), "proj_in_b": jnp.zeros(c, dtype),
        "transformer_blocks": [tb(c)],
        "proj_out_w": n(c, c), "proj_out_b": jnp.zeros(c, dtype),
    } for c in channels]
    return {"modules": modules, "call": dict(call_map)}
