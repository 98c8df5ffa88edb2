"""Step1X Qwen2Connector: token refiner bridging Qwen2.5-VL states to Flux.

Reference /root/reference/diffsynth/models/step1x_connector.py:
- Qwen2Connector (:633-667): masked-mean global embedding scaled by
  (1 + scale_factor) through a 768-wide projection, plus a SingleTokenRefiner
  producing the refined per-token states.
- SingleTokenRefiner (:547-630): input linear, timestep MLP (cos-first
  sinusoid :130-162) + masked-mean context MLP -> conditioning c; depth x
  IndividualTokenRefinerBlock (:284-387): LayerNorm, biased fused qkv,
  padding-pair mask (column 0 always attendable :517-540), gated (zero-init
  adaLN) attention and SiLU MLP residuals.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Step1xConnectorConfig:
    in_channels: int = 3584
    hidden_size: int = 4096
    heads_num: int = 32
    depth: int = 2
    mlp_ratio: float = 4.0
    eps: float = 1e-6


def _ln(p, x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * p["scale"]
            + p["bias"]).astype(x.dtype)


def _timestep_embedding(t, dim, max_period=10000.0):
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def _mlp2(p, x):
    h = x @ p["fc0"]["w"] + p["fc0"]["b"]
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    return h @ p["fc2"]["w"] + p["fc2"]["b"]


def _refiner_block(p, x, c, mask_bias, cfg: Step1xConnectorConfig):
    b, s, d = x.shape
    n = cfg.heads_num
    e = jax.nn.silu(c.astype(jnp.float32)).astype(c.dtype)
    e = e @ p["ada"]["w"] + p["ada"]["b"]
    gate_msa, gate_mlp = jnp.split(e, 2, axis=-1)

    h = _ln(p["norm1"], x, cfg.eps)
    qkv = h @ p["qkv"]["w"] + p["qkv"]["b"]
    q, k, v = [a.reshape(b, s, n, d // n) for a in jnp.split(qkv, 3, -1)]
    logits = jnp.einsum("bqnc,bknc->bnqk", q, k) / math.sqrt(d // n)
    logits = logits.astype(jnp.float32) + mask_bias
    probs = jax.nn.softmax(logits, -1).astype(x.dtype)
    att = jnp.einsum("bnqk,bknc->bqnc", probs, v).reshape(b, s, d)
    x = x + (att @ p["proj"]["w"] + p["proj"]["b"]) * gate_msa[:, None]

    h = _ln(p["norm2"], x, cfg.eps)
    h = h @ p["mlp_fc0"]["w"] + p["mlp_fc0"]["b"]
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = h @ p["mlp_fc2"]["w"] + p["mlp_fc2"]["b"]
    return x + h * gate_mlp[:, None]


def step1x_connector_forward(params: Dict, cfg: Step1xConnectorConfig,
                             x: jnp.ndarray, t: jnp.ndarray,
                             mask: jnp.ndarray):
    """x (B, S, in), t (B,), mask (B, S) 0/1 ->
    (refined (B, S, hidden), global (B, 768)) (reference :655-661)."""
    mf = mask.astype(x.dtype)[..., None]
    x_mean = (x * mf).sum(1) / mf.sum(1)
    glob = x_mean * (1.0 + params["scale_factor"].astype(x.dtype))
    glob = glob @ params["global_proj"]["w"] + params["global_proj"]["b"]

    temb = _timestep_embedding(t, 256).astype(x.dtype)
    c = _mlp2(params["t_embedder"], temb) + _mlp2(params["c_embedder"], x_mean)

    h = x @ params["input_embedder"]["w"] + params["input_embedder"]["b"]
    pair = (mask[:, None, :] > 0) & (mask[:, :, None] > 0)
    pair = pair.at[:, :, 0].set(True)        # NaN guard (:539)
    mask_bias = jnp.where(pair[:, None], 0.0, jnp.finfo(jnp.float32).min)
    for blk in params["blocks"]:
        h = _refiner_block(blk, h, c, mask_bias, cfg)
    return h, glob


def init_step1x_connector(key, cfg: Step1xConnectorConfig,
                          dtype=jnp.float32) -> Dict:
    d, di = cfg.hidden_size, cfg.in_channels
    mlp_dim = int(d * cfg.mlp_ratio)
    ks = jax.random.split(key, cfg.depth + 6)
    lin = lambda k, a, b: {"w": jax.random.normal(k, (a, b), dtype) * 0.02,
                           "b": jnp.zeros((b,), dtype)}
    nrm = lambda: {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    def block(k):
        kk = jax.random.split(k, 5)
        return {
            "norm1": nrm(), "norm2": nrm(),
            "qkv": lin(kk[0], d, 3 * d),
            "proj": lin(kk[1], d, d),
            "mlp_fc0": lin(kk[2], d, mlp_dim),
            "mlp_fc2": lin(kk[3], mlp_dim, d),
            "ada": {"w": jnp.zeros((d, 2 * d), dtype),
                    "b": jnp.zeros((2 * d,), dtype)},
        }

    return {
        "input_embedder": lin(ks[0], di, d),
        "t_embedder": {"fc0": lin(ks[1], 256, d), "fc2": lin(ks[1], d, d)},
        "c_embedder": {"fc0": lin(ks[2], di, d), "fc2": lin(ks[2], d, d)},
        "blocks": [block(k) for k in ks[3:3 + cfg.depth]],
        "global_proj": lin(ks[-1], di, 768),
        "scale_factor": jnp.full((1,), -(1.0 - 0.09), dtype),
    }


def step1x_connector_params_from_torch(sd, cfg: Step1xConnectorConfig) -> Dict:
    g = lambda k: jnp.asarray(np.asarray(sd[k]))
    lin = lambda pre: {"w": g(pre + ".weight").T, "b": g(pre + ".bias")}
    nrm = lambda pre: {"scale": g(pre + ".weight"), "bias": g(pre + ".bias")}

    def block(i):
        pre = f"S.individual_token_refiner.blocks.{i}"
        return {
            "norm1": nrm(pre + ".norm1"),
            "norm2": nrm(pre + ".norm2"),
            "qkv": lin(pre + ".self_attn_qkv"),
            "proj": lin(pre + ".self_attn_proj"),
            "mlp_fc0": lin(pre + ".mlp.fc1"),
            "mlp_fc2": lin(pre + ".mlp.fc2"),
            "ada": lin(pre + ".adaLN_modulation.1"),
        }

    return {
        "input_embedder": lin("S.input_embedder"),
        "t_embedder": {"fc0": lin("S.t_embedder.mlp.0"),
                       "fc2": lin("S.t_embedder.mlp.2")},
        "c_embedder": {"fc0": lin("S.c_embedder.linear_1"),
                       "fc2": lin("S.c_embedder.linear_2")},
        "blocks": [block(i) for i in range(cfg.depth)],
        "global_proj": lin("global_proj_out"),
        "scale_factor": g("scale_factor"),
    }
