"""StepVideo DiT as pure functions over a param pytree.

Architecture parity with /root/reference/diffsynth/models/stepvideo_dit.py:
PixArt-style adaLN-single (one 6*dim modulation shared by all blocks via
per-block scale_shift_table, :264-295, :680-712), NeoX split-half 3D rope with
per-head channel split (64, 32, 32) (:366-446), affine q/k RMSNorm, bias-free
attention projections, CROSS-ATTENTION ON THE UNMODULATED residual stream
(:686-703), caption norm + PixArt text projection with an optional CLIP branch
prepended (:798-813, :883-887), patch_size=1 patchify and the 2-way
scale_shift_table output modulation (:900-917).
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.wan_dit import gelu_tanh, layer_norm, linear, rms_norm
from goal_force_tpu.ops.attention import attention
from goal_force_tpu.parallel.mesh import constrain


@dataclasses.dataclass(frozen=True)
class StepVideoConfig:
    """StepVideo defaults (reference StepVideoModel.__init__ :749-813)."""

    num_heads: int = 48
    head_dim: int = 128
    num_layers: int = 48
    in_channels: int = 64
    caption_dim: int = 6144
    clip_dim: int = 1024
    rope_split: Tuple[int, ...] = (64, 32, 32)
    eps: float = 1e-6

    @property
    def dim(self) -> int:
        return self.num_heads * self.head_dim


@lru_cache(maxsize=8)
def stepvideo_rope_tables(f: int, h: int, w: int, rope_split: Tuple[int, ...],
                          theta: float = 1e4):
    """Per-axis half-tables ((S, d_i//2) cos, sin) for the (f, h, w) grid
    (reference RoPE3D :410-446; cos = cat(freqs, freqs) => split-half rotation)."""
    grids = np.meshgrid(np.arange(f), np.arange(h), np.arange(w), indexing="ij")
    out = []
    for i, d in enumerate(rope_split):
        freqs = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        ang = np.outer(grids[i].reshape(-1).astype(np.float64), freqs)
        out.append((np.cos(ang).astype(np.float32),
                    np.sin(ang).astype(np.float32)))
    return tuple(out)


def _apply_rope_neox(x, cos, sin):
    """Split-half rotation (reference rotate_half :386-389): x (B, S, N, D);
    cos/sin (S, D//2)."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    c = cos[None, :, None, :].astype(jnp.float32)
    s = sin[None, :, None, :].astype(jnp.float32)
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate([(x1f * c - x2f * s).astype(x.dtype),
                            (x2f * c + x1f * s).astype(x.dtype)], axis=-1)


def _apply_rope_3d(x, tables, rope_split):
    parts = []
    start = 0
    for (cos, sin), d in zip(tables, rope_split):
        parts.append(_apply_rope_neox(x[..., start:start + d], cos, sin))
        start += d
    return jnp.concatenate(parts, axis=-1)


def stepvideo_block(p, x, kv, t6, tables, cfg: StepVideoConfig, attn_impl="auto"):
    """StepVideoTransformerBlock.forward (:680-712)."""
    n = cfg.num_heads
    b, s, d = x.shape
    mod = p["scale_shift_table"].astype(t6.dtype)[None] + t6.reshape(b, 6, d)
    sm, sc, g, smlp, scmlp, gmlp = [mod[:, i][:, None] for i in range(6)]

    h = layer_norm(x, cfg.eps, p["norm1"]["w"], p["norm1"]["b"]) * (1 + sc) + sm
    q, k, v = jnp.split(linear_nb(p["attn1"]["qkv"], h), 3, axis=-1)
    q = rms_norm(q.reshape(b, s, n, -1), p["attn1"]["q_norm"]["w"], cfg.eps)
    k = rms_norm(k.reshape(b, s, n, -1), p["attn1"]["k_norm"]["w"], cfg.eps)
    v = v.reshape(b, s, n, -1)
    q = _apply_rope_3d(q, tables, cfg.rope_split)
    k = _apply_rope_3d(k, tables, cfg.rope_split)
    q = constrain(q, "dp", None, "sp", "tp")
    k = constrain(k, "dp", None, "sp", "tp")
    v = constrain(v, "dp", None, "sp", "tp")
    out = attention(q, k, v, impl=attn_impl)
    # keep head sharding until the o-projection (see wan_dit.self_attention)
    out = constrain(out, "dp", None, "sp", "tp").reshape(b, s, d)
    x = x + g * linear_nb(p["attn1"]["o"], out)

    # cross-attention on the raw residual stream (:699-703)
    t = kv.shape[1]
    q = rms_norm(linear_nb(p["attn2"]["q"], x).reshape(b, s, n, -1),
                 p["attn2"]["q_norm"]["w"], cfg.eps)
    kk, vv = jnp.split(linear_nb(p["attn2"]["kv"], kv), 2, axis=-1)
    kk = rms_norm(kk.reshape(b, t, n, -1), p["attn2"]["k_norm"]["w"], cfg.eps)
    vv = vv.reshape(b, t, n, -1)
    out = attention(q, kk, vv, impl=attn_impl).reshape(b, s, d)
    x = x + linear_nb(p["attn2"]["o"], out)

    h = layer_norm(x, cfg.eps, p["norm2"]["w"], p["norm2"]["b"]) * (1 + scmlp) + smlp
    h = linear_nb(p["ff"]["fc2"], gelu_tanh(linear_nb(p["ff"]["fc0"], h)))
    return x + gmlp * h


def linear_nb(p, x):
    out = jnp.matmul(x, p["w"])
    return out + p["b"] if "b" in p else out


def stepvideo_dit_forward(
    params: Dict,
    cfg: StepVideoConfig,
    latents: jnp.ndarray,            # (B, F, H, W, 64) NTHWC
    timestep: jnp.ndarray,           # (B,) in [0, 1] (x1000 inside)
    caption_emb: jnp.ndarray,        # (B, L, 6144) step-llm hidden
    clip_emb: Optional[jnp.ndarray] = None,   # (B, Lc, 1024)
    remat: bool = False,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """StepVideoModel.forward (:847-917). Returns (B, F, H, W, 64)."""
    from goal_force_tpu.models.sd_unet import timestep_embedding

    b, f, h, w, c = latents.shape
    dtype = params["proj_out"]["w"].dtype
    d = cfg.dim
    # patch_size=1: the PatchEmbed conv is a per-pixel linear
    x = linear(params["patch_in"], latents.reshape(b, f * h * w, c))

    # adaLN-single (timestep rescaled x1000, :288-295)
    temb = timestep_embedding(timestep * 1000.0, 256).astype(dtype)
    temb = linear(params["time_emb"]["fc2"],
                  jax.nn.silu(linear(params["time_emb"]["fc0"], temb)
                              .astype(jnp.float32)).astype(dtype))
    t6 = linear(params["adaln_linear"],
                jax.nn.silu(temb.astype(jnp.float32)).astype(dtype))

    cap = layer_norm(caption_emb.astype(dtype), cfg.eps)
    cap = linear(params["caption_proj"]["fc2"],
                 gelu_tanh(linear(params["caption_proj"]["fc0"], cap)))
    if clip_emb is not None and "clip_proj" in params:
        clip = linear(params["clip_proj"], clip_emb.astype(dtype))
        cap = jnp.concatenate([clip, cap], axis=1)

    tables = stepvideo_rope_tables(f, h, w, tuple(cfg.rope_split))
    tables = tuple((jnp.asarray(cs), jnp.asarray(sn)) for cs, sn in tables)

    def body(carry, p):
        carry = constrain(carry, "dp", "sp", None)
        return stepvideo_block(p, carry, cap, t6, tables, cfg, attn_impl), None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    x, _ = jax.lax.scan(body, x, params["blocks"])

    mod = params["scale_shift_table"].astype(dtype)[None] + temb[:, None]
    shift, scale = mod[:, 0][:, None], mod[:, 1][:, None]
    x = layer_norm(x, cfg.eps) * (1 + scale) + shift
    x = linear(params["proj_out"], x)
    return x.reshape(b, f, h, w, cfg.in_channels)


# ---------------------------------------------------------------------------
# Init + converter
# ---------------------------------------------------------------------------

def _lin_init(key, d_in, d_out, dtype, bias=True):
    s = 1.0 / math.sqrt(d_in)
    p = {"w": jax.random.uniform(key, (d_in, d_out), dtype, -s, s)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def init_stepvideo_dit(key, cfg: StepVideoConfig, dtype=jnp.bfloat16) -> Dict:
    d = cfg.dim
    ks = jax.random.split(key, 10)

    def block(k):
        kk = jax.random.split(k, 6)
        return {
            "norm1": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
            "norm2": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
            "attn1": {"qkv": _lin_init(kk[0], d, 3 * d, dtype, bias=False),
                      "o": _lin_init(kk[1], d, d, dtype, bias=False),
                      "q_norm": {"w": jnp.ones((cfg.head_dim,), dtype)},
                      "k_norm": {"w": jnp.ones((cfg.head_dim,), dtype)}},
            "attn2": {"q": _lin_init(kk[2], d, d, dtype, bias=False),
                      "kv": _lin_init(kk[3], d, 2 * d, dtype, bias=False),
                      "o": _lin_init(kk[4], d, d, dtype, bias=False),
                      "q_norm": {"w": jnp.ones((cfg.head_dim,), dtype)},
                      "k_norm": {"w": jnp.ones((cfg.head_dim,), dtype)}},
            "ff": {"fc0": _lin_init(kk[5], d, 4 * d, dtype, bias=False),
                   "fc2": _lin_init(kk[5], 4 * d, d, dtype, bias=False)},
            "scale_shift_table": jax.random.normal(kk[5], (6, d), dtype) / d**0.5,
        }

    stack = lambda bs: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *bs)
    return {
        "patch_in": _lin_init(ks[0], cfg.in_channels, d, dtype),
        "time_emb": {"fc0": _lin_init(ks[1], 256, d, dtype),
                     "fc2": _lin_init(ks[2], d, d, dtype)},
        "adaln_linear": _lin_init(ks[3], d, 6 * d, dtype),
        "caption_proj": {"fc0": _lin_init(ks[4], cfg.caption_dim, d, dtype),
                         "fc2": _lin_init(ks[5], d, d, dtype)},
        "clip_proj": _lin_init(ks[6], cfg.clip_dim, d, dtype),
        "blocks": stack([block(k) for k in jax.random.split(ks[7], cfg.num_layers)]),
        "scale_shift_table": jax.random.normal(ks[8], (2, d), dtype) / d**0.5,
        "proj_out": _lin_init(ks[9], d, cfg.in_channels, dtype),
    }


def stepvideo_dit_params_from_torch(sd, cfg: StepVideoConfig) -> Dict:
    g = lambda k: np.asarray(sd[k])
    lin = lambda p: ({"w": g(p + ".weight").T, "b": g(p + ".bias")}
                     if p + ".bias" in sd else {"w": g(p + ".weight").T})
    n, hd = cfg.num_heads, cfg.head_dim

    def fused(p, parts):
        """The reference views the fused projection per-head as (n, parts*hd) and
        splits the LAST dim (:489-493) — reorder columns so plain thirds work."""
        w = g(p + ".weight").T                       # (in, parts*D)
        w = w.reshape(-1, n, parts, hd).transpose(0, 2, 1, 3)
        return {"w": np.ascontiguousarray(w.reshape(w.shape[0], parts * n * hd))}

    def block(i):
        pre = f"transformer_blocks.{i}"
        return {
            "norm1": {"w": g(pre + ".norm1.weight"), "b": g(pre + ".norm1.bias")},
            "norm2": {"w": g(pre + ".norm2.weight"), "b": g(pre + ".norm2.bias")},
            "attn1": {"qkv": fused(pre + ".attn1.wqkv", 3),
                      "o": lin(pre + ".attn1.wo"),
                      "q_norm": {"w": g(pre + ".attn1.q_norm.weight")},
                      "k_norm": {"w": g(pre + ".attn1.k_norm.weight")}},
            "attn2": {"q": lin(pre + ".attn2.wq"),
                      "kv": fused(pre + ".attn2.wkv", 2),
                      "o": lin(pre + ".attn2.wo"),
                      "q_norm": {"w": g(pre + ".attn2.q_norm.weight")},
                      "k_norm": {"w": g(pre + ".attn2.k_norm.weight")}},
            "ff": {"fc0": lin(pre + ".ff.net.0.proj"),
                   "fc2": lin(pre + ".ff.net.2")},
            "scale_shift_table": g(pre + ".scale_shift_table"),
        }

    stack = lambda bs: jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *bs)
    pw = g("pos_embed.proj.weight")    # (D, C, 1, 1)
    d = pw.shape[0]
    params = {
        "patch_in": {"w": pw[:, :, 0, 0].T, "b": g("pos_embed.proj.bias")},
        "time_emb": {"fc0": lin("adaln_single.emb.timestep_embedder.linear_1"),
                     "fc2": lin("adaln_single.emb.timestep_embedder.linear_2")},
        "adaln_linear": lin("adaln_single.linear"),
        "caption_proj": {"fc0": lin("caption_projection.linear_1"),
                         "fc2": lin("caption_projection.linear_2")},
        "blocks": stack([block(i) for i in range(cfg.num_layers)]),
        "scale_shift_table": g("scale_shift_table"),
        "proj_out": lin("proj_out"),
    }
    if "clip_projection.weight" in sd:
        params["clip_proj"] = lin("clip_projection")
    return params
