"""Flux auxiliary conditioning modules: InfiniteYou, value control, LoRA encoder.

Reference parity:
- InfiniteYouImageProjector (/root/reference/diffsynth/models/flux_infiniteyou.py):
  perceiver resampler — learned query latents cross-attend over projected
  ArcFace identity embeddings with the double-sqrt-scaled attention (:66-69),
  LayerNorm-first FFNs, final projection + LayerNorm.
- SingleValueEncoder / MultiValueEncoder
  (/root/reference/diffsynth/models/flux_value_control.py): value*1000 through
  a flip-sin-to-cos sinusoid, linear-SiLU-linear (zero-init output), broadcast
  over prefer_len learned positional tokens.
- FluxLoRAEncoder (/root/reference/diffsynth/models/flux_lora_encoder.py):
  per-layer learned probes x @ A^T @ B^T + LayerNorm, per-layer-type linear
  projections, CLIP encoder layers over [special, lora...] tokens, special
  token readout.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _ln(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# InfiniteYou
# ---------------------------------------------------------------------------

def _perceiver_attention(p, x, latents, heads, head_dim):
    """(b, n1, D) features + (b, n2, D) latents; kv over cat(x, latents)
    (reference :44-73)."""
    b, l, _ = latents.shape
    xn = _ln(p["norm1"], x)
    ln = _ln(p["norm2"], latents)
    q = ln @ p["q_w"]
    kv = jnp.concatenate([xn, ln], axis=1) @ p["kv_w"]
    k, v = jnp.split(kv, 2, axis=-1)
    q = q.reshape(b, l, heads, head_dim).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, heads, head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, heads, head_dim).transpose(0, 2, 1, 3)
    scale = 1.0 / math.sqrt(math.sqrt(head_dim))
    w = (q * scale) @ (k * scale).transpose(0, 1, 3, 2)
    w = jax.nn.softmax(w.astype(jnp.float32), -1).astype(x.dtype)
    out = (w @ v).transpose(0, 2, 1, 3).reshape(b, l, -1)
    return out @ p["o_w"]


def infiniteyou_projector(params: Dict, id_embeds: jnp.ndarray,
                          heads: int = 20, head_dim: int = 64) -> jnp.ndarray:
    """(B, N, 512) ArcFace tokens -> (B, num_queries, 4096) (reference
    :104-116)."""
    b = id_embeds.shape[0]
    latents = jnp.broadcast_to(params["latents"],
                               (b,) + params["latents"].shape[1:])
    x = id_embeds @ params["proj_in"]["w"] + params["proj_in"]["b"]
    latents = latents.astype(x.dtype)
    for layer in params["layers"]:
        latents = latents + _perceiver_attention(layer["attn"], x, latents,
                                                 heads, head_dim)
        h = _ln(layer["ff_norm"], latents)
        h = jax.nn.gelu(h @ layer["ff0_w"], approximate=False) @ layer["ff2_w"]
        latents = latents + h
    out = latents @ params["proj_out"]["w"] + params["proj_out"]["b"]
    return _ln(params["norm_out"], out)


def infiniteyou_params_from_torch(sd) -> Dict:
    g = lambda k: jnp.asarray(np.asarray(sd[k]))
    lin = lambda pre: {"w": g(pre + ".weight").T, "b": g(pre + ".bias")}
    nrm = lambda pre: {"scale": g(pre + ".weight"), "bias": g(pre + ".bias")}
    layers = []
    i = 0
    while f"layers.{i}.0.to_q.weight" in sd:
        layers.append({
            "attn": {"norm1": nrm(f"layers.{i}.0.norm1"),
                     "norm2": nrm(f"layers.{i}.0.norm2"),
                     "q_w": g(f"layers.{i}.0.to_q.weight").T,
                     "kv_w": g(f"layers.{i}.0.to_kv.weight").T,
                     "o_w": g(f"layers.{i}.0.to_out.weight").T},
            "ff_norm": nrm(f"layers.{i}.1.0"),
            "ff0_w": g(f"layers.{i}.1.1.weight").T,
            "ff2_w": g(f"layers.{i}.1.3.weight").T,
        })
        i += 1
    return {
        "latents": g("latents"),
        "proj_in": lin("proj_in"),
        "proj_out": lin("proj_out"),
        "norm_out": nrm("norm_out"),
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# Value control
# ---------------------------------------------------------------------------

def value_control_embedding(params: Dict, value: jnp.ndarray,
                            dim_in: int = 256,
                            prefer_len: int = 32) -> jnp.ndarray:
    """Scalar preference value -> (prefer_len, dim_out) tokens (reference
    SingleValueEncoder.forward :38-45). Sinusoid is flip_sin_to_cos
    ([cos|sin]) with no frequency shift."""
    v = value * 1000.0
    half = dim_in // 2
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = jnp.reshape(v, (-1,))[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    h = emb @ params["fc0"]["w"] + params["fc0"]["b"]
    h = jax.nn.silu(h)
    h = h @ params["fc2"]["w"] + params["fc2"]["b"]
    return jnp.broadcast_to(h, (prefer_len, h.shape[-1])) + params["pos"]


def multi_value_embedding(encoders: Sequence[Dict],
                          values: Sequence) -> jnp.ndarray:
    """Concatenate the token blocks of present values (reference
    MultiValueEncoder :10-17)."""
    parts = [value_control_embedding(p, jnp.asarray(v))
             for p, v in zip(encoders, values) if v is not None]
    return jnp.concatenate(parts, axis=0)


def value_encoder_params_from_torch(sd) -> Dict:
    g = lambda k: jnp.asarray(np.asarray(sd[k]))
    return {
        "fc0": {"w": g("prefer_value_embedder.0.weight").T,
                "b": g("prefer_value_embedder.0.bias")},
        "fc2": {"w": g("prefer_value_embedder.2.weight").T,
                "b": g("prefer_value_embedder.2.bias")},
        "pos": g("positional_embedding"),
    }


# ---------------------------------------------------------------------------
# LoRA encoder
# ---------------------------------------------------------------------------

def flux_lora_patterns() -> List[Dict]:
    """The 19x10 + 38x3 Flux LoRA target layers (reference :39-60)."""
    pats = []
    double = {"attn.a_to_qkv": (3072, 9216), "attn.a_to_out": (3072, 3072),
              "ff_a.0": (3072, 12288), "ff_a.2": (12288, 3072),
              "norm1_a.linear": (3072, 18432),
              "attn.b_to_qkv": (3072, 9216), "attn.b_to_out": (3072, 3072),
              "ff_b.0": (3072, 12288), "ff_b.2": (12288, 3072),
              "norm1_b.linear": (3072, 18432)}
    for i in range(19):
        for sfx, dim in double.items():
            pats.append({"name": f"blocks.{i}.{sfx}", "dim": dim, "type": sfx})
    single = {"to_qkv_mlp": (3072, 21504), "proj_out": (15360, 3072),
              "norm.linear": (3072, 9216)}
    for i in range(38):
        for sfx, dim in single.items():
            pats.append({"name": f"single_blocks.{i}.{sfx}", "dim": dim,
                         "type": sfx})
    return pats


def _clip_layer(p, x, heads, head_dim):
    res = x
    h = _ln(p["norm1"], x)
    b, s, _ = h.shape
    q = (h @ p["q_w"] + p["q_b"]).reshape(b, s, heads, head_dim)
    k = (h @ p["k_w"] + p["k_b"]).reshape(b, s, heads, head_dim)
    v = (h @ p["v_w"] + p["v_b"]).reshape(b, s, heads, head_dim)
    logits = jnp.einsum("bqnc,bknc->bnqk", q, k) / math.sqrt(head_dim)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    att = jnp.einsum("bnqk,bknc->bqnc", probs, v).reshape(b, s, -1)
    x = res + (att @ p["o_w"] + p["o_b"])
    res = x
    h = _ln(p["norm2"], x)
    h = h @ p["fc1_w"] + p["fc1_b"]
    h = h * jax.nn.sigmoid(1.702 * h)          # quickGELU
    return res + (h @ p["fc2_w"] + p["fc2_b"])


def flux_lora_encode(params: Dict, lora: Dict, patterns: List[Dict] = None,
                     heads: int = 32, head_dim: int = 128,
                     num_special: int = 1) -> jnp.ndarray:
    """LoRA state dict -> (1, num_special, embed_dim) summary embedding
    (reference FluxLoRAEncoder.forward :93-102)."""
    patterns = patterns or flux_lora_patterns()
    parts = []
    for pat in patterns:
        name, typ = pat["name"], pat["type"]
        a = jnp.asarray(np.asarray(lora[name + ".lora_A.default.weight"]))
        bb = jnp.asarray(np.asarray(lora[name + ".lora_B.default.weight"]))
        blk = params["model"][name]
        x = blk["x"] @ a.T @ bb.T
        x = _ln(blk["ln"], x)
        proj = params["proj"][typ]
        parts.append(x @ proj["w"] + proj["b"])
    emb = jnp.concatenate(parts, axis=1)
    special = params["special"].astype(emb.dtype)
    emb = jnp.concatenate([special, emb], axis=1)
    for layer in params["encoders"]:
        emb = _clip_layer(layer, emb, heads, head_dim)
    emb = emb[:, :num_special]
    emb = _ln(params["final_norm"], emb)
    return emb @ params["final_w"] + params["final_b"]


def flux_lora_encoder_params_from_torch(sd, patterns: List[Dict] = None) -> Dict:
    g = lambda k: jnp.asarray(np.asarray(sd[k]))
    patterns = patterns or flux_lora_patterns()
    model = {}
    for pat in patterns:
        key = "embedder.model_dict." + pat["name"].replace(".", "___")
        model[pat["name"]] = {
            "x": g(key + ".x"),
            "ln": {"scale": g(key + ".layer_norm.weight"),
                   "bias": g(key + ".layer_norm.bias")},
        }
    proj = {}
    for pat in patterns:
        key = "embedder.proj_dict." + pat["type"].replace(".", "___")
        if pat["type"] not in proj:
            proj[pat["type"]] = {"w": g(key + ".weight").T,
                                 "b": g(key + ".bias")}
    encoders = []
    i = 0
    while f"encoders.{i}.layer_norm1.weight" in sd:
        pre = f"encoders.{i}"
        encoders.append({
            "norm1": {"scale": g(pre + ".layer_norm1.weight"),
                      "bias": g(pre + ".layer_norm1.bias")},
            "norm2": {"scale": g(pre + ".layer_norm2.weight"),
                      "bias": g(pre + ".layer_norm2.bias")},
            "q_w": g(pre + ".attn.to_q.weight").T, "q_b": g(pre + ".attn.to_q.bias"),
            "k_w": g(pre + ".attn.to_k.weight").T, "k_b": g(pre + ".attn.to_k.bias"),
            "v_w": g(pre + ".attn.to_v.weight").T, "v_b": g(pre + ".attn.to_v.bias"),
            "o_w": g(pre + ".attn.to_out.weight").T, "o_b": g(pre + ".attn.to_out.bias"),
            "fc1_w": g(pre + ".fc1.weight").T, "fc1_b": g(pre + ".fc1.bias"),
            "fc2_w": g(pre + ".fc2.weight").T, "fc2_b": g(pre + ".fc2.bias"),
        })
        i += 1
    return {
        "model": model, "proj": proj, "encoders": encoders,
        "special": g("special_embeds"),
        "final_norm": {"scale": g("final_layer_norm.weight"),
                       "bias": g("final_layer_norm.bias")},
        "final_w": g("final_linear.weight").T, "final_b": g("final_linear.bias"),
    }


def flux_ip_kwargs(params: Dict, image_embeds: jnp.ndarray,
                   num_heads: int = 24, head_dim: int = 128,
                   scale: float = 1.0,
                   num_joint: int = 19, num_single: int = 38) -> Dict:
    """Project the SigLIP image embedding and emit stacked per-block IP K/V
    for flux_dit_forward(ipadapter=...): modules 0..18 feed the joint blocks,
    19..56 the single blocks (reference FluxIpAdapter.forward :60-72;
    norm_added_k RMS-normalizes the keys per head, :35-43)."""
    from goal_force_tpu.models.ipadapter import flux_ip_image_proj_apply

    tokens = flux_ip_image_proj_apply(params["image_proj"], image_embeds)

    def kv(m):
        k = (tokens @ m["k_w"]).reshape(tokens.shape[0], -1, num_heads,
                                        head_dim)
        # RMS over head_dim, no affine (flux_ipadapter.py:35)
        kf = k.astype(jnp.float32)
        k = (kf * jax.lax.rsqrt(jnp.mean(kf * kf, -1, keepdims=True) + 1e-5)
             ).astype(tokens.dtype)
        v = (tokens @ m["v_w"]).reshape(tokens.shape[0], -1, num_heads,
                                        head_dim)
        return k, v

    ks, vs = zip(*(kv(m) for m in params["modules"]))
    stack = lambda xs: jnp.stack(xs)
    joint = {"k": stack(ks[:num_joint]), "v": stack(vs[:num_joint]),
             "scale": jnp.full((num_joint,), scale, tokens.dtype)}
    single = {"k": stack(ks[num_joint:num_joint + num_single]),
              "v": stack(vs[num_joint:num_joint + num_single]),
              "scale": jnp.full((num_single,), scale, tokens.dtype)}
    return {"joint": joint, "single": single}
