"""Generic CLIP dual encoder (text + vision towers + projections), JAX.

Backbone for the ImageQualityMetric scorers
(reference: diffsynth/extensions/ImageQualityMetric/{aesthetic,clip,pickscore,
hps,mps}.py), which are all CLIP variants: HF `transformers.CLIPModel`
(Aesthetic's ViT-L/14, PickScore's ViT-H/14) or open_clip's ViT-H-14
(CLIPScore, HPSv2/v2.1). Both share one architecture — pre-LN transformer
towers, causal text attention with EOS pooling, CLS-pooled vision tower,
bias-free projections, learned logit scale — differing only in activation
(quick_gelu vs gelu), pooling rule, and checkpoint naming, so this module
implements the architecture once with small config switches plus two
converters (`clip_params_from_hf`, `clip_params_from_open_clip`).

Functional style matches the rest of the framework: params are pytrees of
arrays, blocks are stacked on a leading axis and driven by one `lax.scan`
(homogeneous layers -> single compiled block body).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    # text tower
    vocab_size: int = 49408
    text_dim: int = 512
    text_heads: int = 8
    text_layers: int = 12
    max_positions: int = 77
    # vision tower
    image_size: int = 224
    patch_size: int = 32
    vision_dim: int = 768
    vision_heads: int = 12
    vision_layers: int = 12
    # shared
    proj_dim: int = 512
    mlp_ratio: int = 4
    hidden_act: str = "quick_gelu"   # "quick_gelu" (HF CLIP) | "gelu" (open_clip ViT-H)
    text_pooling: str = "eos_token"  # "eos_token" (HF) | "argmax" (open_clip)
    eos_token_id: int = 49407
    eps: float = 1e-5


# HF CLIP-L/14 (Aesthetic's tower) and CLIP-H/14 (PickScore / open_clip scorers)
CLIP_L_14 = CLIPConfig(text_dim=768, text_heads=12, text_layers=12,
                       patch_size=14, vision_dim=1024, vision_heads=16,
                       vision_layers=24, proj_dim=768)
CLIP_H_14 = CLIPConfig(text_dim=1024, text_heads=16, text_layers=24,
                       patch_size=14, vision_dim=1280, vision_heads=16,
                       vision_layers=32, proj_dim=1024,
                       hidden_act="gelu", text_pooling="argmax")


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def _act(name, x):
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def _attn(p, x, num_heads, causal):
    b, s, d = x.shape
    h = num_heads
    q = (x @ p["q_w"] + p["q_b"]).reshape(b, s, h, d // h)
    k = (x @ p["k_w"] + p["k_b"]).reshape(b, s, h, d // h)
    v = (x @ p["v_w"] + p["v_b"]).reshape(b, s, h, d // h)
    logits = jnp.einsum("bqhc,bkhc->bhqk", q, k) * (d // h) ** -0.5
    if causal:
        mask = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhc->bqhc", probs, v).reshape(b, s, d)
    return out @ p["o_w"] + p["o_b"]


def _tower(blocks, x, num_heads, act, eps, causal):
    """Pre-LN transformer over stacked block params via one scan."""

    def body(h, bp):
        h = h + _attn(bp["attn"], _ln(bp["ln1"], h, eps), num_heads, causal)
        y = _ln(bp["ln2"], h, eps) @ bp["fc1_w"] + bp["fc1_b"]
        h = h + _act(act, y) @ bp["fc2_w"] + bp["fc2_b"]
        return h, None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


def clip_encode_text(params: Dict, cfg: CLIPConfig, input_ids: jnp.ndarray,
                     return_tokens: bool = False):
    """(B, S) int ids -> (B, proj_dim) projected pooled text features.

    Pooling: HF picks the first `eos_token_id` position
    (transformers CLIPTextTransformer), open_clip picks argmax(ids) — the EOT
    token has the highest id in the CLIP BPE vocab. `return_tokens` also
    returns the final-LN token features (needed by MPS).
    """
    p = params["text"]
    b, s = input_ids.shape
    x = p["tok_emb"][input_ids] + p["pos_emb"][:s]
    x = _tower(p["blocks"], x, cfg.text_heads, cfg.hidden_act, cfg.eps, causal=True)
    x = _ln(p["ln_final"], x, cfg.eps)
    if cfg.text_pooling == "eos_token":
        idx = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    else:
        idx = jnp.argmax(input_ids, axis=-1)
    pooled = x[jnp.arange(b), idx]
    feats = pooled @ params["text_proj"]
    return (feats, x) if return_tokens else feats


def clip_encode_image(params: Dict, cfg: CLIPConfig, pixels: jnp.ndarray,
                      return_tokens: bool = False):
    """(B, H, W, 3) preprocessed pixels -> (B, proj_dim) image features.

    CLS-pooled, post-LN, projected (HF CLIPVisionTransformer / open_clip
    VisualTransformer). `return_tokens` also returns ALL post-LN token
    features (B, 1+N, vision_dim) (needed by MPS).
    """
    p = params["vision"]
    b = pixels.shape[0]
    patches = jax.lax.conv_general_dilated(
        pixels, p["patch_w"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = patches.reshape(b, -1, cfg.vision_dim)
    cls = jnp.broadcast_to(p["cls_emb"], (b, 1, cfg.vision_dim))
    x = jnp.concatenate([cls, x], axis=1) + p["pos_emb"][:x.shape[1] + 1]
    x = _ln(p["ln_pre"], x, cfg.eps)
    x = _tower(p["blocks"], x, cfg.vision_heads, cfg.hidden_act, cfg.eps, causal=False)
    if return_tokens:
        tokens = _ln(p["ln_post"], x, cfg.eps)
        return tokens[:, 0] @ params["vis_proj"], tokens
    pooled = _ln(p["ln_post"], x[:, :1], cfg.eps)[:, 0]
    return pooled @ params["vis_proj"]


def clip_vision_hidden_states(params: Dict, cfg: CLIPConfig,
                              pixels: jnp.ndarray,
                              feature_layer: int = -2) -> jnp.ndarray:
    """(B, H, W, 3) preprocessed pixels -> (B, 1+N, vision_dim) token features
    from an INTERMEDIATE encoder layer, pre-ln_post — HF's
    `output_hidden_states[feature_layer]`. LLaVA conditions on the penultimate
    layer (-2) and drops the CLS token (vision_feature_select_strategy
    "default"); the CLS drop is the caller's job."""
    p = params["vision"]
    b = pixels.shape[0]
    patches = jax.lax.conv_general_dilated(
        pixels, p["patch_w"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = patches.reshape(b, -1, cfg.vision_dim)
    cls = jnp.broadcast_to(p["cls_emb"], (b, 1, cfg.vision_dim))
    x = jnp.concatenate([cls, x], axis=1) + p["pos_emb"][:x.shape[1] + 1]
    x = _ln(p["ln_pre"], x, cfg.eps)
    # hidden_states = [embeds, layer1, ..., layerL]; index -2 -> run L-1 blocks
    n_blocks = cfg.vision_layers + 1 + feature_layer if feature_layer < 0 \
        else feature_layer
    if not 0 <= n_blocks <= cfg.vision_layers:
        raise ValueError(f"feature_layer {feature_layer} out of range for "
                         f"{cfg.vision_layers} vision layers")
    blocks = jax.tree_util.tree_map(lambda a: a[:n_blocks], p["blocks"])
    return _tower(blocks, x, cfg.vision_heads, cfg.hidden_act, cfg.eps,
                  causal=False)


def clip_similarity(params: Dict, cfg: CLIPConfig, pixels: jnp.ndarray,
                    input_ids: jnp.ndarray, apply_logit_scale: bool = True):
    """Cosine similarity matrix (n_text, n_image), optionally scaled by
    exp(logit_scale) — the `logits_per_text` of HF CLIPModel."""
    img = clip_encode_image(params, cfg, pixels)
    txt = clip_encode_text(params, cfg, input_ids)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    sim = txt @ img.T
    if apply_logit_scale:
        sim = jnp.exp(params["logit_scale"]) * sim
    return sim


# ---------------------------------------------------------------------------
# Converters
# ---------------------------------------------------------------------------


def _stack(rows):
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *rows)


def _hf_block(sd, pre, i):
    g = lambda k: np.asarray(sd[f"{pre}.encoder.layers.{i}.{k}"])
    return {
        "ln1": {"scale": g("layer_norm1.weight"), "bias": g("layer_norm1.bias")},
        "ln2": {"scale": g("layer_norm2.weight"), "bias": g("layer_norm2.bias")},
        "attn": {
            "q_w": g("self_attn.q_proj.weight").T, "q_b": g("self_attn.q_proj.bias"),
            "k_w": g("self_attn.k_proj.weight").T, "k_b": g("self_attn.k_proj.bias"),
            "v_w": g("self_attn.v_proj.weight").T, "v_b": g("self_attn.v_proj.bias"),
            "o_w": g("self_attn.out_proj.weight").T, "o_b": g("self_attn.out_proj.bias"),
        },
        "fc1_w": g("mlp.fc1.weight").T, "fc1_b": g("mlp.fc1.bias"),
        "fc2_w": g("mlp.fc2.weight").T, "fc2_b": g("mlp.fc2.bias"),
    }


def clip_params_from_hf(sd: Dict[str, np.ndarray], cfg: CLIPConfig) -> Dict:
    """Convert a `transformers.CLIPModel` state_dict (numpy values)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    text = {
        "tok_emb": sd["text_model.embeddings.token_embedding.weight"],
        "pos_emb": sd["text_model.embeddings.position_embedding.weight"],
        "blocks": _stack([_hf_block(sd, "text_model", i)
                          for i in range(cfg.text_layers)]),
        "ln_final": {"scale": sd["text_model.final_layer_norm.weight"],
                     "bias": sd["text_model.final_layer_norm.bias"]},
    }
    # HF conv weight (out, in, kh, kw) -> HWIO
    patch = sd["vision_model.embeddings.patch_embedding.weight"]
    vision = {
        "patch_w": np.transpose(patch, (2, 3, 1, 0)),
        "cls_emb": sd["vision_model.embeddings.class_embedding"],
        "pos_emb": sd["vision_model.embeddings.position_embedding.weight"],
        "ln_pre": {"scale": sd["vision_model.pre_layrnorm.weight"],
                   "bias": sd["vision_model.pre_layrnorm.bias"]},
        "blocks": _stack([_hf_block(sd, "vision_model", i)
                          for i in range(cfg.vision_layers)]),
        "ln_post": {"scale": sd["vision_model.post_layernorm.weight"],
                    "bias": sd["vision_model.post_layernorm.bias"]},
    }
    return {
        "text": text,
        "vision": vision,
        "text_proj": sd["text_projection.weight"].T,
        "vis_proj": sd["visual_projection.weight"].T,
        "logit_scale": sd["logit_scale"],
    }


def _open_clip_block(sd, pre, i, dim):
    g = lambda k: np.asarray(sd[f"{pre}.resblocks.{i}.{k}"])
    in_w, in_b = g("attn.in_proj_weight"), g("attn.in_proj_bias")
    return {
        "ln1": {"scale": g("ln_1.weight"), "bias": g("ln_1.bias")},
        "ln2": {"scale": g("ln_2.weight"), "bias": g("ln_2.bias")},
        "attn": {
            "q_w": in_w[:dim].T, "q_b": in_b[:dim],
            "k_w": in_w[dim:2 * dim].T, "k_b": in_b[dim:2 * dim],
            "v_w": in_w[2 * dim:].T, "v_b": in_b[2 * dim:],
            "o_w": g("attn.out_proj.weight").T, "o_b": g("attn.out_proj.bias"),
        },
        "fc1_w": g("mlp.c_fc.weight").T, "fc1_b": g("mlp.c_fc.bias"),
        "fc2_w": g("mlp.c_proj.weight").T, "fc2_b": g("mlp.c_proj.bias"),
    }


def clip_params_from_open_clip(sd: Dict[str, np.ndarray], cfg: CLIPConfig) -> Dict:
    """Convert an open_clip CLIP state_dict (`visual.*` / `transformer.*`
    naming, packed in_proj QKV, matrix projections)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    text = {
        "tok_emb": sd["token_embedding.weight"],
        "pos_emb": sd["positional_embedding"],
        "blocks": _stack([_open_clip_block(sd, "transformer", i, cfg.text_dim)
                          for i in range(cfg.text_layers)]),
        "ln_final": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]},
    }
    patch = sd["visual.conv1.weight"]
    vision = {
        "patch_w": np.transpose(patch, (2, 3, 1, 0)),
        "cls_emb": sd["visual.class_embedding"],
        "pos_emb": sd["visual.positional_embedding"],
        "ln_pre": {"scale": sd["visual.ln_pre.weight"],
                   "bias": sd["visual.ln_pre.bias"]},
        "blocks": _stack([_open_clip_block(sd, "visual.transformer", i, cfg.vision_dim)
                          for i in range(cfg.vision_layers)]),
        "ln_post": {"scale": sd["visual.ln_post.weight"],
                    "bias": sd["visual.ln_post.bias"]},
    }
    return {
        "text": text,
        "vision": vision,
        "text_proj": sd["text_projection"],
        "vis_proj": sd["visual.proj"],
        "logit_scale": sd["logit_scale"],
    }


def init_clip(key, cfg: CLIPConfig, dtype=jnp.float32) -> Dict:
    """Random init with the right shapes (tests / shape-checking)."""
    ks = iter(jax.random.split(key, 8 * (cfg.text_layers + cfg.vision_layers) + 16))
    n = lambda *s: (jax.random.normal(next(ks), s, dtype) * 0.02)

    def block(dim):
        m = dim * cfg.mlp_ratio
        return {
            "ln1": {"scale": jnp.ones(dim, dtype), "bias": jnp.zeros(dim, dtype)},
            "ln2": {"scale": jnp.ones(dim, dtype), "bias": jnp.zeros(dim, dtype)},
            "attn": {"q_w": n(dim, dim), "q_b": jnp.zeros(dim, dtype),
                     "k_w": n(dim, dim), "k_b": jnp.zeros(dim, dtype),
                     "v_w": n(dim, dim), "v_b": jnp.zeros(dim, dtype),
                     "o_w": n(dim, dim), "o_b": jnp.zeros(dim, dtype)},
            "fc1_w": n(dim, m), "fc1_b": jnp.zeros(m, dtype),
            "fc2_w": n(m, dim), "fc2_b": jnp.zeros(dim, dtype),
        }

    def stack(dim, depth):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                      *[block(dim) for _ in range(depth)])

    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    return {
        "text": {
            "tok_emb": n(cfg.vocab_size, cfg.text_dim),
            "pos_emb": n(cfg.max_positions, cfg.text_dim),
            "blocks": stack(cfg.text_dim, cfg.text_layers),
            "ln_final": {"scale": jnp.ones(cfg.text_dim, dtype),
                         "bias": jnp.zeros(cfg.text_dim, dtype)},
        },
        "vision": {
            "patch_w": n(cfg.patch_size, cfg.patch_size, 3, cfg.vision_dim),
            "cls_emb": n(cfg.vision_dim),
            "pos_emb": n(n_patches + 1, cfg.vision_dim),
            "ln_pre": {"scale": jnp.ones(cfg.vision_dim, dtype),
                       "bias": jnp.zeros(cfg.vision_dim, dtype)},
            "blocks": stack(cfg.vision_dim, cfg.vision_layers),
            "ln_post": {"scale": jnp.ones(cfg.vision_dim, dtype),
                        "bias": jnp.zeros(cfg.vision_dim, dtype)},
        },
        "text_proj": n(cfg.text_dim, cfg.proj_dim),
        "vis_proj": n(cfg.vision_dim, cfg.proj_dim),
        "logit_scale": jnp.asarray(np.log(1 / 0.07), dtype),
    }
