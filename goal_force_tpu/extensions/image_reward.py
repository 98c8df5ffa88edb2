"""ImageReward preference scorer (BLIP ViT-L/16 + BERT-MED + affine head).

Rebuilds the reference's ImageRewardScore
(reference: diffsynth/extensions/ImageQualityMetric/imagereward.py:55-212):
  reward = (MLP(BERT_MED(prompt, cross_attend(ViT(image)))[CLS]) - mean) / std
with mean=0.16717362830052426, std=1.0333394966054072 (imagereward.py:66-67).

Architecture notes (the upstream modules are unimportable here — BLIP/vit.py
needs timm and BLIP/med.py imports `apply_chunking_to_forward` from a
transformers location removed in 4.40+ — so parity tests anchor on
`transformers.ViTModel` / `transformers.BertEncoder`, which compute the same
math):
  * visual_encoder — timm-style pre-LN ViT-L/16 (patch conv WITH bias, cls
    token, learned pos embed, packed qkv, LN eps 1e-6, final LN, all tokens
    returned) (reference: BLIP/vit.py:109-199, blip.py create_vit 'large').
  * text_encoder — BERT-MED: HF-BERT fork with word+position embeddings only
    (no token_type), post-LN blocks, and a cross-attention sub-block after
    self-attention in EVERY layer when run in 'multimodal' mode, keys/values
    projected from the ViT width (reference: BLIP/med.py:44-90, 312-370).
    Additive mask (1-m)*-10000 on self-attention; image tokens unmasked.
  * head — the shared affine "MLP" (quality_metric.mlp_head_apply), input 768.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.extensions.quality_metric import (
    clip_preprocess,
    mlp_head_apply,
    mlp_head_from_torch,
)

IMAGE_REWARD_MEAN = 0.16717362830052426
IMAGE_REWARD_STD = 1.0333394966054072


@dataclasses.dataclass(frozen=True)
class BlipViTConfig:
    image_size: int = 224
    patch_size: int = 16
    dim: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    mlp_ratio: int = 4
    eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class MedConfig:
    vocab_size: int = 30524          # bert-base-uncased + [DEC]/[ENC] tokens
    dim: int = 768
    num_heads: int = 12
    num_layers: int = 12
    intermediate: int = 3072
    encoder_width: int = 1024        # ViT-L token width
    max_positions: int = 512
    eps: float = 1e-12


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def _mha(q, k, v, num_heads, bias=None):
    b, sq, d = q.shape
    sk = k.shape[1]
    h = num_heads
    dh = q.shape[-1] // h
    qh = q.reshape(b, sq, h, dh)
    kh = k.reshape(b, sk, h, dh)
    vh = v.reshape(b, sk, h, dh)
    logits = jnp.einsum("bqhc,bkhc->bhqk", qh, kh) / jnp.sqrt(dh).astype(q.dtype)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhc->bqhc", probs, vh).reshape(b, sq, -1)


# ---------------------------------------------------------------------------
# BLIP ViT (timm-style)
# ---------------------------------------------------------------------------


def blip_vit_apply(params: Dict, cfg: BlipViTConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, 1+N, dim) all token states (reference: vit.py:176-199)."""
    b = pixels.shape[0]
    x = jax.lax.conv_general_dilated(
        pixels, params["patch_w"], (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x.reshape(b, -1, cfg.dim) + params["patch_b"]
    cls = jnp.broadcast_to(params["cls"], (b, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1) + params["pos"][:x.shape[1] + 1]

    def body(h, bp):
        y = _ln(bp["ln1"], h, cfg.eps)
        qkv = y @ bp["qkv_w"] + bp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        h = h + _mha(q, k, v, cfg.num_heads) @ bp["proj_w"] + bp["proj_b"]
        y = _ln(bp["ln2"], h, cfg.eps)
        h = h + jax.nn.gelu(y @ bp["fc1_w"] + bp["fc1_b"], approximate=False) \
            @ bp["fc2_w"] + bp["fc2_b"]
        return h, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return _ln(params["ln_final"], x, cfg.eps)


# ---------------------------------------------------------------------------
# BERT-MED text encoder (multimodal mode: cross-attention in every layer)
# ---------------------------------------------------------------------------


def bert_med_apply(params: Dict, cfg: MedConfig, input_ids: jnp.ndarray,
                   attention_mask: jnp.ndarray,
                   encoder_states: jnp.ndarray) -> jnp.ndarray:
    """(B, S) ids + (B, S) mask + (B, T, encoder_width) image tokens ->
    (B, S, dim) last hidden states (reference: med.py BertModel 'multimodal')."""
    s = input_ids.shape[1]
    x = params["word_emb"][input_ids] + params["pos_emb"][:s]
    x = _ln(params["emb_ln"], x, cfg.eps)
    # HF additive mask: (1 - m) * -10000 broadcast to (B, 1, 1, S)
    mask_bias = ((1.0 - attention_mask.astype(jnp.float32))
                 * -10000.0)[:, None, None, :].astype(x.dtype)

    def body(h, bp):
        # self-attention + post-LN residual
        a = _mha(h @ bp["q_w"] + bp["q_b"], h @ bp["k_w"] + bp["k_b"],
                 h @ bp["v_w"] + bp["v_b"], cfg.num_heads, bias=mask_bias)
        h = _ln(bp["self_ln"], h + (a @ bp["self_out_w"] + bp["self_out_b"]),
                cfg.eps)
        # cross-attention to image tokens (unmasked) + post-LN residual
        a = _mha(h @ bp["xq_w"] + bp["xq_b"],
                 encoder_states @ bp["xk_w"] + bp["xk_b"],
                 encoder_states @ bp["xv_w"] + bp["xv_b"], cfg.num_heads)
        h = _ln(bp["x_ln"], h + (a @ bp["x_out_w"] + bp["x_out_b"]), cfg.eps)
        # feed-forward + post-LN residual
        y = jax.nn.gelu(h @ bp["fc1_w"] + bp["fc1_b"], approximate=False)
        h = _ln(bp["out_ln"], h + (y @ bp["fc2_w"] + bp["fc2_b"]), cfg.eps)
        return h, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return x


def image_reward_forward(params: Dict, vit_cfg: BlipViTConfig, med_cfg: MedConfig,
                         pixels: jnp.ndarray, input_ids: jnp.ndarray,
                         attention_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) + prompt ids/mask -> (B,) standardized rewards
    (reference: imagereward.py:69-90 score_grad)."""
    image_tokens = blip_vit_apply(params["vit"], vit_cfg, pixels)
    txt = bert_med_apply(params["bert"], med_cfg, input_ids, attention_mask,
                         image_tokens)
    reward = mlp_head_apply(params["mlp"], txt[:, 0])[:, 0]
    return (reward - IMAGE_REWARD_MEAN) / IMAGE_REWARD_STD


class ImageRewardScore:
    """score(images, prompt) -> list of rewards; `tokenize(prompt)` must return
    (ids, attention_mask) row vectors (the reference pads to max_length=35)."""

    def __init__(self, params: Dict,
                 tokenize: Callable[[str], Tuple[np.ndarray, np.ndarray]],
                 vit_cfg: BlipViTConfig = BlipViTConfig(),
                 med_cfg: MedConfig = MedConfig()):
        self.tokenize = tokenize
        self.vit_cfg = vit_cfg
        self._fn = jax.jit(lambda px, ids, m: image_reward_forward(
            params, vit_cfg, med_cfg, px, ids, m))

    def score(self, images, prompt: str) -> List[float]:
        if not isinstance(images, (list, tuple)):
            images = [images]
        px = jnp.asarray(np.stack([
            clip_preprocess(np.asarray(im), self.vit_cfg.image_size)
            for im in images]))
        ids, mask = self.tokenize(prompt)
        ids = jnp.asarray(np.asarray(ids).reshape(1, -1).astype(np.int32))
        mask = jnp.asarray(np.asarray(mask).reshape(1, -1).astype(np.float32))
        n = px.shape[0]
        out = self._fn(px, jnp.repeat(ids, n, 0), jnp.repeat(mask, n, 0))
        return [float(v) for v in np.asarray(out)]


# ---------------------------------------------------------------------------
# Converters
# ---------------------------------------------------------------------------


def _stack(rows):
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *rows)


def blip_vit_params_from_torch(sd: Dict[str, np.ndarray], cfg: BlipViTConfig,
                               prefix: str = "") -> Dict:
    """timm ViT naming: patch_embed.proj, cls_token, pos_embed,
    blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}, norm."""
    g = lambda k: np.asarray(sd[prefix + k])

    def block(i):
        b = lambda k: np.asarray(sd[f"{prefix}blocks.{i}.{k}"])
        return {
            "ln1": {"scale": b("norm1.weight"), "bias": b("norm1.bias")},
            "qkv_w": b("attn.qkv.weight").T, "qkv_b": b("attn.qkv.bias"),
            "proj_w": b("attn.proj.weight").T, "proj_b": b("attn.proj.bias"),
            "ln2": {"scale": b("norm2.weight"), "bias": b("norm2.bias")},
            "fc1_w": b("mlp.fc1.weight").T, "fc1_b": b("mlp.fc1.bias"),
            "fc2_w": b("mlp.fc2.weight").T, "fc2_b": b("mlp.fc2.bias"),
        }

    return {
        "patch_w": np.transpose(g("patch_embed.proj.weight"), (2, 3, 1, 0)),
        "patch_b": g("patch_embed.proj.bias"),
        "cls": g("cls_token")[0, 0],
        "pos": g("pos_embed")[0],
        "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
        "ln_final": {"scale": g("norm.weight"), "bias": g("norm.bias")},
    }


def bert_med_params_from_torch(sd: Dict[str, np.ndarray], cfg: MedConfig,
                               prefix: str = "") -> Dict:
    """med.py BertModel naming (HF BERT fork + per-layer crossattention)."""
    g = lambda k: np.asarray(sd[prefix + k])

    def block(i):
        b = lambda k: np.asarray(sd[f"{prefix}encoder.layer.{i}.{k}"])
        return {
            "q_w": b("attention.self.query.weight").T, "q_b": b("attention.self.query.bias"),
            "k_w": b("attention.self.key.weight").T, "k_b": b("attention.self.key.bias"),
            "v_w": b("attention.self.value.weight").T, "v_b": b("attention.self.value.bias"),
            "self_out_w": b("attention.output.dense.weight").T,
            "self_out_b": b("attention.output.dense.bias"),
            "self_ln": {"scale": b("attention.output.LayerNorm.weight"),
                        "bias": b("attention.output.LayerNorm.bias")},
            "xq_w": b("crossattention.self.query.weight").T,
            "xq_b": b("crossattention.self.query.bias"),
            "xk_w": b("crossattention.self.key.weight").T,
            "xk_b": b("crossattention.self.key.bias"),
            "xv_w": b("crossattention.self.value.weight").T,
            "xv_b": b("crossattention.self.value.bias"),
            "x_out_w": b("crossattention.output.dense.weight").T,
            "x_out_b": b("crossattention.output.dense.bias"),
            "x_ln": {"scale": b("crossattention.output.LayerNorm.weight"),
                     "bias": b("crossattention.output.LayerNorm.bias")},
            "fc1_w": b("intermediate.dense.weight").T, "fc1_b": b("intermediate.dense.bias"),
            "fc2_w": b("output.dense.weight").T, "fc2_b": b("output.dense.bias"),
            "out_ln": {"scale": b("output.LayerNorm.weight"),
                       "bias": b("output.LayerNorm.bias")},
        }

    return {
        "word_emb": g("embeddings.word_embeddings.weight"),
        "pos_emb": g("embeddings.position_embeddings.weight"),
        "emb_ln": {"scale": g("embeddings.LayerNorm.weight"),
                   "bias": g("embeddings.LayerNorm.bias")},
        "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
    }


def image_reward_params_from_torch(sd: Dict[str, np.ndarray],
                                   vit_cfg: BlipViTConfig = BlipViTConfig(),
                                   med_cfg: MedConfig = MedConfig()) -> Dict:
    """Full ImageReward checkpoint: blip.visual_encoder.*, blip.text_encoder.*,
    mlp.* (reference: imagereward.py ImageReward module)."""
    return {
        "vit": blip_vit_params_from_torch(sd, vit_cfg, "blip.visual_encoder."),
        "bert": bert_med_params_from_torch(sd, med_cfg, "blip.text_encoder."),
        "mlp": mlp_head_from_torch(
            {k[len("mlp."):]: v for k, v in sd.items() if k.startswith("mlp.")}),
    }


def load_image_reward(path: Dict[str, str]):
    """Reference load_path keys: 'imagereward' (safetensors) +
    'bert_model_path' (tokenizer dir)."""
    from goal_force_tpu.io.safetensors_io import load_safetensors

    sd = load_safetensors(path["imagereward"])
    params = jax.tree_util.tree_map(jnp.asarray, image_reward_params_from_torch(sd))

    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(path["bert_model_path"])

    def tokenize(prompt: str):
        out = tok(prompt, padding="max_length", truncation=True, max_length=35,
                  return_tensors="np")
        return out["input_ids"], out["attention_mask"]

    return ImageRewardScore(params, tokenize)


def init_image_reward(key, vit_cfg: BlipViTConfig, med_cfg: MedConfig,
                      dtype=jnp.float32) -> Dict:
    """Random init (tests / shape-checking)."""
    from goal_force_tpu.extensions.quality_metric import init_mlp_head

    ks = iter(jax.random.split(key, 8))
    n = lambda k, *s: jax.random.normal(k, s, dtype) * 0.02

    def vit_block(k):
        kk = jax.random.split(k, 4)
        d, m = vit_cfg.dim, vit_cfg.dim * vit_cfg.mlp_ratio
        return {
            "ln1": {"scale": jnp.ones(d, dtype), "bias": jnp.zeros(d, dtype)},
            "qkv_w": n(kk[0], d, 3 * d), "qkv_b": jnp.zeros(3 * d, dtype),
            "proj_w": n(kk[1], d, d), "proj_b": jnp.zeros(d, dtype),
            "ln2": {"scale": jnp.ones(d, dtype), "bias": jnp.zeros(d, dtype)},
            "fc1_w": n(kk[2], d, m), "fc1_b": jnp.zeros(m, dtype),
            "fc2_w": n(kk[3], m, d), "fc2_b": jnp.zeros(d, dtype),
        }

    def med_block(k):
        kk = jax.random.split(k, 9)
        d, m, e = med_cfg.dim, med_cfg.intermediate, med_cfg.encoder_width
        ln = lambda: {"scale": jnp.ones(d, dtype), "bias": jnp.zeros(d, dtype)}
        return {
            "q_w": n(kk[0], d, d), "q_b": jnp.zeros(d, dtype),
            "k_w": n(kk[1], d, d), "k_b": jnp.zeros(d, dtype),
            "v_w": n(kk[2], d, d), "v_b": jnp.zeros(d, dtype),
            "self_out_w": n(kk[3], d, d), "self_out_b": jnp.zeros(d, dtype),
            "self_ln": ln(),
            "xq_w": n(kk[4], d, d), "xq_b": jnp.zeros(d, dtype),
            "xk_w": n(kk[5], e, d), "xk_b": jnp.zeros(d, dtype),
            "xv_w": n(kk[6], e, d), "xv_b": jnp.zeros(d, dtype),
            "x_out_w": n(kk[7], d, d), "x_out_b": jnp.zeros(d, dtype),
            "x_ln": ln(),
            "fc1_w": n(kk[8], d, m), "fc1_b": jnp.zeros(m, dtype),
            "fc2_w": n(jax.random.fold_in(k, 9), m, d), "fc2_b": jnp.zeros(d, dtype),
            "out_ln": ln(),
        }

    np_tokens = (vit_cfg.image_size // vit_cfg.patch_size) ** 2
    vit = {
        "patch_w": n(next(ks), vit_cfg.patch_size, vit_cfg.patch_size, 3, vit_cfg.dim),
        "patch_b": jnp.zeros(vit_cfg.dim, dtype),
        "cls": n(next(ks), vit_cfg.dim),
        "pos": n(next(ks), np_tokens + 1, vit_cfg.dim),
        "blocks": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[vit_block(k) for k in jax.random.split(next(ks), vit_cfg.num_layers)]),
        "ln_final": {"scale": jnp.ones(vit_cfg.dim, dtype),
                     "bias": jnp.zeros(vit_cfg.dim, dtype)},
    }
    bert = {
        "word_emb": n(next(ks), med_cfg.vocab_size, med_cfg.dim),
        "pos_emb": n(next(ks), med_cfg.max_positions, med_cfg.dim),
        "emb_ln": {"scale": jnp.ones(med_cfg.dim, dtype),
                   "bias": jnp.zeros(med_cfg.dim, dtype)},
        "blocks": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[med_block(k) for k in jax.random.split(next(ks), med_cfg.num_layers)]),
    }
    return {"vit": vit, "bert": bert,
            "mlp": init_mlp_head(next(ks), med_cfg.dim, dtype)}
