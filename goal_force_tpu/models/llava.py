"""LLaVA multimodal text encoder — HunyuanVideo-I2V's image-conditioned
prompt tower.

The reference wraps `transformers.LlavaForConditionalGeneration`
(/root/reference/diffsynth/models/hunyuan_video_text_encoder.py:52-101): a
CLIP-ViT vision tower, a 2-layer MLP projector, and the llava-llama-3-8B
decoder; the single `<image>` placeholder token in the prompt expands into
576 projected patch features, and the conditioning embedding is the decoder's
hidden state with the last `hidden_state_skip_layer` layers skipped.

TPU-native layout: NHWC pixels, stacked-layer param trees shared with
models/clip.py (vision) and models/text_encoders.py (llama core); the
vision/projector/decoder run as one jit-friendly function once the image
token has been spliced (host-side, shapes static given one image per row).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.clip import (
    CLIPConfig,
    _hf_block,
    _stack,
    clip_vision_hidden_states,
    init_clip,
)
from goal_force_tpu.models.text_encoders import (
    LlamaConfig,
    llama_layers,
    llama_params_from_torch,
)

# OpenAI CLIP normalization (reference vendored CLIPImageProcessor config,
# diffsynth/tokenizer_configs/hunyuan_video/tokenizer_2/preprocessor_config.json)
CLIP_IMAGE_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    """llava-llama-3-8b-text-encoder-tokenizer (HunyuanVideo-I2V): CLIP-L/14
    at 336px (24x24 = 576 patches) into a GELU MLP projector into the 8B
    llama. `image_token_id` is the vendored tokenizer's `<image>` (128257)."""

    text: LlamaConfig = dataclasses.field(default_factory=LlamaConfig)
    vision: CLIPConfig = dataclasses.field(default_factory=lambda: CLIPConfig(
        image_size=336, patch_size=14, vision_dim=1024, vision_heads=16,
        vision_layers=24, hidden_act="quick_gelu"))
    image_token_id: int = 128257
    vision_feature_layer: int = -2

    @property
    def num_image_tokens(self) -> int:
        return (self.vision.image_size // self.vision.patch_size) ** 2


def clip_preprocess_image(image, size: int = 336) -> np.ndarray:
    """CLIPImageProcessor semantics: bicubic resize of the SHORTEST edge to
    `size`, center crop, rescale to [0,1], OpenAI-CLIP normalize. Accepts a
    PIL image, uint8 array, or float array in [0,1]; returns (size, size, 3)
    float32 NHWC-ready pixels."""
    from PIL import Image

    if not isinstance(image, Image.Image):
        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0.0, 1.0) * 255.0).round().astype(np.uint8)
        image = Image.fromarray(arr)
    image = image.convert("RGB")
    w, h = image.size
    short = min(w, h)
    nw, nh = round(w * size / short), round(h * size / short)
    image = image.resize((nw, nh), Image.BICUBIC)
    left, top = (nw - size) // 2, (nh - size) // 2
    image = image.crop((left, top, left + size, top + size))
    arr = np.asarray(image, np.float32) / 255.0
    return (arr - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


def llava_image_features(params: Dict, cfg: LlavaConfig,
                         pixel_values: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) preprocessed pixels -> (B, 576, llama_dim) projected patch
    features: penultimate vision layer, CLS dropped (HF vision_feature_layer
    -2 / select strategy "default"), then the linear-GELU-linear projector."""
    feats = clip_vision_hidden_states({"vision": params["vision"]}, cfg.vision,
                                      pixel_values, cfg.vision_feature_layer)
    feats = feats[:, 1:]                                   # drop CLS
    p = params["proj"]
    h = jax.nn.gelu(feats @ p["w1"] + p["b1"], approximate=False)
    return h @ p["w2"] + p["b2"]


def llava_encode(params: Dict, cfg: LlavaConfig, input_ids,
                 pixel_values, attention_mask,
                 hidden_state_skip_layer: int = 2) -> jnp.ndarray:
    """(B, S) ids with ONE `<image>` token per row + (B, H, W, 3) pixels +
    0/1 mask -> (B, S-1+576, D) hidden states with the last
    `hidden_state_skip_layer` decoder layers skipped (reference
    hunyuan_video_text_encoder.py:63-68: hidden_states[-(skip+1)]).

    The image token SPLICES OUT and the 576 projected patch features splice
    in, exactly like HF's placeholder expansion; image positions are unmasked.
    The splice point is found host-side (eager), so the decoder itself sees
    static shapes.

    HF subtlety: hidden_states[-1] is taken AFTER the decoder's final RMSNorm
    while every intermediate entry is pre-norm, so skip=0 applies
    params["final_norm"]; skip>=1 (the reference always uses 2) does not."""
    ids = np.asarray(input_ids)
    b, s = ids.shape
    feats = llava_image_features(params, cfg, pixel_values)
    word_emb = jnp.asarray(params["llama"]["word_emb"])
    mask = jnp.asarray(attention_mask)

    rows_emb, rows_mask = [], []
    n_img = feats.shape[1]
    for i in range(b):
        hits = np.nonzero(ids[i] == cfg.image_token_id)[0]
        if len(hits) != 1:
            raise ValueError(
                f"row {i}: expected exactly one <image> token "
                f"(id {cfg.image_token_id}), found {len(hits)}")
        pos = int(hits[0])
        emb = word_emb[ids[i]]
        rows_emb.append(jnp.concatenate(
            [emb[:pos], feats[i].astype(emb.dtype), emb[pos + 1:]], axis=0))
        rows_mask.append(jnp.concatenate(
            [mask[i, :pos], jnp.ones((n_img,), mask.dtype), mask[i, pos + 1:]],
            axis=0))
    x = jnp.stack(rows_emb)
    merged_mask = jnp.stack(rows_mask)
    keep = cfg.text.num_layers - hidden_state_skip_layer
    out = llama_layers(params["llama"], cfg.text, x, merged_mask, keep)
    if hidden_state_skip_layer == 0:
        from goal_force_tpu.models.text_encoders import _rms
        out = _rms(out, params["final_norm"]["w"], cfg.text.eps)
    return out


def llava_params_from_torch(sd, cfg: LlavaConfig) -> Dict:
    """Convert a `LlavaForConditionalGeneration` state_dict. Accepts both key
    layouts: the on-disk checkpoint naming (`language_model.model.*`,
    `vision_tower.*`, `multi_modal_projector.*`) and the transformers>=4.52
    module naming (`model.language_model.*`, ...)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if any(k.startswith("language_model.model.") for k in sd):
        lm, vt, mp = "language_model.model.", "vision_tower.", \
            "multi_modal_projector."
    elif any(k.startswith("model.language_model.") for k in sd):
        lm, vt, mp = "model.language_model.", "model.vision_tower.", \
            "model.multi_modal_projector."
    else:
        raise KeyError("not a LLaVA state dict: no language_model.* keys")

    patch = sd[vt + "vision_model.embeddings.patch_embedding.weight"]
    vision = {
        "patch_w": np.transpose(patch, (2, 3, 1, 0)),
        "cls_emb": sd[vt + "vision_model.embeddings.class_embedding"],
        "pos_emb": sd[vt + "vision_model.embeddings.position_embedding.weight"],
        "ln_pre": {"scale": sd[vt + "vision_model.pre_layrnorm.weight"],
                   "bias": sd[vt + "vision_model.pre_layrnorm.bias"]},
        "blocks": _stack([_hf_block(sd, vt + "vision_model", i)
                          for i in range(cfg.vision.vision_layers)]),
        "ln_post": {"scale": sd[vt + "vision_model.post_layernorm.weight"],
                    "bias": sd[vt + "vision_model.post_layernorm.bias"]},
    }
    proj = {
        "w1": sd[mp + "linear_1.weight"].T, "b1": sd[mp + "linear_1.bias"],
        "w2": sd[mp + "linear_2.weight"].T, "b2": sd[mp + "linear_2.bias"],
    }
    return {
        "vision": jax.tree_util.tree_map(jnp.asarray, vision),
        "proj": jax.tree_util.tree_map(jnp.asarray, proj),
        "llama": llama_params_from_torch(sd, cfg.text, prefix=lm),
        "final_norm": {"w": jnp.asarray(sd[lm + "norm.weight"])},
    }


def init_llava(key, cfg: LlavaConfig, dtype=jnp.float32) -> Dict:
    """Random init with the right shapes (tests / shape-checking)."""
    k1, k2, k3 = jax.random.split(key, 3)
    vision = init_clip(k1, cfg.vision, dtype)["vision"]
    d_v, d_t = cfg.vision.vision_dim, cfg.text.hidden_size
    n = lambda k, *s: jax.random.normal(k, s, dtype) * 0.02
    ks = jax.random.split(k2, 3 + 9 * cfg.text.num_layers)
    proj = {"w1": n(ks[0], d_v, d_t), "b1": jnp.zeros((d_t,), dtype),
            "w2": n(ks[1], d_t, d_t), "b2": jnp.zeros((d_t,), dtype)}

    t = cfg.text

    def block(j):
        kk = ks[3 + 9 * j: 12 + 9 * j]
        kv = t.num_kv_heads * t.head_dim
        return {
            "norm1": {"w": jnp.ones((t.hidden_size,), dtype)},
            "norm2": {"w": jnp.ones((t.hidden_size,), dtype)},
            "q": {"w": n(kk[0], t.hidden_size, t.hidden_size)},
            "k": {"w": n(kk[1], t.hidden_size, kv)},
            "v": {"w": n(kk[2], t.hidden_size, kv)},
            "o": {"w": n(kk[3], t.hidden_size, t.hidden_size)},
            "gate": {"w": n(kk[4], t.hidden_size, t.intermediate_size)},
            "up": {"w": n(kk[5], t.hidden_size, t.intermediate_size)},
            "down": {"w": n(kk[6], t.intermediate_size, t.hidden_size)},
        }

    llama = {
        "word_emb": n(k3, t.vocab, t.hidden_size),
        "blocks": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[block(j) for j in range(t.num_layers)]),
    }
    return {"vision": vision, "proj": proj, "llama": llama,
            "final_norm": {"w": jnp.ones((t.hidden_size,), dtype)}}
