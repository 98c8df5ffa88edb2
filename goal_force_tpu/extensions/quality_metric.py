"""ImageQualityMetric: learned image/prompt preference scorers.

Rebuilds the reference's ImageQualityMetric extension
(reference: diffsynth/extensions/ImageQualityMetric/__init__.py) on the JAX
CLIP in goal_force_tpu/models/clip.py:

  * AestheticScore — HF CLIP ViT-L/14 image features, L2-normalised, scored by
    the LAION "sac+logos+ava1-l14-linearMSE" head: a Linear 768->1024->128->
    64->16->1 chain whose ReLUs are commented out upstream, i.e. a purely
    affine stack; kept as separate layers for checkpoint fidelity
    (reference: ImageQualityMetric/aesthetic.py:10-93).
  * PickScore — HF CLIP ViT-H/14 fine-tune; cosine(text, image), optionally
    softmax(exp(logit_scale) * cos) across the image list (the reference
    applies the softmax per single image, which always yields 1.0; here it is
    taken over the batch, which is the trainer's semantics)
    (reference: ImageQualityMetric/pickscore.py:23-56).
  * CLIPScore — open_clip ViT-H-14; cosine of the normalised features
    (reference: ImageQualityMetric/clip.py:44-64).
  * HPScore v2 / v2.1 — the same open_clip ViT-H-14 architecture with the
    HPS fine-tuned weights; identical score formula
    (reference: ImageQualityMetric/hps.py:63-83).
  * MPScore — NOT implemented: the reference imports
    `.trainer.models.cross_modeling` which does not exist in the repository
    (reference: ImageQualityMetric/mps.py:20-21), so the upstream class cannot
    even be constructed; `load_preference_model("MPS")` raises with this
    explanation.
  * ImageRewardScore — BLIP-based; see goal_force_tpu/extensions/image_reward.py.

Scorers take a params pytree + a `tokenize(str) -> int ids` callable, so they
work with HF tokenizer files when available and with any stand-in during
tests. The reference's weight files (modelscope `DiffSynth-Studio/
QualityMetric_reward_pretrained`) load through `load_preference_model` given a
local directory with the same layout.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.clip import (
    CLIP_H_14,
    CLIP_L_14,
    CLIPConfig,
    clip_encode_image,
    clip_encode_text,
    clip_params_from_hf,
    clip_params_from_open_clip,
)

CLIP_MEAN = np.asarray((0.48145466, 0.4578275, 0.40821073), np.float32)
CLIP_STD = np.asarray((0.26862954, 0.26130258, 0.27577711), np.float32)


def clip_preprocess(image: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8/float (H, W, 3) -> (size, size, 3) float32, CLIP-normalised.

    Shortest-side bicubic resize + center crop + normalise — the
    CLIPProcessor / open_clip eval transform (reference: imagereward.py:16-22).
    """
    img = np.asarray(image)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected an (H, W, 3) RGB image, got shape {img.shape}")
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    h, w = img.shape[:2]
    scale = size / min(h, w)
    nh, nw = max(size, int(round(h * scale))), max(size, int(round(w * scale)))
    img = np.asarray(jax.image.resize(jnp.asarray(img), (nh, nw, 3), "bicubic"))
    top, left = (nh - size) // 2, (nw - size) // 2
    img = img[top:top + size, left:left + size]
    return (np.clip(img, 0.0, 1.0) - CLIP_MEAN) / CLIP_STD


def _as_image_batch(images, size: int) -> np.ndarray:
    if not isinstance(images, (list, tuple)):
        images = [images]
    return np.stack([clip_preprocess(np.asarray(im), size) for im in images])


# ---------------------------------------------------------------------------
# The affine "MLP" preference head
# ---------------------------------------------------------------------------


MLP_DIMS = (1024, 128, 64, 16, 1)


def mlp_head_apply(params: Sequence[Dict], x: jnp.ndarray) -> jnp.ndarray:
    """Chain of Linear layers (upstream commented out every ReLU; dropout is
    eval-off). (B, D) -> (B, 1)."""
    for layer in params:
        x = x @ layer["w"] + layer["b"]
    return x


def mlp_head_from_torch(sd: Dict[str, np.ndarray]) -> List[Dict]:
    """Convert the torch `MLP.layers` Sequential state_dict; Linears live at
    indices 0, 2, 4, 6, 7 (dropouts between)."""
    return [{"w": np.asarray(sd[f"layers.{i}.weight"]).T,
             "b": np.asarray(sd[f"layers.{i}.bias"])} for i in (0, 2, 4, 6, 7)]


def init_mlp_head(key, input_size: int = 768, dtype=jnp.float32) -> List[Dict]:
    dims = (input_size,) + MLP_DIMS
    keys = jax.random.split(key, len(MLP_DIMS))
    return [{"w": jax.random.normal(k, (dims[i], dims[i + 1]), dtype)
             / (input_size + 1),
             "b": jnp.zeros((dims[i + 1],), dtype)}
            for i, k in enumerate(keys)]


# ---------------------------------------------------------------------------
# Scorers
# ---------------------------------------------------------------------------


Tokenizer = Callable[[str], np.ndarray]  # prompt -> (S,) or (1, S) int ids


def _ids(tokenize: Tokenizer, prompt: str) -> jnp.ndarray:
    ids = np.asarray(tokenize(prompt))
    return jnp.asarray(ids.reshape(1, -1).astype(np.int32))


class AestheticScore:
    """score(images) -> aesthetic quality floats (prompt unused).

    reference: ImageQualityMetric/aesthetic.py:85-93 — normalised CLIP-L image
    features through the affine head.
    """

    def __init__(self, clip_params: Dict, mlp_params: Sequence[Dict],
                 cfg: CLIPConfig = CLIP_L_14):
        self.cfg = cfg
        self._fn = jax.jit(lambda px: mlp_head_apply(
            mlp_params,
            (lambda f: f / jnp.linalg.norm(f, axis=-1, keepdims=True))(
                clip_encode_image(clip_params, cfg, px)))[:, 0])

    def score(self, images, prompt: str = "") -> List[float]:
        del prompt
        px = _as_image_batch(images, self.cfg.image_size)
        return [float(s) for s in np.asarray(self._fn(jnp.asarray(px)))]


class _DualEncoderScore:
    """Shared cosine(text, image) machinery for PickScore / CLIPScore / HPS."""

    def __init__(self, params: Dict, cfg: CLIPConfig, tokenize: Tokenizer):
        self.cfg = cfg
        self.tokenize = tokenize
        self.logit_scale = float(np.asarray(params["logit_scale"]))

        def cosine(px, ids):
            img = clip_encode_image(params, cfg, px)
            txt = clip_encode_text(params, cfg, ids)
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
            return (txt @ img.T)[0]

        self._cosine = jax.jit(cosine)

    def _scores(self, images, prompt: str) -> np.ndarray:
        px = jnp.asarray(_as_image_batch(images, self.cfg.image_size))
        return np.asarray(self._cosine(px, _ids(self.tokenize, prompt)))


class PickScore(_DualEncoderScore):
    """reference: ImageQualityMetric/pickscore.py:23-56."""

    def score(self, images, prompt: str, softmax: bool = False) -> List[float]:
        s = self._scores(images, prompt)
        if softmax:
            # over the image batch (see module docstring re upstream quirk)
            e = np.exp(self.logit_scale) * s
            s = np.exp(e - e.max())
            s = s / s.sum()
        return [float(v) for v in s]


class CLIPScore(_DualEncoderScore):
    """reference: ImageQualityMetric/clip.py:44-64 (plain cosine)."""

    def score(self, images, prompt: str) -> List[float]:
        return [float(v) for v in self._scores(images, prompt)]


class HPScore(_DualEncoderScore):
    """HPSv2 / v2.1 share the CLIPScore formula with different weights
    (reference: ImageQualityMetric/hps.py:63-83)."""

    def score(self, images, prompt: str) -> List[float]:
        return [float(v) for v in self._scores(images, prompt)]


# Back-compat alias matching the reference class name.
HPScore_v2 = HPScore


# ---------------------------------------------------------------------------
# Loader (mirrors reference load_preference_model for local weight dirs)
# ---------------------------------------------------------------------------


def _hf_clip_tokenizer(path: str) -> Tokenizer:
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(path)

    def tokenize(prompt: str) -> np.ndarray:
        return np.asarray(tok(prompt, padding=True, truncation=True,
                              max_length=77, return_tensors="np")["input_ids"])

    return tokenize


def _hf_clip_params(path: str, cfg: CLIPConfig) -> Dict:
    from transformers import AutoModel

    model = AutoModel.from_pretrained(path)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return jax.tree_util.tree_map(jnp.asarray, clip_params_from_hf(sd, cfg))


def load_preference_model(model_name: str, path: Dict[str, str],
                          tokenize: Optional[Tokenizer] = None):
    """Build a scorer from a local weight directory laid out like the
    reference's modelscope snapshot (reference: __init__.py:136-150's
    load_path dicts). `path` maps the same keys to local paths."""
    from goal_force_tpu.io.safetensors_io import load_safetensors

    if model_name == "Aesthetic":
        mlp = mlp_head_from_torch(load_safetensors(path["aesthetic_predictor"]))
        clip = _hf_clip_params(path["clip-large"], CLIP_L_14)
        return AestheticScore(clip, jax.tree_util.tree_map(jnp.asarray, mlp))
    if model_name == "PickScore":
        cfg = CLIP_H_14
        # PickScore is an HF CLIP-H fine-tune: quick_gelu + eos pooling
        cfg = CLIPConfig(**{**cfg.__dict__, "hidden_act": "quick_gelu",
                            "text_pooling": "eos_token"})
        params = _hf_clip_params(path["pickscore"], cfg)
        return PickScore(params, cfg, tokenize or _hf_clip_tokenizer(path["clip"]))
    if model_name in ("CLIP", "HPSv2", "HPSv2.1"):
        key = {"CLIP": "open_clip", "HPSv2": "hpsv2", "HPSv2.1": "hpsv2.1"}[model_name]
        p = path[key]
        if p.endswith(".safetensors"):
            sd = load_safetensors(p)
        else:
            import torch
            sd = {k: v.numpy() for k, v in
                  torch.load(p, map_location="cpu", weights_only=True).items()}
        params = jax.tree_util.tree_map(
            jnp.asarray, clip_params_from_open_clip(sd, CLIP_H_14))
        cls = CLIPScore if model_name == "CLIP" else HPScore
        if tokenize is None:
            if "open_clip_bpe" not in path:
                raise ValueError(f"{model_name} needs either a `tokenize` "
                                 "callable or path['open_clip_bpe'] "
                                 "(bpe_simple_vocab_16e6.txt.gz)")
            from goal_force_tpu.models.clip_bpe import CLIPBPETokenizer

            tokenize = CLIPBPETokenizer.from_gzip(path["open_clip_bpe"])
        return cls(params, CLIP_H_14, tokenize)
    if model_name == "MPS":
        raise NotImplementedError(
            "MPS cannot be supported: the reference implementation imports "
            "diffsynth/extensions/ImageQualityMetric/trainer/models/"
            "cross_modeling.py, which does not exist in the upstream "
            "repository (mps.py:20-21), so there is no behaviour to match.")
    if model_name == "ImageReward":
        from goal_force_tpu.extensions.image_reward import load_image_reward

        return load_image_reward(path)
    raise ValueError(f"unknown preference model {model_name!r}")
