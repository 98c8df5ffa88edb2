"""SD-1.5 text encoder: CLIP ViT-L/14 text tower with clip_skip.

The reference implements it standalone (reference: diffsynth/models/
sd_text_encoder.py:39-77); architecturally it is exactly the CLIP text tower
already in goal_force_tpu/models/clip.py (causal self-attention, quick_gelu,
final LayerNorm) returning ALL 77 token states (no EOS pooling, no
projection), plus `clip_skip`: stop `clip_skip - 1` layers before the end,
then still apply the final LayerNorm (reference: sd_text_encoder.py:64-72).
This module is a thin adapter over the shared tower.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.clip import CLIPConfig, _ln, _tower

SD_TEXT_CONFIG = CLIPConfig(vocab_size=49408, text_dim=768, text_heads=12,
                            text_layers=12, max_positions=77,
                            hidden_act="quick_gelu")


def sd_text_encode(params: Dict, input_ids: jnp.ndarray,
                   cfg: CLIPConfig = SD_TEXT_CONFIG,
                   clip_skip: int = 1) -> jnp.ndarray:
    """(B, 77) ids -> (B, 77, 768) final-LN token states."""
    p = params["text"]
    x = p["tok_emb"][input_ids] + p["pos_emb"][:input_ids.shape[1]]
    blocks = p["blocks"]
    if clip_skip > 1:
        keep = cfg.text_layers - (clip_skip - 1)
        blocks = jax.tree_util.tree_map(lambda a: a[:keep], blocks)
    x = _tower(blocks, x, cfg.text_heads, cfg.hidden_act, cfg.eps, causal=True)
    return _ln(p["ln_final"], x, cfg.eps)


def sd3_text1_encode(params: Dict, input_ids: jnp.ndarray,
                     cfg: CLIPConfig = SD_TEXT_CONFIG,
                     clip_skip: int = 2):
    """SD3/Flux CLIP-L branch (reference sd3_text_encoder.py:11-23): the FULL tower
    runs for the final-LN argmax-pooled embedding; hidden states are taken
    `clip_skip` layers before the end (pre-LN). Returns (pooled (B, 768),
    hidden (B, 77, 768))."""
    p = params["text"]
    x = p["tok_emb"][input_ids] + p["pos_emb"][:input_ids.shape[1]]

    # hidden after encoder index len-clip_skip has run (reference :17-20), i.e.
    # clip_skip-1 layers before the end
    keep = cfg.text_layers - (clip_skip - 1)
    head = jax.tree_util.tree_map(lambda a: a[:keep], p["blocks"])
    tail = jax.tree_util.tree_map(lambda a: a[keep:], p["blocks"])
    x = _tower(head, x, cfg.text_heads, cfg.hidden_act, cfg.eps, causal=True)
    hidden = x
    x = _tower(tail, x, cfg.text_heads, cfg.hidden_act, cfg.eps, causal=True)
    x = _ln(p["ln_final"], x, cfg.eps)
    idx = jnp.argmax(input_ids, axis=-1)
    pooled = x[jnp.arange(x.shape[0]), idx]
    return pooled, hidden


class _NP:
    """Read-through numpy view of a state dict: keeps key-access visible to
    the coverage audit's recording dict (tests/test_converter_coverage.py)
    instead of copying everything upfront."""

    def __init__(self, sd):
        self._sd = sd

    def __getitem__(self, k):
        return np.asarray(self._sd[k])

    def __contains__(self, k):
        return k in self._sd


def sd_text_params_from_torch(sd, cfg: CLIPConfig = SD_TEXT_CONFIG) -> Dict:
    """Convert the reference SDTextEncoder state dict (encoders.{i}.* naming,
    fused Attention module with to_q/to_k/to_v/to_out)."""
    sd = _NP(sd)

    def block(i):
        g = lambda k: sd[f"encoders.{i}.{k}"]
        return {
            "ln1": {"scale": g("layer_norm1.weight"), "bias": g("layer_norm1.bias")},
            "ln2": {"scale": g("layer_norm2.weight"), "bias": g("layer_norm2.bias")},
            "attn": {
                "q_w": g("attn.to_q.weight").T, "q_b": g("attn.to_q.bias"),
                "k_w": g("attn.to_k.weight").T, "k_b": g("attn.to_k.bias"),
                "v_w": g("attn.to_v.weight").T, "v_b": g("attn.to_v.bias"),
                "o_w": g("attn.to_out.weight").T, "o_b": g("attn.to_out.bias"),
            },
            "fc1_w": g("fc1.weight").T, "fc1_b": g("fc1.bias"),
            "fc2_w": g("fc2.weight").T, "fc2_b": g("fc2.bias"),
        }

    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *[block(i) for i in range(cfg.text_layers)])
    return {"text": {
        "tok_emb": sd["token_embedding.weight"],
        "pos_emb": sd["position_embeds"][0],
        "blocks": stacked,
        "ln_final": {"scale": sd["final_layer_norm.weight"],
                     "bias": sd["final_layer_norm.bias"]},
    }}


def sd_text_params_from_civitai(sd, cfg: CLIPConfig = SD_TEXT_CONFIG) -> Dict:
    """Convert the text tower of a bundled civitai SD checkpoint
    (`cond_stage_model.transformer.text_model.*` — HF CLIPTextModel naming;
    the reference ships a literal rename table instead:
    sd_text_encoder.py:115+ from_civitai)."""
    pre = "cond_stage_model.transformer.text_model."
    if not any(k.startswith(pre) for k in sd):
        pre = "text_model."
    g = lambda k: np.asarray(sd[pre + k])

    def block(i):
        b = lambda k: np.asarray(sd[f"{pre}encoder.layers.{i}.{k}"])
        return {
            "ln1": {"scale": b("layer_norm1.weight"), "bias": b("layer_norm1.bias")},
            "ln2": {"scale": b("layer_norm2.weight"), "bias": b("layer_norm2.bias")},
            "attn": {
                "q_w": b("self_attn.q_proj.weight").T, "q_b": b("self_attn.q_proj.bias"),
                "k_w": b("self_attn.k_proj.weight").T, "k_b": b("self_attn.k_proj.bias"),
                "v_w": b("self_attn.v_proj.weight").T, "v_b": b("self_attn.v_proj.bias"),
                "o_w": b("self_attn.out_proj.weight").T, "o_b": b("self_attn.out_proj.bias"),
            },
            "fc1_w": b("mlp.fc1.weight").T, "fc1_b": b("mlp.fc1.bias"),
            "fc2_w": b("mlp.fc2.weight").T, "fc2_b": b("mlp.fc2.bias"),
        }

    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *[block(i) for i in range(cfg.text_layers)])
    return {"text": {
        "tok_emb": g("embeddings.token_embedding.weight"),
        "pos_emb": g("embeddings.position_embedding.weight"),
        "blocks": stacked,
        "ln_final": {"scale": g("final_layer_norm.weight"),
                     "bias": g("final_layer_norm.bias")},
    }}


# ---------------------------------------------------------------------------
# SDXL text encoders (reference: diffsynth/models/sdxl_text_encoder.py)
# ---------------------------------------------------------------------------

# Encoder 1: CLIP ViT-L truncated to 11 layers, NO final LayerNorm
# (reference: sdxl_text_encoder.py:5-37).
SDXL_TEXT_CONFIG = CLIPConfig(vocab_size=49408, text_dim=768, text_heads=12,
                              text_layers=11, max_positions=77,
                              hidden_act="quick_gelu")
# Encoder 2: OpenCLIP bigG — 1280 dim, 20 heads, 32 layers, plain gelu,
# argmax (EOT) pooling + bias-free projection (reference: :44-82).
SDXL_TEXT2_CONFIG = CLIPConfig(vocab_size=49408, text_dim=1280, text_heads=20,
                               text_layers=32, max_positions=77,
                               hidden_act="gelu", text_pooling="argmax")


def sdxl_text_encode(params: Dict, input_ids: jnp.ndarray,
                     cfg: CLIPConfig = SDXL_TEXT_CONFIG,
                     clip_skip: int = 2) -> jnp.ndarray:
    """(B, 77) -> (B, 77, 768) RAW token states (no final LN), stopping
    clip_skip-1 layers early (the SDXL pipeline default is clip_skip=2)."""
    p = params["text"]
    x = p["tok_emb"][input_ids] + p["pos_emb"][:input_ids.shape[1]]
    blocks = p["blocks"]
    if clip_skip > 1:
        blocks = jax.tree_util.tree_map(
            lambda a: a[:cfg.text_layers - (clip_skip - 1)], blocks)
    return _tower(blocks, x, cfg.text_heads, cfg.hidden_act, cfg.eps,
                  causal=True)


def sdxl_text2_encode(params: Dict, input_ids: jnp.ndarray,
                      cfg: CLIPConfig = SDXL_TEXT2_CONFIG,
                      clip_skip: int = 2):
    """(B, 77) -> (pooled (B, 1280), hidden (B, 77, 1280)).

    The reference runs ALL layers, RECORDS the states clip_skip layers from
    the end (pre-final-LN), pools the final-LN last-layer output at
    argmax(ids), and projects (reference: sdxl_text_encoder.py:72-82)."""
    p = params["text"]
    x = p["tok_emb"][input_ids] + p["pos_emb"][:input_ids.shape[1]]
    split = cfg.text_layers - clip_skip + 1
    head = jax.tree_util.tree_map(lambda a: a[:split], p["blocks"])
    tail = jax.tree_util.tree_map(lambda a: a[split:], p["blocks"])
    hidden = _tower(head, x, cfg.text_heads, cfg.hidden_act, cfg.eps, True)
    x = _tower(tail, hidden, cfg.text_heads, cfg.hidden_act, cfg.eps, True)
    x = _ln(p["ln_final"], x, cfg.eps)
    idx = jnp.argmax(input_ids, axis=-1)
    pooled = x[jnp.arange(x.shape[0]), idx] @ params["text_proj"]
    return pooled, hidden


def sdxl_text_params_from_torch(sd, cfg: CLIPConfig = SDXL_TEXT_CONFIG,
                                with_projection: bool = False) -> Dict:
    """diffsynth-format SDXLTextEncoder / SDXLTextEncoder2 state dicts
    (same encoders.{i} naming as SD-1.5; encoder 1 has no final LN,
    encoder 2 adds final_layer_norm + text_projection)."""
    sd = _NP(sd)

    def block(i):
        g = lambda k: sd[f"encoders.{i}.{k}"]
        return {
            "ln1": {"scale": g("layer_norm1.weight"), "bias": g("layer_norm1.bias")},
            "ln2": {"scale": g("layer_norm2.weight"), "bias": g("layer_norm2.bias")},
            "attn": {
                "q_w": g("attn.to_q.weight").T, "q_b": g("attn.to_q.bias"),
                "k_w": g("attn.to_k.weight").T, "k_b": g("attn.to_k.bias"),
                "v_w": g("attn.to_v.weight").T, "v_b": g("attn.to_v.bias"),
                "o_w": g("attn.to_out.weight").T, "o_b": g("attn.to_out.bias"),
            },
            "fc1_w": g("fc1.weight").T, "fc1_b": g("fc1.bias"),
            "fc2_w": g("fc2.weight").T, "fc2_b": g("fc2.bias"),
        }

    text = {
        "tok_emb": sd["token_embedding.weight"],
        "pos_emb": sd["position_embeds"][0],
        "blocks": jax.tree_util.tree_map(
            lambda *xs: np.stack(xs),
            *[block(i) for i in range(cfg.text_layers)]),
    }
    out = {"text": text}
    if with_projection:
        text["ln_final"] = {"scale": sd["final_layer_norm.weight"],
                            "bias": sd["final_layer_norm.bias"]}
        out["text_proj"] = sd["text_projection.weight"].T
    return out


# ---------------------------------------------------------------------------
# SDXL civitai (bundled-checkpoint) converters: encoder 1 lives at
# `conditioner.embedders.0.transformer.text_model.*` (HF CLIP naming), encoder 2
# at `conditioner.embedders.1.model.*` (OpenCLIP naming: fused in_proj, ln_1/2,
# mlp.c_fc/c_proj). The reference ships literal rename tables
# (sdxl_text_encoder.py:125+ and :353-755); these are the algorithmic versions.
# ---------------------------------------------------------------------------


def sdxl_text_params_from_civitai(sd, cfg: CLIPConfig = SDXL_TEXT_CONFIG) -> Dict:
    """Encoder 1: CLIP ViT-L truncated to 11 layers, no final LN used."""
    pre = "conditioner.embedders.0.transformer.text_model."
    g = lambda k: np.asarray(sd[pre + k])

    def block(i):
        b = lambda k: np.asarray(sd[f"{pre}encoder.layers.{i}.{k}"])
        return {
            "ln1": {"scale": b("layer_norm1.weight"), "bias": b("layer_norm1.bias")},
            "ln2": {"scale": b("layer_norm2.weight"), "bias": b("layer_norm2.bias")},
            "attn": {
                "q_w": b("self_attn.q_proj.weight").T, "q_b": b("self_attn.q_proj.bias"),
                "k_w": b("self_attn.k_proj.weight").T, "k_b": b("self_attn.k_proj.bias"),
                "v_w": b("self_attn.v_proj.weight").T, "v_b": b("self_attn.v_proj.bias"),
                "o_w": b("self_attn.out_proj.weight").T, "o_b": b("self_attn.out_proj.bias"),
            },
            "fc1_w": b("mlp.fc1.weight").T, "fc1_b": b("mlp.fc1.bias"),
            "fc2_w": b("mlp.fc2.weight").T, "fc2_b": b("mlp.fc2.bias"),
        }

    return {"text": {
        "tok_emb": g("embeddings.token_embedding.weight"),
        "pos_emb": g("embeddings.position_embedding.weight"),
        "blocks": jax.tree_util.tree_map(
            lambda *xs: np.stack(xs),
            *[block(i) for i in range(cfg.text_layers)]),
    }}


def sdxl_text2_params_from_civitai(sd, cfg: CLIPConfig = SDXL_TEXT2_CONFIG) -> Dict:
    """Encoder 2: OpenCLIP bigG — split the fused in_proj qkv; text_projection is
    stored transposed relative to a Linear weight (reference :743-752), which
    cancels against our (in, out) layout: use it as-is."""
    pre = "conditioner.embedders.1.model."
    g = lambda k: np.asarray(sd[pre + k])

    def block(i):
        b = lambda k: np.asarray(sd[f"{pre}transformer.resblocks.{i}.{k}"])
        wq, wk, wv = np.split(b("attn.in_proj_weight"), 3, axis=0)
        bq, bk, bv = np.split(b("attn.in_proj_bias"), 3, axis=0)
        return {
            "ln1": {"scale": b("ln_1.weight"), "bias": b("ln_1.bias")},
            "ln2": {"scale": b("ln_2.weight"), "bias": b("ln_2.bias")},
            "attn": {
                "q_w": wq.T, "q_b": bq,
                "k_w": wk.T, "k_b": bk,
                "v_w": wv.T, "v_b": bv,
                "o_w": b("attn.out_proj.weight").T, "o_b": b("attn.out_proj.bias"),
            },
            "fc1_w": b("mlp.c_fc.weight").T, "fc1_b": b("mlp.c_fc.bias"),
            "fc2_w": b("mlp.c_proj.weight").T, "fc2_b": b("mlp.c_proj.bias"),
        }

    return {
        "text": {
            "tok_emb": g("token_embedding.weight"),
            "pos_emb": g("positional_embedding"),
            "blocks": jax.tree_util.tree_map(
                lambda *xs: np.stack(xs),
                *[block(i) for i in range(cfg.text_layers)]),
            "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
        },
        "text_proj": g("text_projection"),
    }
