"""Nexus-Gen: Qwen2.5-VL AR model heads + embedding merger + adapter.

Reference parity:
- AR model (/root/reference/diffsynth/models/nexus_gen_ar_model.py:74-504):
  the Qwen2.5-VL backbone (models/qwen_vl.py here) plus a bias-free
  vision_head (hidden -> hidden) whose outputs are the autoregressive image
  embeddings (:447), and 81 learned image-prefill embeddings that stand in
  for the target image tokens during prefill (:87, nexus_gen.py:139-143).
- NexusGenImageEmbeddingMerger (nexus_gen_projector.py:255-370): N
  bidirectional Qwen2.5-VL decoder layers over image embeddings with
  FRACTIONAL M-RoPE positions rescaled to a 72x72 base grid (:327-355), then
  an RMS/linear/RMS/silu/linear/RMS projector to the Flux text width.
- NexusGenAdapter (nexus_gen_projector.py:389-401): linear/LayerNorm/ReLU/
  linear/LayerNorm from 3584 to 4096.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.qwen_vl import (
    QwenVLTextConfig,
    _rms,
    _text_block,
    mrope_tables,
)


@dataclasses.dataclass(frozen=True)
class NexusGenMergerConfig:
    text: QwenVLTextConfig = QwenVLTextConfig()
    num_layers: int = 1
    out_channel: int = 4096
    expand_ratio: int = 4
    base_grid: int = 72
    spatial_merge_size: int = 2
    tokens_per_second: int = 2


def merger_position_ids(grid_thw: Tuple[int, int, int],
                        cfg: NexusGenMergerConfig) -> np.ndarray:
    """Fractional (3, 1, S) position ids scaled to the base grid
    (reference get_position_ids :327-355)."""
    t, h, w = grid_thw
    m = cfg.spatial_merge_size
    gt, gh, gw = t, h // m, w // m
    scale_h = cfg.base_grid / h
    scale_w = cfg.base_grid / w
    t_idx = np.repeat(np.arange(gt) * cfg.tokens_per_second, gh * gw)
    h_idx = np.tile(np.repeat(np.arange(gh), gw), gt) * scale_h
    w_idx = np.tile(np.arange(gw), gt * gh) * scale_w
    return np.stack([t_idx, h_idx, w_idx]).astype(np.float32)[:, None, :]


def nexus_gen_merger_forward(params: Dict, cfg: NexusGenMergerConfig,
                             embeds: jnp.ndarray,
                             grid_thw: Tuple[int, int, int],
                             ref_embeds: Optional[jnp.ndarray] = None,
                             ref_grid_thw: Optional[Tuple[int, int, int]] = None
                             ) -> jnp.ndarray:
    """embeds (B, S, 3584) -> projected embeddings (B, S[, +S_ref], out)
    (reference forward :357-370; attention is fully bidirectional)."""
    pos = merger_position_ids(grid_thw, cfg)
    x = embeds
    if ref_embeds is not None:
        pos = np.concatenate([pos, merger_position_ids(ref_grid_thw, cfg)],
                             axis=-1)
        x = jnp.concatenate([embeds, ref_embeds], axis=1)
    cos, sin = mrope_tables(cfg.text, jnp.asarray(pos))
    b, s, _ = x.shape
    no_mask = jnp.zeros((b, s, s), jnp.float32)
    for i in range(cfg.num_layers):
        p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["blocks"])
        x = _text_block(p, x, no_mask, cos, sin, cfg.text)
    # projector: RMS -> linear -> RMS -> silu -> linear -> RMS (:319-323)
    e = cfg.text.eps
    x = _rms(x, params["proj_norm0"]["w"], e)
    x = x @ params["proj_fc0"]["w"] + params["proj_fc0"]["b"]
    x = _rms(x, params["proj_norm1"]["w"], e)
    x = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
    x = x @ params["proj_fc1"]["w"] + params["proj_fc1"]["b"]
    return _rms(x, params["proj_norm2"]["w"], e)


def nexus_gen_adapter_forward(params: Dict, x: jnp.ndarray,
                              eps: float = 1e-5) -> jnp.ndarray:
    """linear/LayerNorm/ReLU/linear/LayerNorm (reference :389-401)."""
    def ln(p, v):
        vf = v.astype(jnp.float32)
        mu = vf.mean(-1, keepdims=True)
        var = vf.var(-1, keepdims=True)
        return (((vf - mu) * jax.lax.rsqrt(var + eps)) * p["scale"]
                + p["bias"]).astype(v.dtype)

    x = x @ params["fc0"]["w"] + params["fc0"]["b"]
    x = jax.nn.relu(ln(params["ln0"], x))
    x = x @ params["fc1"]["w"] + params["fc1"]["b"]
    return ln(params["ln1"], x)


def nexus_gen_image_embeddings(hidden_states: jnp.ndarray,
                               vision_head: Dict) -> jnp.ndarray:
    """AR image embeddings = vision_head(hidden) (reference :447)."""
    return hidden_states @ vision_head["w"]


# ---------------------------------------------------------------------------
# Autoregressive image-embedding generation
# ---------------------------------------------------------------------------

def nexus_ar_image_positions(text_len: int,
                             grid_thw: Tuple[int, int, int] = (1, 18, 18),
                             spatial_merge_size: int = 2) -> np.ndarray:
    """(3, 1, N) integer M-RoPE ids for the generated image tokens: spatial
    grid ids offset by the prompt length, matching get_rope_index over the
    image-token-padded sequence (reference nexus_gen_ar_model.py:747-764)."""
    t, h, w = grid_thw
    gh, gw = h // spatial_merge_size, w // spatial_merge_size
    t_idx = np.zeros(t * gh * gw, np.int64)
    h_idx = np.tile(np.repeat(np.arange(gh), gw), t)
    w_idx = np.tile(np.arange(gw), t * gh)
    return ((np.stack([t_idx, h_idx, w_idx]) + text_len)[:, None, :]
            .astype(np.int32))


def nexus_gen_target_embeddings(params: Dict, cfg: QwenVLTextConfig,
                                heads: Dict, embeds: jnp.ndarray,
                                position_ids: jnp.ndarray,
                                num_img_tokens: int = 81) -> jnp.ndarray:
    """One teacher-forced forward (the reference's production path,
    nexus_gen.py:117-153): the sequence must end with [<vision_start>,
    prefill_0 .. prefill_{N-1}] (the caller scatters heads["image_prefill"]
    into the target slot); each of those positions' hidden states predicts
    the NEXT image embedding through the vision head. Numerically equal to
    nexus_gen_ar_generate — causal attention makes teacher forcing with the
    learned table identical to sequential decode — but a single parallel
    forward, which is the MXU-friendly way to run it."""
    from goal_force_tpu.models.qwen_vl import qwen_vl_text_forward

    mask = jnp.ones(embeds.shape[:2], jnp.int32)
    hidden = qwen_vl_text_forward(params, cfg, embeds, mask, position_ids)
    return hidden[:, -num_img_tokens - 1:-1] @ heads["vision_head"]["w"]


def nexus_gen_ar_generate(params: Dict, cfg: QwenVLTextConfig, heads: Dict,
                          prompt_embeds: jnp.ndarray,
                          prompt_position_ids: jnp.ndarray,
                          grid_thw: Tuple[int, int, int] = (1, 18, 18),
                          spatial_merge_size: int = 2) -> jnp.ndarray:
    """Generate the (B, N, H) autoregressive image embeddings, N =
    prod(grid)/merge^2 (81 by default).

    Mirrors the reference decode loop (nexus_gen_ar_model.py:593-720): the
    prompt must end with the <vision_start> token, whose hidden state yields
    embedding #1; each subsequent step consumes the LEARNED prefill-table
    entry image_prefill_embeds[i] (:87,725-731) — not the model's own
    prediction — at the image-grid M-RoPE position i, and its vision_head
    output is collected. Token identities are forced to <image> so logits
    never matter during the image phase. Implemented as a KV-cached
    jax.lax.scan: one compiled step reused for all N-1 decode iterations."""
    from goal_force_tpu.models.qwen_vl import (
        qwen_vl_text_decode_step,
        qwen_vl_text_prefill,
    )

    b, p_len, hidden = prompt_embeds.shape
    t, h, w = grid_thw
    n_img = t * (h // spatial_merge_size) * (w // spatial_merge_size)
    cache_len = p_len + n_img

    last_h, kc, vc = qwen_vl_text_prefill(params, cfg, prompt_embeds,
                                          prompt_position_ids, cache_len)
    vh = heads["vision_head"]["w"]
    emb0 = last_h[:, -1:] @ vh

    img_pos = jnp.asarray(
        nexus_ar_image_positions(p_len, grid_thw, spatial_merge_size))
    cos, sin = mrope_tables(cfg, img_pos)           # (1, N, head_dim)
    steps = n_img - 1
    xs = (jnp.arange(steps),
          jnp.swapaxes(cos[:, :steps], 0, 1),     # (steps, 1, head_dim)
          jnp.swapaxes(sin[:, :steps], 0, 1))

    table = heads["image_prefill"]

    def step(carry, x):
        kcache, vcache = carry
        i, c, s = x                                  # c/s: (1, head_dim)
        emb = jnp.broadcast_to(table[i][None, None], (b, 1, hidden)
                               ).astype(prompt_embeds.dtype)
        hh, kcache, vcache = qwen_vl_text_decode_step(
            params, cfg, emb, c[None], s[None], kcache, vcache, p_len + i)
        return (kcache, vcache), hh[:, 0] @ vh

    (_, _), embs = jax.lax.scan(step, (kc, vc), xs)
    return jnp.concatenate([emb0, jnp.swapaxes(embs, 0, 1)], axis=1)


# ---------------------------------------------------------------------------
# Converters
# ---------------------------------------------------------------------------

def _lin(sd, pre, bias=True):
    p = {"w": jnp.asarray(np.asarray(sd[pre + ".weight"]).T)}
    if bias and pre + ".bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[pre + ".bias"]))
    return p


def nexus_gen_merger_params_from_torch(sd, cfg: NexusGenMergerConfig) -> Dict:
    g = lambda k: jnp.asarray(np.asarray(sd[k]))

    def block(i):
        pre = f"layers.{i}"
        return {
            "norm1": {"w": g(pre + ".input_layernorm.weight")},
            "norm2": {"w": g(pre + ".post_attention_layernorm.weight")},
            "q": _lin(sd, pre + ".self_attn.q_proj"),
            "k": _lin(sd, pre + ".self_attn.k_proj"),
            "v": _lin(sd, pre + ".self_attn.v_proj"),
            "o": _lin(sd, pre + ".self_attn.o_proj", bias=False),
            "gate": _lin(sd, pre + ".mlp.gate_proj", bias=False),
            "up": _lin(sd, pre + ".mlp.up_proj", bias=False),
            "down": _lin(sd, pre + ".mlp.down_proj", bias=False),
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    return {
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        "proj_norm0": {"w": g("projector.0.weight")},
        "proj_fc0": _lin(sd, "projector.1"),
        "proj_norm1": {"w": g("projector.2.weight")},
        "proj_fc1": _lin(sd, "projector.4"),
        "proj_norm2": {"w": g("projector.5.weight")},
    }


def nexus_gen_ar_heads_from_torch(sd) -> Dict:
    """vision_head + the 81-entry learned image-prefill table
    (reference nexus_gen_ar_model.py:84-87)."""
    return {
        "vision_head": {"w": jnp.asarray(
            np.asarray(sd["vision_head.weight"]).T)},
        "image_prefill": jnp.asarray(
            np.asarray(sd["image_prefill_embeds.weight"])),
    }


def nexus_gen_adapter_params_from_torch(sd) -> Dict:
    g = lambda k: jnp.asarray(np.asarray(sd[k]))
    return {
        "fc0": _lin(sd, "adapter.0"),
        "ln0": {"scale": g("adapter.1.weight"), "bias": g("adapter.1.bias")},
        "fc1": _lin(sd, "adapter.3"),
        "ln1": {"scale": g("adapter.4.weight"), "bias": g("adapter.4.bias")},
    }


def nexus_editing_rope_tables(latent_gh: int, latent_gw: int,
                              target_hw, ref_hw, axes_dim, theta: float = 1e4):
    """Flux rope tables for NexusGen editing: text positions carry SPATIAL
    ids — target-embedding grid scaled to the latent grid, reference grid with
    axis-0 id 1 — followed by the usual (0, row, col) image ids (reference
    flux_image_new.py:815-835). Returns host (cos, sin) for
    flux_dit_forward(rope_tables_override=...)."""
    th, tw = target_hw
    rh, rw = ref_hw

    def grid_ids(gh, gw, axis0, sh, sw):
        ids = np.zeros((gh * gw, 3), np.float64)
        ids[:, 0] = axis0
        ids[:, 1] = np.repeat(np.arange(gh) * sh, gw)
        ids[:, 2] = np.tile(np.arange(gw) * sw, gh)
        return ids

    # embeds are 2x2-merged like latents (grid = hw // 2)
    tgt = grid_ids(th // 2, tw // 2, 0.0, (2 * latent_gh) / th,
                   (2 * latent_gw) / tw)
    ref = grid_ids(rh // 2, rw // 2, 1.0, (2 * latent_gh) / rh,
                   (2 * latent_gw) / rw)
    img = grid_ids(latent_gh, latent_gw, 0.0, 1.0, 1.0)
    ids = np.concatenate([tgt, ref, img], axis=0)

    parts_cos, parts_sin = [], []
    for i, d in enumerate(axes_dim):
        omega = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        ang = np.outer(ids[:, i], omega)
        parts_cos.append(np.cos(ang))
        parts_sin.append(np.sin(ang))
    return (np.concatenate(parts_cos, -1).astype(np.float32),
            np.concatenate(parts_sin, -1).astype(np.float32))
