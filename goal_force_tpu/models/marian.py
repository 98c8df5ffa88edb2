"""Marian encoder-decoder — the Translator refiner backbone (opus-mt).

The reference's Translator runs a MarianMTModel (opus-mt-zh-en) through
transformers generate (/root/reference/diffsynth/prompters/prompt_refiners.py:
113-133; the resource is registered in diffsynth/configs/model_config.py).
This is a from-scratch JAX port of that seq2seq stack — post-LN BART-family
blocks, static sinusoidal positions (sin in the first half of the channel dim,
cos in the second — the Marian layout, NOT interleaved), scaled shared
embeddings, swish MLPs, tied lm_head + final_logits_bias — with greedy AND
beam-search generation matching transformers' vectorized beam search
(generation/utils.py::_beam_search semantics: 2*num_beams candidates, length-
penalty-normalised finished scores, the early-stop improvement heuristic).
Golden-tested against transformers.MarianMTModel in
tests/test_refiner_backends.py.

Layout notes that make or break parity:
  * embed_positions is NOT in the checkpoint (MarianMTModel lists it in
    _keys_to_ignore_on_save) — it must be rebuilt with _init_weight's exact
    recipe: out[:, :dim//2] = sin(enc[:, 0::2]), out[:, dim//2:] =
    cos(enc[:, 1::2]);
  * embeddings are scaled by sqrt(d_model) when cfg.scale_embedding (true for
    every opus-mt release);
  * attention scales the QUERY by head_dim**-0.5 before the score matmul, and
    everything runs in float32 like the torch module.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MarianConfig:
    vocab: int
    d_model: int
    encoder_layers: int
    decoder_layers: int
    num_heads: int
    ffn_dim: int
    max_positions: int = 512
    scale_embedding: bool = True
    eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


def sinusoid_positions(n_pos: int, dim: int) -> np.ndarray:
    """MarianSinusoidalPositionalEmbedding._init_weight: sin features in
    [:dim//2], cos in [dim//2:] (not interleaved)."""
    enc = np.array([[pos / np.power(10000, 2 * (j // 2) / dim)
                     for j in range(dim)] for pos in range(n_pos)])
    out = np.zeros((n_pos, dim), np.float32)
    sentinel = dim // 2 if dim % 2 == 0 else dim // 2 + 1
    out[:, :sentinel] = np.sin(enc[:, 0::2])
    out[:, sentinel:] = np.cos(enc[:, 1::2])
    return out


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _ln(x, p, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (out * p["w"].astype(jnp.float32)
            + p["b"].astype(jnp.float32)).astype(x.dtype)


def _mha(p, q_in, kv_in, bias, cfg: MarianConfig):
    """q_in (B,Q,D), kv_in (B,K,D), bias (B,1,Q,K) or None -> (B,Q,D).
    The query is pre-scaled by head_dim**-0.5 (MarianAttention.scaling)."""
    b, qlen, _ = q_in.shape
    klen = kv_in.shape[1]
    n, hd = cfg.num_heads, cfg.head_dim
    q = (q_in @ p["q"]["w"] + p["q"]["b"]).reshape(b, qlen, n, hd)
    k = (kv_in @ p["k"]["w"] + p["k"]["b"]).reshape(b, klen, n, hd)
    v = (kv_in @ p["v"]["w"] + p["v"]["b"]).reshape(b, klen, n, hd)
    scores = jnp.einsum("bqnc,bknc->bnqk", q, k) * (hd ** -0.5)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(q.dtype)
    out = jnp.einsum("bnqk,bknc->bqnc", probs, v).reshape(b, qlen, n * hd)
    return out @ p["o"]["w"] + p["o"]["b"]


def _ffn(p, x, cfg: MarianConfig):
    h = x @ p["fc1"]["w"] + p["fc1"]["b"]
    h = h * jax.nn.sigmoid(h)          # swish/SiLU (opus-mt activation)
    return h @ p["fc2"]["w"] + p["fc2"]["b"]


def _embed(params, cfg: MarianConfig, ids):
    scale = math.sqrt(cfg.d_model) if cfg.scale_embedding else 1.0
    x = jnp.asarray(params["shared"])[ids] * scale
    pos = jnp.asarray(params["pos"])[: ids.shape[1]]
    return x + pos[None]


def marian_encode(params: Dict, cfg: MarianConfig, ids: jnp.ndarray,
                  pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """ids (B, S) [+ pad_mask (B, S) 1=keep] -> encoder states (B, S, D)."""
    x = _embed(params, cfg, ids)
    bias = None
    if pad_mask is not None:
        bias = jnp.where(pad_mask[:, None, None, :].astype(bool), 0.0,
                         jnp.finfo(jnp.float32).min)
    for i in range(cfg.encoder_layers):
        p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["enc"])
        x = _ln(x + _mha(p["attn"], x, x, bias, cfg), p["ln1"], cfg.eps)
        x = _ln(x + _ffn(p, x, cfg), p["ln2"], cfg.eps)
    return x


def _decode_hidden(params: Dict, cfg: MarianConfig, dec_ids: jnp.ndarray,
                   enc_out: jnp.ndarray,
                   enc_pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """dec_ids (B, T), enc_out (B, S, D) -> decoder hidden states (B, T, D)."""
    t = dec_ids.shape[1]
    x = _embed(params, cfg, dec_ids)
    causal = jnp.tril(jnp.ones((t, t), bool))
    self_bias = jnp.where(causal, 0.0, jnp.finfo(jnp.float32).min)[None, None]
    cross_bias = None
    if enc_pad_mask is not None:
        cross_bias = jnp.where(enc_pad_mask[:, None, None, :].astype(bool),
                               0.0, jnp.finfo(jnp.float32).min)
    for i in range(cfg.decoder_layers):
        p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["dec"])
        x = _ln(x + _mha(p["attn"], x, x, self_bias, cfg), p["ln1"], cfg.eps)
        x = _ln(x + _mha(p["xattn"], x, enc_out, cross_bias, cfg),
                p["ln2"], cfg.eps)
        x = _ln(x + _ffn(p, x, cfg), p["ln3"], cfg.eps)
    return x


def marian_decode(params: Dict, cfg: MarianConfig, dec_ids: jnp.ndarray,
                  enc_out: jnp.ndarray,
                  enc_pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """dec_ids (B, T), enc_out (B, S, D) -> logits (B, T, V)."""
    x = _decode_hidden(params, cfg, dec_ids, enc_out, enc_pad_mask)
    logits = x @ jnp.asarray(params["shared"]).T
    return logits + jnp.asarray(params["logits_bias"])[None]


@functools.partial(jax.jit, static_argnums=(1,))
def _step_logits(params, cfg: MarianConfig, dec_buf, enc_out, pos):
    """Full padded decoder forward -> f32 logits at `pos` (B, V). The buffer
    is a fixed max_length so generation compiles ONCE; future positions are
    causally masked so their (pad) contents cannot leak. Only the `pos` row
    hits the (d_model, vocab) lm_head — at opus-mt scale a full (B, 512,
    65001) logits tensor would dominate the step."""
    x = _decode_hidden(params, cfg, dec_buf, enc_out)
    row = jax.lax.dynamic_index_in_dim(x, pos, axis=1, keepdims=False)
    logits = row @ jnp.asarray(params["shared"]).T
    return (logits + jnp.asarray(params["logits_bias"])[None]
            ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Generation (HF-parity greedy + vectorized beam search)
# ---------------------------------------------------------------------------

def _process_logits(row: np.ndarray, cur_len: int, max_length: int,
                    banned: Sequence[int], eos_token_id: int,
                    forced_eos: bool) -> np.ndarray:
    """The processor stack Marian's generate builds: NoBadWordsLogitsProcessor
    (bad_words_ids=[[pad]]) + ForcedEOSTokenLogitsProcessor at max_length-1."""
    for b in banned:
        row[..., b] = -np.inf
    if forced_eos and cur_len == max_length - 1:
        keep = row[..., eos_token_id].copy()
        row[...] = -np.inf
        row[..., eos_token_id] = keep
    return row


def marian_generate(params: Dict, cfg: MarianConfig, input_ids,
                    max_length: int = 512, num_beams: int = 1,
                    decoder_start_token_id: int = 0, eos_token_id: int = 0,
                    pad_token_id: int = 0,
                    bad_words_ids: Optional[List[List[int]]] = None,
                    length_penalty: float = 1.0,
                    early_stopping=False,
                    forced_eos: bool = True) -> List[int]:
    """transformers-parity generation for one source sentence (B=1): greedy
    when num_beams==1, else the vectorized beam search
    (generation/utils.py::_beam_search). Returns the full decoder sequence
    INCLUDING decoder_start and eos (the reference batch_decodes with
    skip_special_tokens=True)."""
    ids = np.asarray(input_ids, np.int32)
    src_len = ids.shape[1]
    max_length = min(max_length, cfg.max_positions)
    banned = [w[0] for w in (bad_words_ids or []) if len(w) == 1]

    enc = marian_encode(params, cfg, jnp.asarray(ids))

    if num_beams == 1:
        buf = np.full((1, max_length), pad_token_id, np.int32)
        buf[0, 0] = decoder_start_token_id
        cur_len = 1
        while cur_len < max_length:
            logits = np.array(_step_logits(params, cfg, jnp.asarray(buf),
                                           enc, cur_len - 1))[0]
            logits = _process_logits(logits, cur_len, max_length, banned,
                                     eos_token_id, forced_eos)
            tok = int(np.argmax(logits))
            buf[0, cur_len] = tok
            cur_len += 1
            if tok == eos_token_id:
                break
        return buf[0, :cur_len].tolist()

    # ---- beam search (batch=1) ----
    enc_beams = jnp.broadcast_to(enc, (num_beams,) + enc.shape[1:])
    beams_to_keep = 2 * num_beams
    running_seq = np.full((num_beams, max_length), pad_token_id, np.int64)
    running_seq[:, 0] = decoder_start_token_id
    sequences = running_seq.copy()
    running_scores = np.zeros(num_beams, np.float64)
    running_scores[1:] = -1e9
    finished_scores = np.full(num_beams, -1e9, np.float64)
    is_finished = np.zeros(num_beams, bool)
    improvement_possible = True
    cur_len = 1
    dpl = 1  # decoder_prompt_len

    while cur_len < max_length:
        logits = np.asarray(_step_logits(
            params, cfg, jnp.asarray(running_seq[:, :].astype(np.int32)),
            enc_beams, cur_len - 1)).astype(np.float64)
        # log_softmax BEFORE the processors (HF applies processors to logprobs
        # in _beam_search)
        log_probs = logits - logits.max(-1, keepdims=True)
        log_probs = log_probs - np.log(np.exp(log_probs).sum(-1, keepdims=True))
        log_probs = _process_logits(log_probs, cur_len, max_length, banned,
                                    eos_token_id, forced_eos)
        acc = (log_probs + running_scores[:, None]).reshape(-1)

        top_idx = np.argsort(-acc, kind="stable")[:beams_to_keep]
        topk_scores = acc[top_idx]
        topk_beam = top_idx // cfg.vocab
        topk_tok = top_idx % cfg.vocab
        topk_seq = running_seq[topk_beam].copy()
        topk_seq[:, cur_len] = topk_tok

        # stopping criteria: eos hit or max_length reached at cur_len+1
        hits = (topk_tok == eos_token_id) | (cur_len + 1 >= max_length)

        # running beams for the next iteration: best non-finished num_beams
        run_scores = topk_scores + hits * -1e9
        keep = np.argsort(-run_scores, kind="stable")[:num_beams]
        next_running_seq = topk_seq[keep]
        next_running_scores = run_scores[keep]

        # fold newly finished top-num_beams candidates into the finished set
        did_finish = hits.copy()
        did_finish[num_beams:] = False
        norm = topk_scores / ((cur_len + 1 - dpl) ** length_penalty)
        if early_stopping is True and is_finished.all():
            norm = norm - 1e9
        if not improvement_possible:
            norm = norm - 1e9
        norm = norm + (~did_finish) * -1e9
        merged_scores = np.concatenate([finished_scores, norm])
        merged_seq = np.concatenate([sequences, topk_seq])
        merged_fin = np.concatenate([is_finished, did_finish])
        best = np.argsort(-merged_scores, kind="stable")[:num_beams]
        finished_scores = merged_scores[best]
        sequences = merged_seq[best]
        is_finished = merged_fin[best]

        running_seq = next_running_seq
        running_scores = next_running_scores
        cur_len += 1

        # early-stop improvement heuristic (_check_early_stop_heuristic)
        if early_stopping == "never" and length_penalty > 0.0:
            bhl = max_length - dpl
        else:
            bhl = cur_len - dpl
        best_possible = running_scores[0] / (bhl ** length_penalty)
        worst_finished = np.where(is_finished, finished_scores.min(), -1e9)
        improvement_possible = improvement_possible and bool(
            (best_possible > worst_finished).any())

        if not improvement_possible:
            break
        if early_stopping is True and is_finished.all():
            break
        if hits.all():
            break

    out = sequences[0]
    # trim trailing fill (everything after the last non-pad; eos==pad-safe:
    # keep through cur_len then strip trailing pads that were never written)
    written = np.where(out != pad_token_id)[0]
    end = (written.max() + 1) if written.size else 1
    # an eos that IS the pad id (opus-mt: eos=0, pad=65000 — distinct) still
    # terminates via the hits bookkeeping; `end` only strips the fill value.
    return out[:max(end, 1)].tolist()


# ---------------------------------------------------------------------------
# Converters / init
# ---------------------------------------------------------------------------

def infer_marian_config(sd: Dict, hf: Optional[Dict] = None) -> MarianConfig:
    """Structural config from a MarianMTModel state dict (+ config.json dict
    for num_heads / scale_embedding, which shapes alone cannot recover)."""
    hf = hf or {}
    pre = "model." if any(k.startswith("model.") for k in sd) else ""
    vocab, d_model = sd[f"{pre}shared.weight"].shape
    n_enc = 1 + max(int(k.split(".")[2 + bool(pre)]) for k in sd
                    if f"{pre}encoder.layers." in k)
    n_dec = 1 + max(int(k.split(".")[2 + bool(pre)]) for k in sd
                    if f"{pre}decoder.layers." in k)
    ffn = sd[f"{pre}encoder.layers.0.fc1.weight"].shape[0]
    return MarianConfig(
        vocab=vocab, d_model=d_model, encoder_layers=n_enc,
        decoder_layers=n_dec,
        num_heads=int(hf.get("encoder_attention_heads")
                      or max(h for h in (2 ** p for p in range(6))
                             if d_model % h == 0 and d_model // h <= 64)),
        ffn_dim=ffn,
        max_positions=int(hf.get("max_position_embeddings", 512)),
        scale_embedding=bool(hf.get("scale_embedding", True)))


def marian_params_from_torch(sd: Dict, cfg: MarianConfig,
                             dtype=None) -> Dict:
    """MarianMTModel state dict -> stacked-block param tree. embed_positions
    is rebuilt (ignored on save); final_logits_bias defaults to zeros when the
    checkpoint omits the buffer."""
    import torch

    pre = "model." if any(k.startswith("model.") for k in sd) else ""

    def t(name, transpose=False):
        w = sd[pre + name] if pre + name in sd else sd[name]
        if isinstance(w, torch.Tensor):
            w = w.float().numpy()
        w = np.asarray(w)
        return w.T if transpose else w

    params: Dict = {
        "shared": t("shared.weight"),
        "pos": sinusoid_positions(cfg.max_positions, cfg.d_model),
        "logits_bias": (np.asarray(sd["final_logits_bias"]).reshape(-1)
                        .astype(np.float32)
                        if "final_logits_bias" in sd
                        else np.zeros((cfg.vocab,), np.float32)),
    }

    def attn(base):
        return {n: {"w": t(f"{base}.{n}_proj.weight", True),
                    "b": t(f"{base}.{n}_proj.bias")}
                for n in ("q", "k", "v")} | {
            "o": {"w": t(f"{base}.out_proj.weight", True),
                  "b": t(f"{base}.out_proj.bias")}}

    def stack(trees: List[Dict]) -> Dict:
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)

    enc_layers, dec_layers = [], []
    for i in range(cfg.encoder_layers):
        b = f"encoder.layers.{i}"
        enc_layers.append({
            "attn": attn(f"{b}.self_attn"),
            "ln1": {"w": t(f"{b}.self_attn_layer_norm.weight"),
                    "b": t(f"{b}.self_attn_layer_norm.bias")},
            "fc1": {"w": t(f"{b}.fc1.weight", True), "b": t(f"{b}.fc1.bias")},
            "fc2": {"w": t(f"{b}.fc2.weight", True), "b": t(f"{b}.fc2.bias")},
            "ln2": {"w": t(f"{b}.final_layer_norm.weight"),
                    "b": t(f"{b}.final_layer_norm.bias")},
        })
    for i in range(cfg.decoder_layers):
        b = f"decoder.layers.{i}"
        dec_layers.append({
            "attn": attn(f"{b}.self_attn"),
            "ln1": {"w": t(f"{b}.self_attn_layer_norm.weight"),
                    "b": t(f"{b}.self_attn_layer_norm.bias")},
            "xattn": attn(f"{b}.encoder_attn"),
            "ln2": {"w": t(f"{b}.encoder_attn_layer_norm.weight"),
                    "b": t(f"{b}.encoder_attn_layer_norm.bias")},
            "fc1": {"w": t(f"{b}.fc1.weight", True), "b": t(f"{b}.fc1.bias")},
            "fc2": {"w": t(f"{b}.fc2.weight", True), "b": t(f"{b}.fc2.bias")},
            "ln3": {"w": t(f"{b}.final_layer_norm.weight"),
                    "b": t(f"{b}.final_layer_norm.bias")},
        })
    params["enc"] = stack(enc_layers)
    params["dec"] = stack(dec_layers)
    if dtype is not None:
        params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype),
                                        params)
    return params
