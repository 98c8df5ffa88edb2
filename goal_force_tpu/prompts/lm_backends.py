"""Runnable causal-LM backends for the prompt refiners and the Omost prompter.

The reference refiners load and run actual causal LMs
(/root/reference/diffsynth/prompters/prompt_refiners.py:6-110: BLOOM-based
BeautifulPrompt, Qwen chat, opus-mt Marian Translator; omost.py:235-300: the
Omost Llama-3 chat model). This module provides the TPU-side equivalents:

* ``CausalLMBackend`` — a chat/completion backend over the framework's greedy
  KV-cached decode loop (models/qwen_vl.py::qwen_vl_text_generate).  The
  Qwen2 text stack IS the Llama stack plus optional attention biases (the
  converter keeps biases only when the checkpoint has them), and M-RoPE with
  all three streams on the sequence index reduces to standard 1D RoPE — so
  one decode loop serves both the Qwen chat refiner and the Omost Llama chat
  model.
* ``qwen2_chat_template`` / ``llama3_chat_template`` — the two chat templates
  the reference applies via ``tokenizer.apply_chat_template`` (parity-tested
  against transformers' rendering in tests/test_refiner_backends.py).
* ``load_qwen_chat_backend`` / ``load_omost_backend`` — checkpoint-dir
  loaders (safetensors + tokenizer.json).
* ``load_beautiful_prompt_backend`` — BeautifulPrompt's BLOOM backbone
  (models/bloom.py: ALiBi attention, fused per-head QKV) with the reference's
  sampling recipe (prompt_refiners.py:37-45).
* ``load_translator_backend`` — the Translator's Marian encoder-decoder
  (models/marian.py: opus-mt, beam search) (prompt_refiners.py:113-133).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# Chat templates
# ---------------------------------------------------------------------------

def qwen2_chat_template(messages: List[Dict[str, str]],
                        add_generation_prompt: bool = True) -> str:
    """The Qwen2 chat template (the jinja string in Qwen2's
    tokenizer_config.json, rendered in Python). The reference applies it via
    ``tokenizer.apply_chat_template(messages, tokenize=False,
    add_generation_prompt=True)`` (prompt_refiners.py:90-95)."""
    parts = []
    if not messages or messages[0]["role"] != "system":
        parts.append("<|im_start|>system\n"
                     "You are a helpful assistant.<|im_end|>\n")
    for m in messages:
        parts.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
    if add_generation_prompt:
        parts.append("<|im_start|>assistant\n")
    return "".join(parts)


def llama3_chat_template(messages: List[Dict[str, str]],
                         add_generation_prompt: bool = True,
                         bos: str = "<|begin_of_text|>") -> str:
    """The Llama-3 chat template (Omost's omost-llama-3 models;
    reference omost.py:275 applies it via apply_chat_template).

    The jinja original applies ``| trim`` to the message content
    (parity-checked against transformers' rendering in
    tests/test_refiner_backends.py)."""
    parts = [bos]
    for m in messages:
        parts.append(f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n"
                     f"{m['content'].strip()}<|eot_id|>")
    if add_generation_prompt:
        parts.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
    return "".join(parts)


# ---------------------------------------------------------------------------
# Backend
# ---------------------------------------------------------------------------

class CausalLMBackend:
    """Greedy chat/completion generation on the qwen_vl text decode loop.

    params/cfg: the qwen_vl text stack (models/qwen_vl.py) — serves Qwen2 and
    Llama checkpoints alike (Llama simply has no attention biases).
    encode/decode: ``encode(text) -> List[int]`` WITHOUT padding;
    ``decode(ids) -> str`` skipping special tokens.
    """

    def __init__(self, params: Dict, cfg, encode: Callable[[str], List[int]],
                 decode: Callable[[Sequence[int]], str],
                 eos_ids: Sequence[int],
                 chat_template: Callable[..., str] = qwen2_chat_template,
                 max_new_tokens: int = 512,
                 bos_id: Optional[int] = None):
        self.params = params
        self.cfg = cfg
        self.encode = encode
        self.decode = decode
        self.eos_ids = tuple(eos_ids)
        self.chat_template = chat_template
        self.max_new_tokens = max_new_tokens
        self.bos_id = bos_id

    def _generate_ids(self, prompt_ids: List[int],
                      max_new_tokens: Optional[int] = None) -> List[int]:
        from goal_force_tpu.models.qwen_vl import qwen_vl_text_generate

        if self.bos_id is not None and (not prompt_ids
                                        or prompt_ids[0] != self.bos_id):
            prompt_ids = [self.bos_id] + list(prompt_ids)
        return qwen_vl_text_generate(
            self.params, self.cfg, np.asarray([prompt_ids], np.int32),
            max_new_tokens or self.max_new_tokens, eos_ids=self.eos_ids)

    def generate(self, text: str, max_new_tokens: Optional[int] = None) -> str:
        """Raw completion (BeautifulPrompt-style: template already applied)."""
        return self.decode(self._generate_ids(self.encode(text),
                                              max_new_tokens))

    def generate_chat(self, messages: List[Dict[str, str]],
                      max_new_tokens: Optional[int] = None) -> str:
        """Chat completion — the reference's apply_chat_template + generate +
        batch_decode(skip_special_tokens=True) flow (prompt_refiners.py:88-108)."""
        text = self.chat_template(messages, add_generation_prompt=True)
        return self.decode(self._generate_ids(self.encode(text),
                                              max_new_tokens))


# ---------------------------------------------------------------------------
# Tokenizer plumbing (raw encode/decode — refiners never pad)
# ---------------------------------------------------------------------------

def _raw_fast_tokenizer(tok_dir: str):
    """tokenizer.json -> (encode, decode, token_to_id) without padding."""
    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(os.path.join(tok_dir, "tokenizer.json"))
    encode = lambda t: tok.encode(t, add_special_tokens=False).ids
    decode = lambda ids: tok.decode(list(ids), skip_special_tokens=True)
    return encode, decode, tok.token_to_id


def _load_lm_checkpoint(ckpt_dir: str, dtype, num_heads: Optional[int] = None):
    """safetensors dir -> (params, cfg) on the qwen_vl text stack."""
    import glob as _glob

    import jax.numpy as jnp  # noqa: F401

    from goal_force_tpu.io.auto import infer_qwen_vl_text_config
    from goal_force_tpu.io.safetensors_io import load_safetensors
    from goal_force_tpu.models.qwen_vl import qwen_vl_text_params_from_torch

    files = sorted(_glob.glob(os.path.join(ckpt_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors in {ckpt_dir!r}")
    sd = load_safetensors(files)
    cfg_file = os.path.join(ckpt_dir, "config.json")
    if num_heads is None and os.path.exists(cfg_file):
        with open(cfg_file) as f:
            num_heads = json.load(f).get("num_attention_heads")
    cfg = infer_qwen_vl_text_config(sd, num_heads=num_heads)
    rope_theta = None
    if os.path.exists(cfg_file):
        with open(cfg_file) as f:
            rope_theta = json.load(f).get("rope_theta")
    if rope_theta is not None and rope_theta != cfg.rope_theta:
        import dataclasses

        cfg = dataclasses.replace(cfg, rope_theta=float(rope_theta))
    params = qwen_vl_text_params_from_torch(sd, cfg)
    if dtype is not None:
        import jax

        params = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if hasattr(x, "astype") else x, params)
    return params, cfg


def load_qwen_chat_backend(ckpt_dir: str, dtype=None,
                           max_new_tokens: int = 512) -> CausalLMBackend:
    """Qwen2 chat checkpoint dir (safetensors + tokenizer.json) -> backend.

    Serves QwenPrompt (reference prompt_refiners.py:57-110: greedy generate,
    max_new_tokens=512)."""
    params, cfg = _load_lm_checkpoint(ckpt_dir, dtype)
    encode, decode, token_to_id = _raw_fast_tokenizer(ckpt_dir)
    eos = [i for i in (token_to_id("<|im_end|>"), token_to_id("<|endoftext|>"))
           if i is not None]
    return CausalLMBackend(params, cfg, encode, decode, eos,
                           chat_template=qwen2_chat_template,
                           max_new_tokens=max_new_tokens)


def load_omost_backend(ckpt_dir: str, dtype=None,
                       max_new_tokens: int = 4096) -> CausalLMBackend:
    """Omost Llama-3 chat checkpoint dir -> backend (reference
    omost.py:258-300: apply_chat_template + generate; the canvas parser in
    prompts/omost.py consumes the completion)."""
    params, cfg = _load_lm_checkpoint(ckpt_dir, dtype)
    encode, decode, token_to_id = _raw_fast_tokenizer(ckpt_dir)
    eos = [i for i in (token_to_id("<|eot_id|>"), token_to_id("<|end_of_text|>"))
           if i is not None]
    bos = token_to_id("<|begin_of_text|>")
    return CausalLMBackend(params, cfg, encode, decode, eos,
                           chat_template=llama3_chat_template,
                           max_new_tokens=max_new_tokens, bos_id=bos)


class BloomBackend:
    """BeautifulPrompt completion backend over the BLOOM KV-cached decode
    loop (models/bloom.py).  ``generate`` mirrors the reference call
    (prompt_refiners.py:36-49): max_new_tokens=384, do_sample=True,
    temperature=0.9, top_k=50, top_p=0.95, repetition_penalty=1.1 — with
    ``sample=False`` for the deterministic parity surface."""

    def __init__(self, params: Dict, cfg, encode, decode,
                 eos_ids: Sequence[int], max_new_tokens: int = 384,
                 sample: bool = True, seed: int = 0):
        self.params = params
        self.cfg = cfg
        self.encode = encode
        self.decode = decode
        self.eos_ids = tuple(eos_ids)
        self.max_new_tokens = max_new_tokens
        self.sample = sample
        self.seed = seed

    def generate(self, text: str, max_new_tokens: Optional[int] = None) -> str:
        from goal_force_tpu.models.bloom import bloom_generate

        ids = bloom_generate(
            self.params, self.cfg, np.asarray([self.encode(text)], np.int32),
            max_new_tokens or self.max_new_tokens, eos_ids=self.eos_ids,
            sample=self.sample, temperature=0.9, top_k=50, top_p=0.95,
            repetition_penalty=1.1, seed=self.seed)
        return self.decode(ids)


def load_beautiful_prompt_backend(ckpt_dir: str, dtype=None,
                                  max_new_tokens: int = 384,
                                  sample: bool = True,
                                  seed: int = 0) -> BloomBackend:
    """BLOOM checkpoint dir (safetensors + tokenizer.json) -> BeautifulPrompt
    backend (reference prompt_refiners.py:6-54; the pai-bloom-1b1-text2prompt
    resources registered in diffsynth/configs/model_config.py)."""
    import glob as _glob

    from goal_force_tpu.io.safetensors_io import load_safetensors
    from goal_force_tpu.models.bloom import (bloom_params_from_torch,
                                             infer_bloom_config)

    files = sorted(_glob.glob(os.path.join(ckpt_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors in {ckpt_dir!r}")
    sd = load_safetensors(files)
    cfg = infer_bloom_config(sd)
    cfg_file = os.path.join(ckpt_dir, "config.json")
    eos_ids: List[int] = []
    if os.path.exists(cfg_file):
        with open(cfg_file) as f:
            hf = json.load(f)
        n_head = hf.get("n_head") or hf.get("num_attention_heads")
        if n_head and n_head != cfg.num_heads:
            import dataclasses

            cfg = dataclasses.replace(cfg, num_heads=int(n_head))
        if hf.get("eos_token_id") is not None:
            eos_ids.append(int(hf["eos_token_id"]))
    params = bloom_params_from_torch(sd, cfg, dtype=dtype)
    encode, decode, token_to_id = _raw_fast_tokenizer(ckpt_dir)
    if not eos_ids:
        eos_ids = [i for i in (token_to_id("</s>"),) if i is not None]
    return BloomBackend(params, cfg, encode, decode, eos_ids,
                        max_new_tokens=max_new_tokens, sample=sample,
                        seed=seed)


class MarianBackend:
    """Translator backend over the Marian encoder-decoder
    (models/marian.py). ``generate`` mirrors the reference Translator call
    (prompt_refiners.py:128-133): ``model.generate(input_ids)`` under the
    checkpoint's own generation defaults (beam search for opus-mt)."""

    def __init__(self, params: Dict, cfg, encode, decode, gen_cfg: Dict):
        self.params = params
        self.cfg = cfg
        self.encode = encode
        self.decode = decode
        self.gen_cfg = gen_cfg

    def generate(self, text: str,
                 max_new_tokens: Optional[int] = None) -> str:
        from goal_force_tpu.models.marian import marian_generate

        g = self.gen_cfg
        ids = self.encode(text) + [g["eos_token_id"]]
        out = marian_generate(
            self.params, self.cfg, np.asarray([ids], np.int32),
            max_length=(max_new_tokens or g.get("max_length", 512)),
            num_beams=g.get("num_beams", 1),
            decoder_start_token_id=g["decoder_start_token_id"],
            eos_token_id=g["eos_token_id"],
            pad_token_id=g["pad_token_id"],
            bad_words_ids=g.get("bad_words_ids"),
            length_penalty=g.get("length_penalty", 1.0),
            early_stopping=g.get("early_stopping", False))
        return self.decode(out)


def load_translator_backend(ckpt_dir: str, dtype=None) -> MarianBackend:
    """Marian (opus-mt) checkpoint dir -> Translator backend (reference
    prompt_refiners.py:113-133; the opus-mt-zh-en resource in
    diffsynth/configs/model_config.py)."""
    import glob as _glob

    from goal_force_tpu.io.safetensors_io import load_safetensors
    from goal_force_tpu.models.marian import (infer_marian_config,
                                              marian_params_from_torch)

    files = sorted(_glob.glob(os.path.join(ckpt_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors in {ckpt_dir!r}")
    sd = load_safetensors(files)
    hf: Dict = {}
    for name in ("config.json", "generation_config.json"):
        p = os.path.join(ckpt_dir, name)
        if os.path.exists(p):
            with open(p) as f:
                hf.update(json.load(f))
    cfg = infer_marian_config(sd, hf)
    params = marian_params_from_torch(sd, cfg, dtype=dtype)
    gen_cfg = {
        "decoder_start_token_id": hf.get("decoder_start_token_id",
                                         hf.get("pad_token_id", 0)),
        "eos_token_id": hf.get("eos_token_id", 0),
        "pad_token_id": hf.get("pad_token_id", 0),
        "max_length": hf.get("max_length", 512),
        "num_beams": hf.get("num_beams", 1),
        "bad_words_ids": hf.get("bad_words_ids"),
        "length_penalty": hf.get("length_penalty", 1.0),
        "early_stopping": hf.get("early_stopping", False),
    }
    # opus-mt SentencePiece checkpoints ship source.spm/vocab.json rather
    # than tokenizer.json; serve either.
    if os.path.exists(os.path.join(ckpt_dir, "tokenizer.json")):
        encode, decode, _ = _raw_fast_tokenizer(ckpt_dir)
    else:
        encode, decode = _marian_spm_tokenizer(ckpt_dir, gen_cfg)
    return MarianBackend(params, cfg, encode, decode, gen_cfg)


def _marian_spm_tokenizer(ckpt_dir: str, gen_cfg: Dict):
    """MarianTokenizer-style encode/decode from source.spm + vocab.json (the
    layout opus-mt checkpoints actually ship): spm pieces are mapped through
    the SHARED vocab.json (transformers MarianTokenizer._convert_token_to_id)."""
    from goal_force_tpu.models.spm import SentencePieceTokenizer

    with open(os.path.join(ckpt_dir, "vocab.json")) as f:
        vocab = json.load(f)
    inv = {v: k for k, v in vocab.items()}
    src = SentencePieceTokenizer.from_file(os.path.join(ckpt_dir, "source.spm"))
    unk = vocab.get("<unk>", 1)
    special_pieces = {"<pad>", "</s>", "<unk>"}

    def encode(text: str) -> List[int]:
        pieces = [src.id_to_piece[i] for i in src.encode(text)]
        return [vocab.get(p, unk) for p in pieces]

    def decode(ids: Sequence[int]) -> str:
        pieces = [inv.get(int(i), "") for i in ids]
        text = "".join(p for p in pieces if p not in special_pieces)
        return text.replace("▁", " ").strip()

    return encode, decode
