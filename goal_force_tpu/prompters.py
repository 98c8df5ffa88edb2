"""Real per-family prompt tokenizers over the vendored tokenizer assets.

The reference vendors tokenizer files per family under
`diffsynth/tokenizer_configs/` and each prompter loads them with HF
AutoTokenizer (reference: diffsynth/prompters/flux_prompter.py:32-50,
sd_prompter.py, kolors_prompter.py:324-352, cog_prompter.py:24-45,
hunyuan_dit_prompter.py:34-45). This repo vendors the same assets under
`goal_force_tpu/tokenizer_assets/` and resolves them here; every zoo pipeline
gets real tokenization by default instead of the `_hash_ids` fallback.

Dispatch by directory contents:
  * `vocab.json` + `merges.txt`  -> CLIP BPE (transformers CLIPTokenizerFast)
  * `tokenizer.json`             -> any fast tokenizer (`tokenizers` runtime)
  * `vocab.txt`                  -> BERT WordPiece (BertTokenizerFast)
  * `spiece.model`/`tokenizer.model` -> pure-Python sentencepiece (models/spm.py;
    the `sentencepiece` wheel is absent in this image)

Padding semantics match each reference prompter: pad-to-max_length with
truncation; ChatGLM additionally takes the `[gMASK] sop` prefix and LEFT
padding (reference kolors_prompter.py:192-194,274).
"""

from __future__ import annotations

import os
import warnings
from typing import Callable, List, Optional, Sequence

import numpy as np

ASSET_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tokenizer_assets")


def asset_path(*parts: str) -> str:
    return os.path.join(ASSET_ROOT, *parts)


# ---------------------------------------------------------------------------
# Generic loader
# ---------------------------------------------------------------------------

class TextTokenizer:
    """Uniform wrapper: __call__(text) -> (length,) int32 ids, padded/truncated.

    `encode(text)` returns the raw (unpadded) id list. `pad_id`, `length`,
    `pad_side` control the padding applied by __call__.
    """

    def __init__(self, encode_fn: Callable[[str], List[int]], length: int,
                 pad_id: int, pad_side: str = "right",
                 force_last: Optional[int] = None):
        self._encode = encode_fn
        self.length = length
        self.pad_id = pad_id
        self.pad_side = pad_side
        self.force_last = force_last   # id forced at the last slot on truncation

    def encode(self, text: str) -> List[int]:
        return list(self._encode(text))

    def __call__(self, text: str) -> np.ndarray:
        ids = self.encode(text)
        if len(ids) > self.length:
            warnings.warn(
                f"prompt of {len(ids)} tokens truncated to {self.length}; "
                "families with chunked encoding (SD/SDXL) should go through "
                "tokenize_long_prompt instead", stacklevel=2)
            ids = ids[:self.length]
            if self.force_last is not None:
                ids[-1] = self.force_last
        pad = [self.pad_id] * (self.length - len(ids))
        ids = pad + ids if self.pad_side == "left" else ids + pad
        return np.asarray(ids, np.int32)

    def with_length(self, length: int) -> "TextTokenizer":
        return TextTokenizer(self._encode, length, self.pad_id, self.pad_side,
                             self.force_last)


def tokenize_long_prompt(tok: TextTokenizer, text: str,
                         num_sentences: Optional[int] = None) -> np.ndarray:
    """Chunked >max_length tokenization -> (num_sentence, tok.length) int32.

    Reproduces the reference's ``tokenize_long_prompt``
    (diffsynth/prompters/base_prompter.py:6-36, used by sd_prompter.py:69 and
    sdxl_prompter.py:44-48): tokenize the FULL prompt once (special tokens
    around the whole sequence, not per chunk), right-pad with the tokenizer's
    pad id to a multiple of the model context length, and reshape into
    "sentences" that the text encoder processes as a batch.

    `num_sentences` forces an exact sentence count (used by the merged-CFG
    pipelines so the positive/negative rows share one context length — the
    reference runs them as separate model calls and never needs this);
    padding sentences are all-pad rows.
    """
    ids = tok.encode(text)
    length = tok.length
    ns = max(1, -(-len(ids) // length))
    if num_sentences is not None:
        if ns > num_sentences:
            raise ValueError(
                f"prompt needs {ns} sentences > requested {num_sentences}")
        ns = num_sentences
    ids = ids + [tok.pad_id] * (ns * length - len(ids))
    return np.asarray(ids, np.int32).reshape(ns, length)


def load_text_tokenizer(path: str, length: int = 77,
                        add_eos: bool = False) -> TextTokenizer:
    """Build a TextTokenizer from a tokenizer directory (or spm file path).

    Replaces the reference's AutoTokenizer.from_pretrained over the same
    vendored directories.
    """
    if os.path.isfile(path) and path.endswith(".model"):
        return _spm_tokenizer(path, length, add_eos)
    files = set(os.listdir(path)) if os.path.isdir(path) else set()
    if "vocab.json" in files and "merges.txt" in files:
        return _clip_tokenizer(path, length)
    if "tokenizer.json" in files:
        return _fast_tokenizer(os.path.join(path, "tokenizer.json"), length)
    if "spiece.model" in files:
        return _spm_tokenizer(os.path.join(path, "spiece.model"), length, add_eos)
    if "tokenizer.model" in files:
        return _spm_tokenizer(os.path.join(path, "tokenizer.model"), length, add_eos)
    if "vocab.txt" in files:
        return _bert_tokenizer(path, length)
    raise ValueError(f"no recognizable tokenizer files in {path!r}: {sorted(files)}")


def _clip_tokenizer(path: str, length: int) -> TextTokenizer:
    """CLIP BPE over HF vocab.json/merges.txt via the native implementation
    (models/clip_bpe.py) — the pad token comes from the vendored config
    (SD pads with eot 49407; SDXL's second tokenizer pads with '!' = 0)."""
    import json

    from goal_force_tpu.models.clip_bpe import CLIPBPETokenizer

    tok = CLIPBPETokenizer.from_hf(os.path.join(path, "vocab.json"),
                                   os.path.join(path, "merges.txt"))
    pad_id = tok.eot_id
    cfg_file = os.path.join(path, "tokenizer_config.json")
    if os.path.exists(cfg_file):
        with open(cfg_file) as f:
            cfg = json.load(f)
        pad_tok = cfg.get("pad_token")
        if isinstance(pad_tok, dict):
            pad_tok = pad_tok.get("content")
        if isinstance(pad_tok, str) and pad_tok in tok.encoder:
            pad_id = tok.encoder[pad_tok]

    def encode(text: str) -> List[int]:
        return [tok.sot_id] + tok.encode(text) + [tok.eot_id]

    return TextTokenizer(encode, length, pad_id, force_last=tok.eot_id)


def _fast_tokenizer(json_path: str, length: int) -> TextTokenizer:
    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(json_path)
    pad_id = tok.token_to_id("<pad>")
    if pad_id is None:
        pad_id = 0
    return TextTokenizer(lambda t: tok.encode(t).ids, length, pad_id)


def _spm_tokenizer(model_path: str, length: int, add_eos: bool) -> TextTokenizer:
    from goal_force_tpu.models.spm import SentencePieceTokenizer

    tok = SentencePieceTokenizer.from_file(model_path)
    pad_id = tok.m.pad_id if tok.m.pad_id >= 0 else tok.m.unk_id
    tt = TextTokenizer(lambda t: tok.encode(t, add_eos=add_eos), length, pad_id)
    tt.spm = tok
    return tt


def _bert_tokenizer(path: str, length: int) -> TextTokenizer:
    from transformers import BertTokenizerFast

    tok = BertTokenizerFast.from_pretrained(path)
    return TextTokenizer(lambda t: tok(t)["input_ids"], length,
                         tok.pad_token_id or 0)


# ---------------------------------------------------------------------------
# Per-family defaults (lengths from the reference prompters)
# ---------------------------------------------------------------------------

def sd_clip_tokenizer(length: int = 77) -> TextTokenizer:
    """SD-1.5 CLIP-L (reference sd_prompter.py; tokenizer_configs/stable_diffusion)."""
    return load_text_tokenizer(asset_path("stable_diffusion", "tokenizer"), length)


def sdxl_tokenizers(length: int = 77):
    """(CLIP-L, CLIP-G-with-zero-pad) per reference sdxl_prompter.py."""
    tok1 = load_text_tokenizer(asset_path("stable_diffusion", "tokenizer"), length)
    tok2 = load_text_tokenizer(asset_path("stable_diffusion_xl", "tokenizer_2"), length)
    return tok1, tok2


def sd3_tokenizers(t5_length: int = 128):
    """(CLIP-L, CLIP-G, T5) per reference sd3_prompter.py."""
    tok1 = load_text_tokenizer(asset_path("stable_diffusion_3", "tokenizer_1"), 77)
    tok2 = load_text_tokenizer(asset_path("stable_diffusion_3", "tokenizer_2"), 77)
    tok3 = load_text_tokenizer(asset_path("stable_diffusion_3", "tokenizer_3"), t5_length)
    return tok1, tok2, tok3


def flux_tokenizers(t5_length: int = 512):
    """(CLIP-L 77, T5 512) per reference flux_prompter.py:61-69."""
    tok1 = load_text_tokenizer(asset_path("flux", "tokenizer_1"), 77)
    tok2 = load_text_tokenizer(asset_path("flux", "tokenizer_2"), t5_length)
    return tok1, tok2


def cog_tokenizer(length: int = 226) -> TextTokenizer:
    """T5 spiece, 226 tokens (reference cog_prompter.py:45)."""
    return load_text_tokenizer(asset_path("cog", "tokenizer"), length, add_eos=True)


def hunyuan_dit_tokenizers(t5_length: int = 256):
    """(BERT 77, mT5 256) per reference hunyuan_dit_prompter.py. The vendored
    tokenizer_t5 dir carries configs only (the spiece ships with the weights),
    so the T5 entry needs an explicit dir with tokenizer files; returns None
    when unavailable."""
    bert = load_text_tokenizer(asset_path("hunyuan_dit", "tokenizer"), 77)
    return bert, None


def hunyuan_video_clip_tokenizer(length: int = 77) -> TextTokenizer:
    """CLIP-L side of HunyuanVideo (tokenizer_1; the Llama side ships with
    its text-encoder checkpoint — pass that directory to load_text_tokenizer)."""
    return load_text_tokenizer(asset_path("hunyuan_video", "tokenizer_1"), length)


def kolors_tokenizer(length: int = 256) -> TextTokenizer:
    """ChatGLM3: [gMASK] sop prefix, LEFT pad with unk (reference
    kolors_prompter.py:192-194,274-299, length 256 at :352)."""
    tt = _spm_tokenizer(asset_path("kolors", "tokenizer", "tokenizer.model"),
                        length, add_eos=False)
    spm = tt.spm
    n = len(spm)
    # special tokens appended after the spm vocab (kolors_prompter.py:26-32)
    gmask_id, sop_id = n + 1, n + 3

    def encode(text: str) -> List[int]:
        return [gmask_id, sop_id] + spm.encode(text)

    out = TextTokenizer(encode, length, pad_id=spm.m.unk_id, pad_side="left")
    out.spm = spm
    return out


def wan_umt5_tokenizer(path: str, length: int = 512) -> TextTokenizer:
    """umt5-xxl from a local tokenizer dir (HF files or spiece.model)."""
    return load_text_tokenizer(path, length, add_eos=True)


__all__ = [
    "ASSET_ROOT", "asset_path", "TextTokenizer", "load_text_tokenizer",
    "tokenize_long_prompt",
    "sd_clip_tokenizer", "sdxl_tokenizers", "sd3_tokenizers",
    "flux_tokenizers", "cog_tokenizer", "hunyuan_dit_tokenizers",
    "hunyuan_video_clip_tokenizer", "kolors_tokenizer", "wan_umt5_tokenizer",
]
