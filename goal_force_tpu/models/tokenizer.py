"""Prompt cleaning + tokenization for umt5-xxl.

Mirrors /root/reference/diffsynth/prompters/wan_prompter.py: whitespace/ftfy cleaning
(:11-20), HF tokenizer with pad-to-512 + truncation (:48-72), and post-encode zeroing of
embeddings past each sample's length (:99-109).

Zero-egress environment: the real umt5 tokenizer loads only from a local directory
(tokenizer.json / spiece files). When none is available, HashTokenizer provides a
deterministic stand-in so the full pipeline stays drivable in tests/benchmarks.
"""

from __future__ import annotations

import html
import re
from typing import Optional, Tuple

import numpy as np

try:  # ftfy is optional (not in this image); basic cleanup still applies
    import ftfy

    def _fix_text(t: str) -> str:
        return ftfy.fix_text(t)
except ImportError:  # pragma: no cover
    def _fix_text(t: str) -> str:
        return t


def clean_whitespace(text: str) -> str:
    """basic_clean + whitespace_clean (reference :11-20)."""
    text = _fix_text(text)
    text = html.unescape(html.unescape(text))
    return re.sub(r"\s+", " ", text).strip()


class HFTokenizer:
    """AutoTokenizer wrapper, pad-to-max_length + truncation (reference :36-72)."""

    def __init__(self, path: str, seq_len: int = 512):
        from transformers import AutoTokenizer

        self.seq_len = seq_len
        self.tokenizer = AutoTokenizer.from_pretrained(path)

    def __call__(self, texts) -> Tuple[np.ndarray, np.ndarray]:
        if isinstance(texts, str):
            texts = [texts]
        texts = [clean_whitespace(t) for t in texts]
        enc = self.tokenizer(
            texts, return_tensors="np", padding="max_length",
            truncation=True, max_length=self.seq_len,
        )
        return enc["input_ids"].astype(np.int32), enc["attention_mask"].astype(np.int32)


class HashTokenizer:
    """Deterministic fallback: whitespace tokens hashed into the vocab, EOS=1, PAD=0.

    Not a linguistic tokenizer — exists so the end-to-end pipeline runs without the
    (non-downloadable) umt5 vocab files. Documented stand-in, replaced transparently when
    a local tokenizer path is supplied.
    """

    def __init__(self, vocab: int = 256384, seq_len: int = 512):
        self.vocab = vocab
        self.seq_len = seq_len

    def __call__(self, texts) -> Tuple[np.ndarray, np.ndarray]:
        if isinstance(texts, str):
            texts = [texts]
        ids = np.zeros((len(texts), self.seq_len), np.int32)
        mask = np.zeros((len(texts), self.seq_len), np.int32)
        for i, t in enumerate(texts):
            toks = clean_whitespace(t).split(" ")
            coded = [2 + (hash(w) % (self.vocab - 2)) for w in toks][: self.seq_len - 1]
            coded.append(1)  # EOS
            ids[i, : len(coded)] = coded
            mask[i, : len(coded)] = 1
        return ids, mask


def load_tokenizer(path: Optional[str], vocab: int = 256384, seq_len: int = 512,
                   quiet: bool = False):
    """Real umt5 tokenizer from a local dir (HF files or spiece.model via the
    native models/spm.py reader), else the hash stand-in — LOUDLY: hashed ids
    produce garbage embeddings, acceptable only for tests/benchmarks."""
    if path is not None:
        import os

        files = set(os.listdir(path)) if os.path.isdir(path) else set()
        if "tokenizer.json" in files or "tokenizer_config.json" in files:
            return HFTokenizer(path, seq_len)
        # spiece-only dirs (no sentencepiece wheel in this image)
        from goal_force_tpu.prompters import load_text_tokenizer

        tok = load_text_tokenizer(path, seq_len, add_eos=True)

        class _Wrap:
            def __call__(self, texts):
                if isinstance(texts, str):
                    texts = [texts]
                ids = np.stack([tok(clean_whitespace(t)) for t in texts])
                return ids.astype(np.int32), (ids != tok.pad_id).astype(np.int32)

        return _Wrap()
    if not quiet:
        import warnings

        warnings.warn(
            "No tokenizer_path given: falling back to HashTokenizer — prompts "
            "are HASHED into ids and the text embeddings are garbage. Pass a "
            "local umt5 tokenizer directory for real inference.",
            stacklevel=2)
    return HashTokenizer(vocab, seq_len)
