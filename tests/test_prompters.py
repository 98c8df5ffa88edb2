"""Real tokenizer layer: pure-Python sentencepiece + vendored per-family assets.

Parity anchors:
  * unigram spm (cog/spiece.model, the T5 vocab) vs the `tokenizers`-json
    encoding of the same vocab (flux/tokenizer_2/tokenizer.json);
  * native CLIP BPE over HF vocab/merges vs transformers CLIPTokenizerFast;
  * ChatGLM3 byte-fallback BPE roundtrips and emits the [gMASK] sop prefix
    with left padding (reference kolors_prompter.py:192-299).
"""

import numpy as np
import pytest

from goal_force_tpu import prompters as P
from goal_force_tpu.models.spm import SentencePieceTokenizer

CORPUS = [
    "hello world, a cat",
    "A photo of an astronaut riding a horse on the moon.",
    "the quick brown fox; 123 jumps!",
    "Ein schöner Tag im Frühling",
    "深度学习 mixed 文本 text",
    "",
    "  spaces   collapse  ",
    "don't stop; it's 3.14!",
    "<extra_id_0> masked span",
    "Ramen, 4K photo, ultra realistic",
]


def test_spm_unigram_parity_vs_tokenizers_json():
    from tokenizers import Tokenizer

    ref = Tokenizer.from_file(P.asset_path("flux", "tokenizer_2", "tokenizer.json"))
    spm = SentencePieceTokenizer.from_file(P.asset_path("cog", "tokenizer", "spiece.model"))
    for text in CORPUS:
        assert spm.encode(text, add_eos=True) == ref.encode(text).ids, text


def test_spm_chatglm_bpe_roundtrip_and_byte_fallback():
    glm = SentencePieceTokenizer.from_file(
        P.asset_path("kolors", "tokenizer", "tokenizer.model"))
    assert glm.m.model_type == 2 and glm.m.byte_fallback
    for text in ["hello world, a cat", "一只可爱的猫", "emoji 🐈 test"]:
        ids = glm.encode(text)
        assert glm.decode(ids) == text
    # byte fallback produces per-byte pieces for the emoji
    ids = glm.encode("🐈")
    assert len(ids) >= 4


def test_clip_bpe_from_hf_parity_vs_transformers():
    from transformers import CLIPTokenizerFast

    tok, _ = P.flux_tokenizers()
    ref = CLIPTokenizerFast.from_pretrained(P.asset_path("flux", "tokenizer_1"))
    for text in CORPUS:
        assert tok.encode(text) == ref(text)["input_ids"], text


def test_family_tokenizer_shapes_and_padding():
    t1, t2 = P.flux_tokenizers(t5_length=64)
    a, b = t1("a cat"), t2("a cat")
    assert a.shape == (77,) and a.dtype == np.int32 and a[-1] == 49407
    assert b.shape == (64,) and b[-1] == 0 and b[3] == 1  # t5 eos then pad

    _, x2 = P.sdxl_tokenizers()
    assert x2("hi")[-1] == 0           # CLIP-G pads with '!' = 0

    c = P.cog_tokenizer(length=32)
    cc = c("hello world")
    assert cc.shape == (32,) and cc[2] == 1  # eos appended

    bert, _ = P.hunyuan_dit_tokenizers()
    bb = bert("a cat")
    assert bb[0] == 101 and 102 in bb  # [CLS] ... [SEP]


def test_kolors_prefix_and_left_padding():
    k = P.kolors_tokenizer(length=16)
    ids = k("a cat")
    # left-padded with unk(0); prefix [gMASK]=64790, sop=64792 precedes text
    nz = np.nonzero(ids)[0]
    assert ids[nz[0]] == 64790 and ids[nz[0] + 1] == 64792
    assert (ids[:nz[0]] == 0).all()


def test_truncation_forces_eot():
    tok = P.sd_clip_tokenizer(length=8)
    ids = tok("a very long prompt with many words exceeding the context")
    assert ids.shape == (8,) and ids[-1] == 49407 and ids[0] == 49406


def test_load_text_tokenizer_dispatch_errors(tmp_path):
    with pytest.raises(ValueError):
        P.load_text_tokenizer(str(tmp_path))
