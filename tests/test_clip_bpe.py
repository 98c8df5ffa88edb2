"""CLIP BPE tokenizer parity vs transformers.CLIPTokenizer.

Both are constructed from the SAME synthetic merges list (ours via the
openai-format list, HF via generated vocab.json/merges.txt), so ids must
match exactly on clean ASCII prompts. Also covers the openai gzip loading
path and open_clip's padding/truncation contract.
"""

import gzip
import json
import os

import numpy as np
import pytest

from goal_force_tpu.models.clip_bpe import CLIPBPETokenizer, bytes_to_unicode

MERGES = [
    ("t", "h"), ("th", "e</w>"), ("i", "n</w>"), ("a", "n"), ("an", "d</w>"),
    ("o", "n</w>"), ("r", "e"), ("e", "r</w>"), ("l", "l"), ("h", "e"),
    ("he", "ll"), ("hell", "o</w>"), ("b", "a"), ("ba", "ll</w>"),
    ("w", "o"), ("wo", "r"), ("wor", "l"), ("worl", "d</w>"), ("re", "d</w>"),
]


@pytest.fixture(scope="module")
def tokenizers(tmp_path_factory):
    ours = CLIPBPETokenizer(MERGES)
    tmp = tmp_path_factory.mktemp("cliptok")
    with open(tmp / "vocab.json", "w") as f:
        json.dump(ours.encoder, f)
    with open(tmp / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(" ".join(m) for m in MERGES) + "\n")
    from transformers import CLIPTokenizer

    hf = CLIPTokenizer(str(tmp / "vocab.json"), str(tmp / "merges.txt"))
    return ours, hf


def test_matches_hf_clip_tokenizer(tokenizers):
    ours, hf = tokenizers
    prompts = [
        "hello world",
        "Hello, THE world!",
        "a red ball and the   red  ball",
        "on in and 42 !!",
        "hello's world're",
    ]
    for p in prompts:
        ref = hf(p)["input_ids"]
        got = [ours.sot_id] + ours.encode(p) + [ours.eot_id]
        assert got == ref, (p, got, ref)


def test_call_contract(tokenizers):
    ours, _ = tokenizers
    out = ours(["hello world", "the"], context_length=10)
    assert out.shape == (2, 10) and out.dtype == np.int32
    assert out[0, 0] == ours.sot_id
    assert ours.eot_id in out[0]
    # zero padding after eot
    eot_pos = int(np.argmax(out[1] == ours.eot_id))
    assert (out[1, eot_pos + 1:] == 0).all()
    # truncation forces eot at the last slot
    long = ours("hello " * 50, context_length=8)
    assert long[0, -1] == ours.eot_id


def test_decode_roundtrip(tokenizers):
    ours, _ = tokenizers
    ids = ours.encode("hello red world")
    assert ours.decode(ids).strip() == "hello red world"


def test_from_gzip(tmp_path):
    """Loader slices [1 : 49152-256-2+1] after the header line; short files
    just yield fewer merges."""
    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt") as f:
        f.write("bpe version 0.1\n")
        f.write("\n".join(" ".join(m) for m in MERGES) + "\n")
    tok = CLIPBPETokenizer.from_gzip(str(path))
    base = CLIPBPETokenizer(MERGES + [("", "")] * 0)
    # trailing blank line becomes an empty merge; encoding must still agree
    assert tok.encode("hello world")[:2] == base.encode("hello world")[:2]


def test_byte_table_is_invertible():
    table = bytes_to_unicode()
    assert len(table) == 256 and len(set(table.values())) == 256
