"""umt5 encoder parity vs the reference torch implementation (tiny config, f32, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu import configs
from goal_force_tpu.io.torch_convert import t5_params_from_torch
from goal_force_tpu.models import t5 as jt5
from goal_force_tpu.models.tokenizer import HashTokenizer, clean_whitespace

from conftest import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")

if reference_available():
    import importlib
    import importlib.machinery
    import sys

    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refmodels", None, is_package=True)
    )
    pkg.__path__ = ["/root/reference/diffsynth/models"]
    sys.modules.setdefault("refmodels", pkg)
    ref_t5 = importlib.import_module("refmodels.wan_video_text_encoder")


@pytest.fixture(scope="module")
def tiny():
    import torch

    torch.manual_seed(0)
    cfg = configs.tiny_t5(num_layers=2)
    model = ref_t5.WanTextEncoder(
        vocab=cfg.vocab, dim=cfg.dim, dim_attn=cfg.dim_attn, dim_ffn=cfg.dim_ffn,
        num_heads=cfg.num_heads, num_layers=cfg.num_layers, num_buckets=cfg.num_buckets,
        shared_pos=False, dropout=0.0,
    ).eval().float()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = t5_params_from_torch(sd, cfg)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)
    return cfg, model, params


def test_relative_buckets_match_reference(tiny):
    import torch

    cfg, model, _ = tiny
    emb = model.blocks[0].pos_embedding
    ref_buckets = emb._relative_position_bucket(
        torch.arange(16).unsqueeze(0) - torch.arange(16).unsqueeze(1)
    ).numpy()
    got = jt5.relative_buckets(16, 16, cfg.num_buckets, cfg.rel_max_dist)
    np.testing.assert_array_equal(got, ref_buckets)


def test_encoder_matches_reference(tiny):
    import torch

    cfg, model, params = tiny
    rng = np.random.default_rng(0)
    ids = rng.integers(2, cfg.vocab, size=(2, cfg.text_len)).astype(np.int64)
    mask = np.ones((2, cfg.text_len), np.int64)
    mask[0, 10:] = 0
    ids[0, 10:] = 0

    with torch.no_grad():
        ref = model(torch.from_numpy(ids), torch.from_numpy(mask)).numpy()

    got = np.asarray(jt5.t5_encode(params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_hash_tokenizer_contract():
    tok = HashTokenizer(vocab=1000, seq_len=16)
    ids, mask = tok("a b c")
    assert ids.shape == (1, 16) and mask.shape == (1, 16)
    assert mask[0].sum() == 4  # 3 tokens + EOS
    assert ids[0, 3] == 1      # EOS
    ids2, _ = tok("a b c")
    np.testing.assert_array_equal(ids, ids2)  # deterministic


def test_clean_whitespace():
    assert clean_whitespace("  a\n\tb   c ") == "a b c"
    assert clean_whitespace("x &amp; y") == "x & y"
