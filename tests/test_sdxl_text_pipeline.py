"""SDXL text encoders golden parity + SDXL pipeline smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.clip import CLIPConfig
from goal_force_tpu.models.sd_text_encoder import (
    sdxl_text2_encode,
    sdxl_text_encode,
    sdxl_text_params_from_torch,
)
from goal_force_tpu.pipelines.sdxl import SDXLPipeline

from conftest import reference_available

if reference_available():
    import importlib
    import importlib.machinery
    import sys

    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refmodels", None, is_package=True))
    pkg.__path__ = ["/root/reference/diffsynth/models"]
    sys.modules.setdefault("refmodels", pkg)
    ref_te = importlib.import_module("refmodels.sdxl_text_encoder")


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_sdxl_text_encoder_matches_reference():
    import torch

    torch.manual_seed(0)
    m1 = ref_te.SDXLTextEncoder(embed_dim=48, vocab_size=99,
                                max_position_embeddings=12,
                                num_encoder_layers=4,
                                encoder_intermediate_size=96)
    m1.encoders = torch.nn.ModuleList(
        [ref_te.CLIPEncoderLayer(48, 96, num_heads=4, head_dim=12)
         for _ in range(4)])
    m1 = m1.eval().float()
    cfg = CLIPConfig(vocab_size=99, text_dim=48, text_heads=4, text_layers=4,
                     max_positions=12, hidden_act="quick_gelu")
    params = jax.tree_util.tree_map(jnp.asarray, sdxl_text_params_from_torch(
        {k: v.detach().numpy() for k, v in m1.state_dict().items()}, cfg))
    ids = np.random.default_rng(0).integers(0, 98, (2, 12)).astype(np.int64)
    ids[:, -1] = 98
    with torch.no_grad():
        ref = m1(torch.from_numpy(ids), clip_skip=2).numpy()
    got = sdxl_text_encode(params, jnp.asarray(ids), cfg, clip_skip=2)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_sdxl_text_encoder2_matches_reference():
    import torch

    torch.manual_seed(1)
    m2 = ref_te.SDXLTextEncoder2(embed_dim=40, vocab_size=99,
                                 max_position_embeddings=12,
                                 num_encoder_layers=5,
                                 encoder_intermediate_size=80)
    m2.encoders = torch.nn.ModuleList(
        [ref_te.CLIPEncoderLayer(40, 80, num_heads=4, head_dim=10,
                                 use_quick_gelu=False) for _ in range(5)])
    m2 = m2.eval().float()
    cfg = CLIPConfig(vocab_size=99, text_dim=40, text_heads=4, text_layers=5,
                     max_positions=12, hidden_act="gelu",
                     text_pooling="argmax")
    params = jax.tree_util.tree_map(jnp.asarray, sdxl_text_params_from_torch(
        {k: v.detach().numpy() for k, v in m2.state_dict().items()}, cfg,
        with_projection=True))
    ids = np.random.default_rng(2).integers(0, 98, (2, 12)).astype(np.int64)
    ids[:, -1] = 98
    with torch.no_grad():
        ref_pool, ref_hidden = m2(torch.from_numpy(ids), clip_skip=2)
    pool, hidden = sdxl_text2_encode(params, jnp.asarray(ids), cfg, clip_skip=2)
    np.testing.assert_allclose(np.asarray(pool), ref_pool.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_sdxl_pipeline_smoke():
    pipe = SDXLPipeline.init_random(tiny=True)
    img = pipe("a castle", "ugly", height=32, width=32,
               num_inference_steps=2, seed=0)
    assert img.shape == (32, 32, 3) and np.isfinite(img).all()
    img_b = pipe("a castle", "ugly", height=32, width=32,
                 num_inference_steps=2, seed=0)
    np.testing.assert_array_equal(img, img_b)
    img_c = pipe("a castle", "ugly", height=32, width=32,
                 num_inference_steps=2, seed=0, cfg_scale=1.0)
    assert not np.allclose(img, img_c)
