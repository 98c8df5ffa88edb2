"""Kolors ChatGLM text encoder golden parity vs the reference implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.kolors_text_encoder import (
    ChatGLMConfig,
    chatglm_encode,
    chatglm_params_from_torch,
)

from conftest import reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")

if reference_available():
    import importlib
    import importlib.machinery
    import sys

    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refmodels", None, is_package=True))
    pkg.__path__ = ["/root/reference/diffsynth/models"]
    sys.modules.setdefault("refmodels", pkg)
    ref_glm = importlib.import_module("refmodels.kolors_text_encoder")


def test_chatglm_golden_parity():
    import torch

    cfg = ChatGLMConfig(hidden_size=32, ffn_hidden_size=48, num_layers=3,
                        num_heads=4, kv_channels=8, kv_groups=2, vocab=96)
    ref_cfg = ref_glm.ChatGLMConfig(
        num_layers=cfg.num_layers, padded_vocab_size=cfg.vocab,
        hidden_size=cfg.hidden_size, ffn_hidden_size=cfg.ffn_hidden_size,
        kv_channels=cfg.kv_channels, num_attention_heads=cfg.num_heads,
        seq_length=32, hidden_dropout=0.0, attention_dropout=0.0,
        layernorm_epsilon=cfg.eps, rmsnorm=True,
        apply_residual_connection_post_layernorm=False, post_layer_norm=True,
        add_bias_linear=False, add_qkv_bias=True, multi_query_attention=True,
        multi_query_group_num=cfg.kv_groups, original_rope=True,
        torch_dtype=torch.float32, use_cache=False, output_hidden_states=True,
        return_dict=True)
    torch.manual_seed(0)
    m = ref_glm.ChatGLMModel(ref_cfg, empty_init=False).eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.05

    ids = np.asarray([[3, 9, 44, 2, 1, 7, 12, 5]], np.int64)
    with torch.no_grad():
        out = m(input_ids=torch.tensor(ids),
                attention_mask=torch.ones_like(torch.tensor(ids)),
                position_ids=torch.arange(ids.shape[1])[None],
                output_hidden_states=True, use_cache=False, return_dict=True)
    # reference layout is seq-first: (L, B, H)
    ref_prompt = out.hidden_states[-2].permute(1, 0, 2).numpy()
    ref_pooled = out.hidden_states[-1][-1, :, :].numpy()

    params = chatglm_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    prompt, pooled = chatglm_encode(params, cfg, jnp.asarray(ids, jnp.int32),
                                    clip_skip=2)
    np.testing.assert_allclose(np.asarray(prompt), ref_prompt, atol=3e-4,
                               rtol=3e-3)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=3e-4,
                               rtol=3e-3)

def test_kolors_pipeline_smoke():
    from goal_force_tpu.pipelines.kolors import KolorsPipeline

    pipe = KolorsPipeline.init_random()
    img = pipe("a red lantern", height=32, width=32, num_inference_steps=2)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
