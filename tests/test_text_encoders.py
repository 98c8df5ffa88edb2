"""BERT (HunyuanDiT CLIP) + Step1 LLM text encoder golden parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.text_encoders import (
    BertConfig,
    Step1Config,
    bert_encode,
    bert_params_from_torch,
    step1_encode,
    step1_params_from_torch,
)

from conftest import reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def test_bert_encoder_golden_parity():
    import torch
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    hf = HFBertConfig(hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=48,
                      vocab_size=96, max_position_embeddings=16,
                      type_vocab_size=2, hidden_act="gelu",
                      hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    m = BertModel(hf, add_pooling_layer=False).eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.05

    ids = torch.tensor([[3, 9, 44, 2, 1, 7, 0, 0]])
    mask = torch.tensor([[1, 1, 1, 1, 1, 1, 0, 0]])
    with torch.no_grad():
        ref = m(input_ids=ids, attention_mask=mask).last_hidden_state.numpy()

    cfg = BertConfig(hidden_size=32, num_layers=2, num_heads=4,
                     intermediate_size=48, vocab=96, max_positions=16)
    params = bert_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    ours = bert_encode(params, cfg, jnp.asarray(ids.numpy()),
                       jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5, rtol=3e-4)


def test_step1_encoder_golden_parity():
    import importlib
    import importlib.machinery
    import sys

    import torch

    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refmodels", None, is_package=True))
    pkg.__path__ = ["/root/reference/diffsynth/models"]
    sys.modules.setdefault("refmodels", pkg)
    ref = importlib.import_module("refmodels.stepvideo_text_encoder")

    # the vendored FlashSelfAttention calls flash_attn_func (CUDA-only and not
    # even imported); substitute a faithful sdpa equivalent
    def _sdpa(q, k, v, dropout_p=0.0):
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        return o.transpose(1, 2)

    ref.flash_attn_func = _sdpa

    from transformers import PretrainedConfig

    cfg_t = PretrainedConfig(
        hidden_size=32, num_layers=2, num_attention_heads=4,
        num_attention_groups=2, ffn_hidden_size=24, padded_vocab_size=96,
        layernorm_epsilon=1e-5, seq_length=64, use_flash_attn=True,
        attention_dropout=0.0, hidden_dropout=0.0, params_dtype=torch.float32,
        fp32_residual_connection=False, embedding_weights_in_fp32=False)
    torch.manual_seed(0)
    m = ref.Step1Model(cfg_t).eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.05

    ids = torch.tensor([[5, 9, 2, 44, 7, 1]])
    with torch.no_grad():
        ref_out = m(ids).transpose(0, 1).numpy()   # (S,B,H) -> (B,S,H)

    cfg = Step1Config(hidden_size=32, num_layers=2, num_heads=4, num_groups=2,
                      ffn_hidden_size=24, vocab=96, multiple_of=8)
    params = step1_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    ours = step1_encode(params, cfg, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=3e-5, rtol=3e-4)


def test_llama_encoder_golden_parity():
    import importlib
    import importlib.machinery
    import sys

    import torch
    from transformers import LlamaConfig as HFLlamaConfig

    from goal_force_tpu.models.text_encoders import (LlamaConfig, llama_encode,
                                                     llama_params_from_torch)

    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refmodels", None, is_package=True))
    pkg.__path__ = ["/root/reference/diffsynth/models"]
    sys.modules.setdefault("refmodels", pkg)
    ref = importlib.import_module("refmodels.hunyuan_video_text_encoder")

    hf = HFLlamaConfig(hidden_size=32, num_hidden_layers=4,
                       num_attention_heads=4, num_key_value_heads=2,
                       intermediate_size=48, vocab_size=96,
                       max_position_embeddings=64, rope_theta=500000.0,
                       attention_dropout=0.0, _attn_implementation="eager")
    torch.manual_seed(0)
    m = ref.HunyuanVideoLLMEncoder(hf).eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.05

    # newer transformers dropped _update_causal_mask and returns bare tensors
    # from decoder layers; shim both so the vendored loop runs unchanged
    import types

    def _ucm(self, attention_mask, inputs_embeds, cache_position, past, oa):
        s = inputs_embeds.shape[1]
        causal = torch.tril(torch.ones(s, s, dtype=torch.bool))
        ok = causal[None, None] & (attention_mask[:, None, None, :] > 0)
        return torch.where(ok, 0.0, torch.finfo(inputs_embeds.dtype).min)

    if not hasattr(m, "_update_causal_mask"):
        m._update_causal_mask = types.MethodType(_ucm, m)
    for layer in m.layers:
        orig = layer.forward

        def wrapped(*a, __orig=orig, **kw):
            kw.pop("past_key_value", None)
            kw.pop("use_cache", None)
            r = __orig(*a, **kw)
            return r if isinstance(r, tuple) else (r,)

        layer.forward = wrapped

    ids = torch.tensor([[3, 9, 44, 2, 1, 7]])
    mask = torch.ones_like(ids)
    with torch.no_grad():
        ref_out = m(ids, mask, hidden_state_skip_layer=2).numpy()

    cfg = LlamaConfig(hidden_size=32, num_layers=4, num_heads=4,
                      num_kv_heads=2, intermediate_size=48, vocab=96)
    params = llama_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    ours = llama_encode(params, cfg, jnp.asarray(ids.numpy()),
                        jnp.asarray(mask.numpy()), hidden_state_skip_layer=2)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4, rtol=2e-3)
