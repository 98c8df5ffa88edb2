"""FluxPipeline extra conditioning tokens: value controller and LoRA-encoder
embeddings appended to the positive prompt (reference flux_image_new.py
:941-950 value controller, :1005-1062 LoRA encode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_available


@pytest.fixture(scope="module")
def pipe():
    from goal_force_tpu.pipelines.flux import FluxPipeline

    return FluxPipeline.init_random(jax.random.PRNGKey(0))


KW = dict(height=64, width=64, num_inference_steps=1, seed=13)


def _tiny_value_encoder(out_dim):
    rng = np.random.default_rng(0)
    mk = lambda i, o: {
        "w": jnp.asarray(rng.normal(size=(i, o)).astype(np.float32)) * 0.05,
        "b": jnp.zeros((o,), jnp.float32)}
    return {"fc0": mk(256, 16), "fc2": mk(16, out_dim),
            "pos": jnp.asarray(
                rng.normal(size=(32, out_dim)).astype(np.float32)) * 0.05}


def test_value_controller_tokens(pipe):
    base = pipe("a fox", **KW)
    venc = _tiny_value_encoder(pipe.t5_cfg.dim)
    out = pipe("a fox", value_controller=[venc],
               value_controller_inputs=[0.8], **KW)
    assert np.isfinite(out).all()
    assert np.abs(out - base).max() > 1e-6
    # None inputs are dropped from the token block (MultiValueEncoder :10-17)
    out2 = pipe("a fox", value_controller=[venc, venc],
                value_controller_inputs=[0.8, None], **KW)
    np.testing.assert_allclose(out2, out, rtol=2e-5, atol=2e-5)


def test_value_controller_refuses_cfg(pipe):
    venc = _tiny_value_encoder(pipe.t5_cfg.dim)
    with pytest.raises(NotImplementedError):
        pipe("a fox", value_controller=[venc],
             value_controller_inputs=[0.8], cfg_scale=2.0, **KW)


@pytest.mark.skipif(not reference_available(),
                    reason="reference repo not mounted")
def test_lora_encoder_tokens(pipe):
    import importlib
    import importlib.machinery
    import sys

    import torch

    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refmodels", None, is_package=True))
    pkg.__path__ = ["/root/reference/diffsynth/models"]
    sys.modules.setdefault("refmodels", pkg)
    ref = importlib.import_module("refmodels.flux_lora_encoder")
    from refmodels.sd_text_encoder import CLIPEncoderLayer

    from goal_force_tpu.models.flux_adapters import (
        flux_lora_encode,
        flux_lora_encoder_params_from_torch,
    )

    d = pipe.t5_cfg.dim
    pats = [{"name": "blocks.0.attn.a_to_qkv", "dim": (8, 24),
             "type": "attn.a_to_qkv"}]
    torch.manual_seed(0)
    m = ref.FluxLoRAEncoder.__new__(ref.FluxLoRAEncoder)
    torch.nn.Module.__init__(m)
    m.num_embeds_per_lora = 2
    m.embedder = ref.LoRAEmbedder(lora_patterns=pats, L=2, out_dim=16)
    m.encoders = torch.nn.ModuleList(
        [CLIPEncoderLayer(16, 32, num_heads=2, head_dim=8)])
    m.special_embeds = torch.nn.Parameter(torch.randn(1, 1, 16))
    m.num_special_embeds = 1
    m.final_layer_norm = torch.nn.LayerNorm(16)
    m.final_linear = torch.nn.Linear(16, d)
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.05
    enc = flux_lora_encoder_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, pats)
    lora = {}
    for pat in pats:
        di, do = pat["dim"]
        lora[pat["name"] + ".lora_A.default.weight"] = \
            (torch.randn(4, di) * 0.1).numpy()
        lora[pat["name"] + ".lora_B.default.weight"] = \
            (torch.randn(do, 4) * 0.1).numpy()

    base = pipe("a fox", **KW)
    emb = flux_lora_encode(enc, lora, pats, heads=2, head_dim=8)
    assert emb.shape == (1, 1, d)

    out = pipe("a fox",
               lora_encoder={"params": enc, "patterns": pats, "heads": 2,
                             "head_dim": 8},
               lora_encoder_inputs=[lora], lora_encoder_scale=2.0, **KW)
    assert np.isfinite(out).all()
    assert np.abs(out - base).max() > 1e-6
