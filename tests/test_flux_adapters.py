"""Flux adapters + Qwen-Image blockwise ControlNet golden parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.flux_adapters import (
    flux_lora_encode,
    flux_lora_encoder_params_from_torch,
    infiniteyou_params_from_torch,
    infiniteyou_projector,
    value_control_embedding,
    value_encoder_params_from_torch,
)
from goal_force_tpu.models.qwen_image_controlnet import (
    QwenImageControlNetConfig,
    init_qwen_image_controlnet,
    qwen_image_controlnet_params_from_torch,
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
    # flux_value_control uses an ABSOLUTE `diffsynth.models.svd_unet` import;
    # alias stub packages so it resolves without the heavy package __init__
    _d = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("diffsynth", None, is_package=True))
    _d.__path__ = []
    sys.modules.setdefault("diffsynth", _d)
    _dm = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("diffsynth.models", None,
                                       is_package=True))
    _dm.__path__ = ["/root/reference/diffsynth/models"]
    sys.modules.setdefault("diffsynth.models", _dm)


def test_infiniteyou_projector_golden_parity():
    import torch

    ref = importlib.import_module("refmodels.flux_infiniteyou")
    torch.manual_seed(0)
    m = ref.InfiniteYouImageProjector(dim=32, depth=2, dim_head=8, heads=4,
                                      num_queries=3, embedding_dim=16,
                                      output_dim=24).eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.05
    x = torch.randn(2, 5, 16)
    with torch.no_grad():
        ref_out = m(x).numpy()
    params = infiniteyou_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()})
    ours = infiniteyou_projector(params, jnp.asarray(x.numpy()), heads=4,
                                 head_dim=8)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-5, rtol=2e-4)


def test_value_encoder_golden_parity():
    import torch

    ref = importlib.import_module("refmodels.flux_value_control")
    torch.manual_seed(0)
    m = ref.SingleValueEncoder(dim_in=16, dim_out=24, prefer_len=5,
                               computation_device="cpu").eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.05
    with torch.no_grad():
        ref_out = m(torch.tensor([0.7]), torch.float32).numpy()
    params = value_encoder_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()})
    ours = value_control_embedding(params, jnp.asarray(0.7), dim_in=16,
                                   prefer_len=5)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-5, rtol=2e-4)


def test_flux_lora_encoder_golden_parity():
    import torch

    ref = importlib.import_module("refmodels.flux_lora_encoder")
    pats = [{"name": "blocks.0.attn.a_to_qkv", "dim": (8, 24),
             "type": "attn.a_to_qkv"},
            {"name": "blocks.0.ff_a.0", "dim": (8, 32), "type": "ff_a.0"},
            {"name": "blocks.1.attn.a_to_qkv", "dim": (8, 24),
             "type": "attn.a_to_qkv"}]
    torch.manual_seed(0)
    m = ref.FluxLoRAEncoder.__new__(ref.FluxLoRAEncoder)
    torch.nn.Module.__init__(m)
    m.num_embeds_per_lora = 2
    m.embedder = ref.LoRAEmbedder(lora_patterns=pats, L=2, out_dim=16)
    from refmodels.sd_text_encoder import CLIPEncoderLayer

    m.encoders = torch.nn.ModuleList([CLIPEncoderLayer(16, 32, num_heads=2,
                                                       head_dim=8)])
    m.special_embeds = torch.nn.Parameter(torch.randn(1, 1, 16))
    m.num_special_embeds = 1
    m.final_layer_norm = torch.nn.LayerNorm(16)
    m.final_linear = torch.nn.Linear(16, 16)
    m = m.eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.05

    lora = {}
    for pat in pats:
        di, do = pat["dim"]
        lora[pat["name"] + ".lora_A.default.weight"] = torch.randn(4, di) * 0.1
        lora[pat["name"] + ".lora_B.default.weight"] = torch.randn(do, 4) * 0.1
    with torch.no_grad():
        ref_out = m(lora).numpy()

    params = flux_lora_encoder_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, pats)
    ours = flux_lora_encode(params, {k: v.numpy() for k, v in lora.items()},
                            pats, heads=2, head_dim=8)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=5e-5, rtol=5e-4)


def test_qwen_blockwise_controlnet_golden_parity():
    import torch

    ref = importlib.import_module("refmodels.qwen_image_controlnet")
    torch.manual_seed(0)
    m = ref.QwenImageBlockWiseControlNet(num_layers=2, in_dim=8,
                                         dim=16).eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.05
    cond = torch.randn(1, 6, 8)
    img = torch.randn(1, 6, 16)
    with torch.no_grad():
        proc = m.process_controlnet_conditioning(cond)
        ref_out = m.blockwise_forward(img, proc, 1).numpy()

    cfg = QwenImageControlNetConfig(num_layers=2, in_dim=8, dim=16)
    params = qwen_image_controlnet_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    from goal_force_tpu.models.qwen_image_controlnet import (
        qwen_cn_block,
        qwen_cn_process_conditioning,
    )

    proc_j = qwen_cn_process_conditioning(params, jnp.asarray(cond.numpy()))
    ours = qwen_cn_block(params, 1, jnp.asarray(img.numpy()), proc_j)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-5, rtol=2e-4)


def test_qwen_dit_consumes_controlnet():
    from goal_force_tpu.models.qwen_image_dit import (
        QwenImageDiTConfig,
        init_qwen_image_dit,
        qwen_image_dit_forward,
    )

    cfg = QwenImageDiTConfig(dim=48, num_heads=3, head_dim=16, num_layers=2,
                             text_dim=24, axes_dim=(4, 6, 6))
    dit = init_qwen_image_dit(jax.random.PRNGKey(0), cfg, jnp.float32)
    cn_cfg = QwenImageControlNetConfig(num_layers=2, in_dim=64, dim=48)
    cn = init_qwen_image_controlnet(jax.random.PRNGKey(1), cn_cfg,
                                    dtype=jnp.float32)
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 16))
    txt = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 24))
    t = jnp.asarray([0.5])
    cond = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 64))
    base = qwen_image_dit_forward(dit, cfg, lat, t, txt)
    out0 = qwen_image_dit_forward(dit, cfg, lat, t, txt, controlnet=cn,
                                  controlnet_cond=cond)
    # zero-init output projections -> identity at init
    np.testing.assert_allclose(np.asarray(out0), np.asarray(base), atol=1e-6)
    cn["blocks"]["out"]["w"] = jax.random.normal(
        jax.random.PRNGKey(5), cn["blocks"]["out"]["w"].shape) * 0.1
    out1 = qwen_image_dit_forward(dit, cfg, lat, t, txt, controlnet=cn,
                                  controlnet_cond=cond)
    assert np.abs(np.asarray(out1) - np.asarray(base)).max() > 1e-4
