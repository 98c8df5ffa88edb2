"""HunyuanDiT (image) golden parity: tiny U-ViT assembled via __new__ from the
reference's configurable block classes, incl. long-skip topology and rope tables."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.hunyuan_dit import (
    HunyuanDiTConfig,
    hunyuan_dit_forward,
    hunyuan_dit_params_from_torch,
    hunyuan_dit_rope,
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
    ref_hy = importlib.import_module("refmodels.hunyuan_dit")


def test_hunyuan_dit_golden_parity():
    import torch

    cfg = HunyuanDiTConfig(dim=64, num_heads=4, num_layers_down=4,
                           num_layers_up=2, text_dim=24, t5_dim=16,
                           text_len=5, t5_len=7, mlp_ratio=4.0)
    torch.manual_seed(0)
    m = ref_hy.HunyuanDiT.__new__(ref_hy.HunyuanDiT)
    torch.nn.Module.__init__(m)
    m.text_emb_padding = torch.nn.Parameter(
        torch.randn(cfg.text_len + cfg.t5_len, cfg.text_dim))
    m.t5_embedder = torch.nn.Sequential(
        torch.nn.Linear(cfg.t5_dim, cfg.t5_dim * 4),
        ref_hy.FP32_SiLU(),
        torch.nn.Linear(cfg.t5_dim * 4, cfg.text_dim))
    m.t5_pooler = ref_hy.AttentionPool(cfg.t5_len, cfg.t5_dim, num_heads=8,
                                       output_dim=1024)
    m.style_embedder = torch.nn.Parameter(torch.randn(cfg.dim))
    m.patch_embedder = ref_hy.PatchEmbed(in_chans=4, embed_dim=cfg.dim)
    m.timestep_embedder = ref_hy.TimestepEmbedder(hidden_size=cfg.dim)
    m.extra_embedder = torch.nn.Sequential(
        torch.nn.Linear(256 * 6 + 1024 + cfg.dim, cfg.dim * 4),
        ref_hy.FP32_SiLU(),
        torch.nn.Linear(cfg.dim * 4, cfg.dim))
    m.num_layers_down = cfg.num_layers_down
    m.num_layers_up = cfg.num_layers_up
    m.blocks = torch.nn.ModuleList(
        [ref_hy.HunyuanDiTBlock(cfg.dim, cfg.dim, cfg.num_heads, cfg.mlp_ratio,
                                cfg.text_dim, skip_connection=False)
         for _ in range(cfg.num_layers_down)] +
        [ref_hy.HunyuanDiTBlock(cfg.dim, cfg.dim, cfg.num_heads, cfg.mlp_ratio,
                                cfg.text_dim, skip_connection=True)
         for _ in range(cfg.num_layers_up)])
    m.final_layer = ref_hy.HunyuanDiTFinalLayer(cfg.dim, cfg.dim, 2, 8)
    m.out_channels = 8
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.1
    m = m.eval().float()

    rng = np.random.default_rng(0)
    b, h, w = 2, 8, 12
    latents = rng.normal(size=(b, 4, h, w)).astype(np.float32)
    text = rng.normal(size=(b, cfg.text_len, cfg.text_dim)).astype(np.float32)
    t5 = rng.normal(size=(b, cfg.t5_len, cfg.t5_dim)).astype(np.float32)
    mask = np.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], np.int64)
    mask_t5 = np.asarray([[1, 1, 0, 0, 0, 0, 0], [1, 1, 1, 1, 0, 0, 0]], np.int64)
    ts = np.asarray([300.0, 800.0], np.float32)
    size_emb = np.tile(np.asarray([[64., 96., 64., 96., 0., 0.]], np.float32),
                       (b, 1))

    cos_np, sin_np = hunyuan_dit_rope(h // 2, w // 2, cfg.head_dim)
    freqs = (torch.tensor(np.repeat(cos_np, 2, -1)),
             torch.tensor(np.repeat(sin_np, 2, -1)))

    with torch.no_grad():
        ref = m(torch.tensor(latents), torch.tensor(text), torch.tensor(t5),
                torch.tensor(mask), torch.tensor(mask_t5), torch.tensor(ts),
                torch.tensor(size_emb), freqs).numpy()

    params = hunyuan_dit_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    got = hunyuan_dit_forward(
        params, cfg, jnp.asarray(latents.transpose(0, 2, 3, 1)),
        jnp.asarray(text), jnp.asarray(t5), jnp.asarray(mask),
        jnp.asarray(mask_t5), jnp.asarray(ts), jnp.asarray(size_emb),
        attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=3e-4, rtol=3e-3)
