"""Qwen-Image DiT golden parity vs the reference (tiny model assembled via __new__
from the reference's configurable block classes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.qwen_image_dit import (
    QwenImageDiTConfig,
    init_qwen_image_dit,
    qwen_image_dit_forward,
    qwen_image_dit_params_from_torch,
    qwen_unpatchify,
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
    ref_qwen = importlib.import_module("refmodels.qwen_image_dit")
    ref_sd3 = importlib.import_module("refmodels.sd3_dit")
    ref_flux = importlib.import_module("refmodels.flux_dit")


def test_qwen_image_golden_parity():
    import torch

    cfg = QwenImageDiTConfig(dim=48, num_heads=3, head_dim=16, num_layers=2,
                             text_dim=40, axes_dim=(4, 6, 6))
    torch.manual_seed(0)
    m = ref_qwen.QwenImageDiT.__new__(ref_qwen.QwenImageDiT)
    torch.nn.Module.__init__(m)
    m.pos_embed = ref_qwen.QwenEmbedRope(theta=10000, axes_dim=list(cfg.axes_dim),
                                         scale_rope=True)
    m.time_text_embed = ref_sd3.TimestepEmbeddings(
        cfg.freq_dim, cfg.dim, diffusers_compatible_format=True, scale=1000,
        align_dtype_to_timestep=True)
    m.txt_norm = ref_sd3.RMSNorm(cfg.text_dim, eps=1e-6)
    m.img_in = torch.nn.Linear(64, cfg.dim)
    m.txt_in = torch.nn.Linear(cfg.text_dim, cfg.dim)
    m.transformer_blocks = torch.nn.ModuleList([
        ref_qwen.QwenImageTransformerBlock(
            dim=cfg.dim, num_attention_heads=cfg.num_heads,
            attention_head_dim=cfg.head_dim)
        for _ in range(cfg.num_layers)])
    m.norm_out = ref_flux.AdaLayerNorm(cfg.dim, single=True)
    m.proj_out = torch.nn.Linear(cfg.dim, 64)
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.1
    m = m.eval().float()

    rng = np.random.default_rng(0)
    b, h, w = 1, 8, 12                        # latent pixels (16ch)
    latents = rng.normal(size=(b, 16, h, w)).astype(np.float32)
    ts = np.asarray([0.4], np.float32)
    prompt = rng.normal(size=(b, 9, cfg.text_dim)).astype(np.float32)
    mask = np.ones((b, 9), np.int64)

    with torch.no_grad():
        ref_tokens = m(latents=torch.tensor(latents), timestep=torch.tensor(ts),
                       prompt_emb=torch.tensor(prompt),
                       prompt_emb_mask=torch.tensor(mask),
                       height=h * 8, width=w * 8).numpy()

    params = qwen_image_dit_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    got = qwen_image_dit_forward(
        params, cfg, jnp.asarray(latents.transpose(0, 2, 3, 1)),
        jnp.asarray(ts), jnp.asarray(prompt), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got), ref_tokens, atol=3e-4, rtol=3e-3)

    # the pipeline-side unpatchify inverts the reference rearrange
    img = qwen_unpatchify(got, h * 8, w * 8)
    assert img.shape == (b, h, w, 16)


def test_qwen_init_runs():
    cfg = QwenImageDiTConfig(dim=48, num_heads=3, head_dim=16, num_layers=2,
                             text_dim=40, axes_dim=(4, 6, 6))
    params = init_qwen_image_dit(jax.random.PRNGKey(0), cfg, jnp.float32)
    out = qwen_image_dit_forward(
        params, cfg, jnp.zeros((1, 4, 4, 16), jnp.float32),
        jnp.asarray([0.5]), jnp.zeros((1, 5, cfg.text_dim), jnp.float32),
        attn_impl="xla")
    assert np.isfinite(np.asarray(out)).all()
