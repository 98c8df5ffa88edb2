"""SD3/SD3.5 MMDiT golden parity vs the reference torch implementation (which is
fully configurable, so tiny instances run directly) + pipeline smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.sd3_dit import (
    SD3DiTConfig,
    sd3_dit_forward,
    sd3_dit_params_from_torch,
)
from goal_force_tpu.pipelines.sd3 import SD3Pipeline

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
    ref_sd3 = importlib.import_module("refmodels.sd3_dit")


def _golden(cfg):
    import torch

    torch.manual_seed(0)
    m = ref_sd3.SD3DiT(embed_dim=cfg.dim, num_layers=cfg.num_layers,
                       use_rms_norm=cfg.use_rms_norm,
                       num_dual_blocks=cfg.num_dual_blocks,
                       pos_embed_max_size=cfg.pos_embed_max_size).eval()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.1

    b, h, w = 2, 8, 12
    rng = np.random.default_rng(0)
    latents = rng.normal(size=(b, 16, h, w)).astype(np.float32)
    t = np.asarray([700.0, 100.0], np.float32)
    prompt_emb = rng.normal(size=(b, 10, 4096)).astype(np.float32)
    pooled = rng.normal(size=(b, 2048)).astype(np.float32)

    with torch.no_grad():
        ref = m(torch.tensor(latents), torch.tensor(t),
                torch.tensor(prompt_emb), torch.tensor(pooled)).numpy()

    params = sd3_dit_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    got = sd3_dit_forward(
        params, cfg, jnp.asarray(latents.transpose(0, 2, 3, 1)),
        jnp.asarray(t), jnp.asarray(prompt_emb), jnp.asarray(pooled),
        attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=3e-4, rtol=3e-3)


def test_sd3_golden_parity_plain():
    _golden(SD3DiTConfig(dim=64, num_layers=3, pos_embed_max_size=16))


def test_sd35_golden_parity_dual_rms():
    _golden(SD3DiTConfig(dim=64, num_layers=4, num_dual_blocks=2,
                         use_rms_norm=True, pos_embed_max_size=16))


def test_sd3_pipeline_smoke():
    pipe = SD3Pipeline.init_random(jax.random.PRNGKey(0))
    img = pipe("a fox", negative_prompt="blurry", cfg_scale=4.0,
               height=32, width=32, num_inference_steps=2, seed=0)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
