"""StepVideo DiT golden parity vs the reference (fully configurable ctor)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.stepvideo_dit import (
    StepVideoConfig,
    stepvideo_dit_forward,
    stepvideo_dit_params_from_torch,
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
    ref_sv = importlib.import_module("refmodels.stepvideo_dit")


def test_stepvideo_golden_parity():
    import torch

    cfg = StepVideoConfig(num_heads=4, head_dim=16, num_layers=2,
                          in_channels=8, caption_dim=24, clip_dim=12,
                          rope_split=(8, 4, 4))
    torch.manual_seed(0)
    m = ref_sv.StepVideoModel(
        num_attention_heads=cfg.num_heads, attention_head_dim=cfg.head_dim,
        in_channels=cfg.in_channels, out_channels=cfg.in_channels,
        num_layers=cfg.num_layers,
        caption_channels=[cfg.caption_dim, cfg.clip_dim],
        attention_type="torch").eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.1
    # reference rope_ch_split is hardcoded [64, 32, 32]; retarget to the tiny head
    for blk in m.transformer_blocks:
        blk.attn1.rope_ch_split = list(cfg.rope_split)

    rng = np.random.default_rng(0)
    b, f, h, w = 1, 3, 4, 6
    latents = rng.normal(size=(b, f, cfg.in_channels, h, w)).astype(np.float32)
    ts = np.asarray([0.7], np.float32)
    cap = rng.normal(size=(b, 9, cfg.caption_dim)).astype(np.float32)
    clip = rng.normal(size=(b, 5, cfg.clip_dim)).astype(np.float32)
    enc_mask = np.ones((b, 14), np.int64)   # clip(5) + caption(9), all valid

    with torch.no_grad():
        ref = m(torch.tensor(latents), encoder_hidden_states=torch.tensor(cap),
                encoder_hidden_states_2=torch.tensor(clip),
                timestep=torch.tensor(ts),
                encoder_attention_mask=torch.tensor(enc_mask)).numpy()

    params = stepvideo_dit_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    got = stepvideo_dit_forward(
        params, cfg, jnp.asarray(latents.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(ts), jnp.asarray(cap), jnp.asarray(clip), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got).transpose(0, 1, 4, 2, 3), ref,
                               atol=3e-4, rtol=3e-3)
