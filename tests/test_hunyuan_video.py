"""HunyuanVideo MMDiT golden parity vs the reference implementation (configurable
ctor; heads fixed at 24 -> tiny dim 144 gives head_dim 6 with rope dims (2,2,2))."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.hunyuan_video_dit import (
    HunyuanVideoDiTConfig,
    hunyuan_rope_tables,
    hunyuan_video_dit_forward,
    hunyuan_video_dit_params_from_torch,
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
    ref_hv = importlib.import_module("refmodels.hunyuan_video_dit")


def _cpu_linear():
    """The reference token-refiner hardcodes device='cuda' for one Linear
    (:223-225); patch torch.nn.Linear to strip placement kwargs."""
    import torch

    orig = torch.nn.Linear

    class CPULinear(orig):
        def __init__(self, *a, device=None, dtype=None, **k):
            super().__init__(*a, **k)

    return orig, CPULinear


@pytest.mark.parametrize("guidance", [True, False])
def test_hunyuan_video_golden_parity(guidance):
    import torch

    cfg = HunyuanVideoDiTConfig(dim=144, num_double_blocks=2, num_single_blocks=2,
                                text_dim=32, rope_dims=(2, 2, 2),
                                guidance_embed=guidance)
    orig, patched = _cpu_linear()
    torch.nn.Linear = patched
    try:
        torch.manual_seed(0)
        m = ref_hv.HunyuanVideoDiT(
            in_channels=16, hidden_size=cfg.dim, text_dim=cfg.text_dim,
            num_double_blocks=cfg.num_double_blocks,
            num_single_blocks=cfg.num_single_blocks,
            guidance_embed=guidance).eval().float()
    finally:
        torch.nn.Linear = orig
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.1

    rng = np.random.default_rng(0)
    b, t, h, w = 1, 3, 8, 8
    latents = rng.normal(size=(b, 16, t, h, w)).astype(np.float32)
    ts = np.asarray([700.0], np.float32)
    prompt = rng.normal(size=(b, cfg.txt_len, cfg.text_dim)).astype(np.float32)
    mask = np.zeros((b, cfg.txt_len), np.int64)
    # the bare reference forward uses a STATIC split_token=71 (:462) while we
    # implement the pipeline's varlen split at text_mask.sum()
    # (lets_dance_hunyuan_video :327); they coincide exactly when n_valid == 71
    # — the pipeline golden covers the n_valid != 71 case
    mask[:, :71] = 1
    pooled = rng.normal(size=(b, cfg.pooled_dim)).astype(np.float32)
    gval = np.asarray([6.0], np.float32)

    cos_np, sin_np = hunyuan_rope_tables(t, h // 2, w // 2, cfg.rope_dims,
                                         cfg.rope_theta)
    cos_full = torch.tensor(np.repeat(cos_np, 2, axis=-1))
    sin_full = torch.tensor(np.repeat(sin_np, 2, axis=-1))

    with torch.no_grad():
        ref = m(torch.tensor(latents), torch.tensor(ts),
                prompt_emb=torch.tensor(prompt), text_mask=torch.tensor(mask),
                pooled_prompt_emb=torch.tensor(pooled),
                freqs_cos=cos_full, freqs_sin=sin_full,
                guidance=torch.tensor(gval) if guidance else None).numpy()

    params = hunyuan_video_dit_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    got = hunyuan_video_dit_forward(
        params, cfg, jnp.asarray(latents.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(ts), jnp.asarray(prompt), jnp.asarray(mask),
        jnp.asarray(pooled), jnp.asarray(gval) if guidance else None,
        attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3), ref,
                               atol=3e-4, rtol=3e-3)


def test_hunyuan_video_i2v_token_replace_golden():
    """token_replace=True parity vs the reference blocks driven the way
    lets_dance_hunyuan_video_i2v drives them (hunyuan_video.py:343-396):
    first-frame tokens modulated with time_in(0)+vector_in(pooled)."""
    import torch

    cfg = HunyuanVideoDiTConfig(dim=144, num_double_blocks=2,
                                num_single_blocks=2, text_dim=32,
                                rope_dims=(2, 2, 2), guidance_embed=True)
    orig, patched = _cpu_linear()
    torch.nn.Linear = patched
    try:
        torch.manual_seed(0)
        m = ref_hv.HunyuanVideoDiT(
            in_channels=16, hidden_size=cfg.dim, text_dim=cfg.text_dim,
            num_double_blocks=cfg.num_double_blocks,
            num_single_blocks=cfg.num_single_blocks,
            guidance_embed=True).eval().float()
    finally:
        torch.nn.Linear = orig
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.1

    rng = np.random.default_rng(1)
    b, t, h, w = 1, 3, 8, 8
    latents = rng.normal(size=(b, 16, t, h, w)).astype(np.float32)
    ts = np.asarray([700.0], np.float32)
    prompt = rng.normal(size=(b, cfg.txt_len, cfg.text_dim)).astype(np.float32)
    mask = np.zeros((b, cfg.txt_len), np.int64)
    mask[:, :71] = 1
    pooled = rng.normal(size=(b, cfg.pooled_dim)).astype(np.float32)
    gval = np.asarray([6.0], np.float32)

    cos_np, sin_np = hunyuan_rope_tables(t, h // 2, w // 2, cfg.rope_dims,
                                         cfg.rope_theta)
    freqs = (torch.tensor(np.repeat(cos_np, 2, axis=-1)),
             torch.tensor(np.repeat(sin_np, 2, axis=-1)))

    with torch.no_grad():
        x = torch.tensor(latents)
        tt = torch.tensor(ts)
        vec = m.time_in(tt, dtype=torch.float32) \
            + m.vector_in(torch.tensor(pooled)) \
            + m.guidance_in(torch.tensor(gval) * 1000., dtype=torch.float32)
        trv = m.time_in(torch.zeros_like(tt), dtype=torch.float32) \
            + m.vector_in(torch.tensor(pooled))
        trt = (h // 2) * (w // 2)
        img = m.img_in(x)
        txt = m.txt_in(torch.tensor(prompt), tt, torch.tensor(mask))
        txt_len = int(txt.shape[1])
        for block in m.double_blocks:
            img, txt = block(img, txt, vec, freqs, token_replace_vec=trv,
                             tr_token=trt)
        xx = torch.concat([img, txt], dim=1)
        for block in m.single_blocks:
            xx = block(xx, vec, freqs, txt_len=txt_len,
                       token_replace_vec=trv, tr_token=trt)
        img = m.final_layer(xx[:, :-txt_len], vec)
        ref = m.unpatchify(img, T=t, H=h // 2, W=w // 2).numpy()

    params = hunyuan_video_dit_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    got = hunyuan_video_dit_forward(
        params, cfg, jnp.asarray(latents.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(ts), jnp.asarray(prompt), jnp.asarray(mask),
        jnp.asarray(pooled), jnp.asarray(gval),
        attn_impl="xla", token_replace=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3), ref,
                               atol=3e-4, rtol=3e-3)


def test_hunyuan_pipeline_smoke():
    from goal_force_tpu.pipelines.hunyuan_video import HunyuanVideoPipeline

    pipe = HunyuanVideoPipeline.init_random(jax.random.PRNGKey(0))
    lat = pipe("a cat", height=16, width=16, num_frames=5,
               num_inference_steps=2, seed=0)
    assert lat.shape == (1, 2, 2, 2, 16)
    assert np.isfinite(lat).all()
