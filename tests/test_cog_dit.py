"""CogVideoX DiT golden parity: tiny model assembled via __new__ from the
reference's own block classes (CogDiTBlock is configurable; heads fixed at 48)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.cog_dit import (
    CogDiTConfig,
    cog_dit_forward,
    cog_dit_params_from_torch,
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
    ref_cog = importlib.import_module("refmodels.cog_dit")


def test_cog_dit_golden_parity():
    import torch

    # heads hardcoded to 48 in CogDiTBlock -> dim 96 gives head_dim 2; rope dim
    # must be head_dim with /4, /8*3 splits even -> rope_dim 16 needs head_dim 16
    # -> dim 768. Keep blocks shallow instead.
    cfg = CogDiTConfig(dim=768, cond_dim=64, num_blocks=2, text_dim=32,
                       freq_dim=64, rope_dim=16)
    torch.manual_seed(0)
    m = ref_cog.CogDiT.__new__(ref_cog.CogDiT)
    torch.nn.Module.__init__(m)
    m.patchify = ref_cog.CogPatchify(16, cfg.dim, 2)
    # reference TimestepEmbeddings(dim_in=3072, dim_out=512); tiny (64, 64)
    ref_sd3 = importlib.import_module("refmodels.sd3_dit")
    m.time_embedder = ref_sd3.TimestepEmbeddings(cfg.freq_dim, cfg.cond_dim)
    m.context_embedder = torch.nn.Linear(cfg.text_dim, cfg.dim)
    m.blocks = torch.nn.ModuleList([
        ref_cog.CogDiTBlock(cfg.dim, cfg.cond_dim, cfg.num_heads)
        for _ in range(cfg.num_blocks)])
    m.norm_final = torch.nn.LayerNorm((cfg.dim,), eps=1e-5)
    m.norm_out = ref_cog.CogAdaLayerNorm(cfg.dim, cfg.cond_dim, single=True)
    m.proj_out = torch.nn.Linear(cfg.dim, 16 * 4, bias=True)
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.05
    m = m.eval().float()

    rng = np.random.default_rng(0)
    b, t, h, w = 1, 2, 6, 8
    latents = rng.normal(size=(b, 16, t, h, w)).astype(np.float32)
    ts = np.asarray([400.0], np.float32)
    prompt = rng.normal(size=(b, 7, cfg.text_dim)).astype(np.float32)

    # the reference hardcodes embed_dim=64 in prepare_rotary_positional_embeddings;
    # tiny head_dim is 16, so build the 16-dim freqs through its own rope fn and
    # pass them explicitly (the forward accepts image_rotary_emb).
    crops = m.get_resize_crop_region_for_grid((h // 2, w // 2), 720 // 16, 480 // 16)
    ref_cos, ref_sin = m.get_3d_rotary_pos_embed(
        cfg.rope_dim, crops, (h // 2, w // 2), t, use_real=True)

    from goal_force_tpu.models.cog_dit import cog_rope_tables

    cos_np, sin_np = cog_rope_tables(t, h // 2, w // 2, cfg.rope_dim, 480, 720)
    np.testing.assert_allclose(np.repeat(cos_np, 2, -1), ref_cos.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.repeat(sin_np, 2, -1), ref_sin.numpy(),
                               rtol=1e-5, atol=1e-5)

    with torch.no_grad():
        ref = m(torch.tensor(latents), torch.tensor(ts), torch.tensor(prompt),
                image_rotary_emb=(ref_cos, ref_sin)).numpy()

    params = cog_dit_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    got = cog_dit_forward(
        params, cfg, jnp.asarray(latents.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(ts), jnp.asarray(prompt), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3), ref,
                               atol=3e-4, rtol=3e-3)


def test_cog_pipeline_smoke():
    from goal_force_tpu.pipelines.cog_video import CogVideoPipeline

    pipe = CogVideoPipeline.init_random(jax.random.PRNGKey(0))
    lat = pipe("a dog", negative_prompt="bad", cfg_scale=5.0,
               num_frames=5, height=16, width=16, num_inference_steps=2, seed=0)
    assert lat.shape == (1, 2, 2, 2, 16)
    assert np.isfinite(lat).all()
