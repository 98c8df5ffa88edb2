"""Pipeline-LEVEL golden parity for HunyuanDiT (HunyuanImagePipeline).

Runs the reference composition — EnhancedDDIMScheduler v-prediction
(beta 0.00085..0.03, diffsynth/pipelines/hunyuan_image.py:129),
image_meta_size = [WIDTH, height, width, height, 0, 0] (:197),
ImageSizeManager.calc_rope fill-resize-crop tables (:112-121), CFG — on a
tiny reference HunyuanDiT against `HunyuanImagePipeline.__call__` with the
same converted weights, injected text embeddings, and the same initial noise,
comparing final latents. A NON-SQUARE size pins the width-first meta ordering
and the rope crop logic."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import load_reference_module, reference_available

import zoo_ckpts as Z

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def test_hunyuan_image_pipeline_matches_reference_denoise_loop():
    import torch

    from test_hunyuan_dit import ref_hy

    from goal_force_tpu.models.hunyuan_dit import (
        HunyuanDiTConfig,
        hunyuan_dit_params_from_torch,
        hunyuan_dit_rope,
    )
    from goal_force_tpu.pipelines.hunyuan_image import HunyuanImagePipeline

    ref_sched_mod = load_reference_module("diffsynth/schedulers/ddim.py",
                                          "ref_ddim_hy")

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

    # fixed text conditioning injected on BOTH sides
    rng = np.random.default_rng(4)
    clip_emb = rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32)
    clip_mask = np.asarray([[1, 1, 1, 0, 0]], np.int64)
    t5_emb = rng.normal(size=(1, cfg.t5_len, cfg.t5_dim)).astype(np.float32)
    t5_mask = np.asarray([[1, 1, 1, 0, 0, 0, 0]], np.int64)

    def encode(text):
        neg = text == "low quality"
        f = -1.0 if neg else 1.0  # distinct posi/nega conditioning
        return (jnp.asarray(f * clip_emb), jnp.asarray(clip_mask),
                jnp.asarray(f * t5_emb), jnp.asarray(t5_mask))

    steps, cfg_scale, seed = 5, 7.5, 21
    height, width = 32, 48              # NON-square

    pipe = HunyuanImagePipeline(
        dit=hunyuan_dit_params_from_torch(Z.sd_of(m), cfg),
        vae_decoder=None, cfg=cfg, encode_prompt=encode, dtype=jnp.float32,
    )
    ours = pipe("a pagoda", "low quality", cfg_scale=cfg_scale, height=height,
                width=width, num_inference_steps=steps, seed=seed,
                return_latents=True)

    # --- reference loop ------------------------------------------------------
    lh, lw = height // 8, width // 8
    noise = np.asarray(jax.random.normal(jax.random.PRNGKey(seed),
                                         (1, lh, lw, 4), jnp.float32))
    lat = torch.tensor(noise.transpose(0, 3, 1, 2))

    cos_np, sin_np = hunyuan_dit_rope(lh // 2, lw // 2, cfg.head_dim)
    freqs = (torch.tensor(np.repeat(cos_np, 2, -1)),
             torch.tensor(np.repeat(sin_np, 2, -1)))
    size_emb = torch.tensor([[width, height, width, height, 0, 0]],
                            dtype=torch.float32)

    def fwd(x, t, flip):
        with torch.no_grad():
            return m(x, torch.tensor(flip * clip_emb),
                     torch.tensor(flip * t5_emb), torch.tensor(clip_mask),
                     torch.tensor(t5_mask), t, size_emb, freqs)

    sched = ref_sched_mod.EnhancedDDIMScheduler(
        prediction_type="v_prediction", beta_start=0.00085, beta_end=0.03)
    sched.set_timesteps(steps)
    with torch.no_grad():
        for t in sched.timesteps:
            tt = t[None].float() if t.ndim == 0 else t.float()
            e_p = fwd(lat, tt, 1.0)
            e_n = fwd(lat, tt, -1.0)
            pred = e_n + cfg_scale * (e_p - e_n)
            lat = sched.step(pred, tt, lat)
    ref = lat.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-2)
