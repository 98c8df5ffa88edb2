"""Pipeline-LEVEL golden parity for HunyuanVideo.

Runs the reference composition — FlowMatchScheduler(shift=7.0, sigma_min=0.0,
extra_one_step=True) (diffsynth/pipelines/hunyuan_video.py:19),
`lets_dance_hunyuan_video` with embedded guidance (x1000 into guidance_in,
:297-340), no true CFG at the default cfg_scale=1.0 — on a tiny reference
HunyuanVideoDiT against `HunyuanVideoPipeline.__call__` with the same converted
weights, injected text embeddings, and the same initial noise, comparing final
latents. Catches scheduler-constant / guidance-scale / loop-composition drift
the smoke tests cannot."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import load_reference_module, reference_available

import zoo_ckpts as Z

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def test_hunyuan_video_pipeline_matches_reference_denoise_loop():
    import torch

    from test_hunyuan_video import _cpu_linear, ref_hv

    from goal_force_tpu.models.hunyuan_video_dit import (
        HunyuanVideoDiTConfig,
        hunyuan_rope_tables,
        hunyuan_video_dit_params_from_torch,
    )
    from goal_force_tpu.pipelines.hunyuan_video import HunyuanVideoPipeline

    ref_sched_mod = load_reference_module(
        "diffsynth/schedulers/flow_match.py", "ref_flow_match_hv")

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

    # fixed text conditioning injected on BOTH sides (the text towers have
    # their own parity tests; this test pins the denoise-loop composition)
    rng = np.random.default_rng(3)
    prompt_emb = rng.normal(size=(1, cfg.txt_len, cfg.text_dim)).astype(np.float32)
    mask = np.zeros((1, cfg.txt_len), np.int64)
    mask[:, :17] = 1
    pooled = rng.normal(size=(1, cfg.pooled_dim)).astype(np.float32)

    steps, guidance, seed = 5, 6.0, 13
    num_frames, height, width = 9, 64, 64
    lt, lh, lw = (num_frames - 1) // 4 + 1, height // 8, width // 8

    # --- our pipeline ------------------------------------------------------
    pipe = HunyuanVideoPipeline(
        dit=hunyuan_video_dit_params_from_torch(Z.sd_of(m), cfg), dit_cfg=cfg,
        encode_prompt=lambda p: (jnp.asarray(prompt_emb),
                                 jnp.asarray(mask.astype(np.int32)),
                                 jnp.asarray(pooled)),
        dtype=jnp.float32, attn_impl="xla",
    )
    ours = pipe("ignored (injected embeddings)", height=height, width=width,
                num_frames=num_frames, num_inference_steps=steps,
                embedded_guidance=guidance, seed=seed)

    # --- reference loop ----------------------------------------------------
    noise = np.asarray(jax.random.normal(jax.random.PRNGKey(seed),
                                         (1, lt, lh, lw, 16), jnp.float32))
    lat = torch.tensor(noise.transpose(0, 4, 1, 2, 3))

    cos_np, sin_np = hunyuan_rope_tables(lt, lh // 2, lw // 2, cfg.rope_dims,
                                         cfg.rope_theta)
    freqs_cos = torch.tensor(np.repeat(cos_np, 2, axis=-1))
    freqs_sin = torch.tensor(np.repeat(sin_np, 2, axis=-1))

    def lets_dance(x, t):
        # verbatim composition of the reference lets_dance_hunyuan_video
        # (hunyuan_video.py:297-340 — the pipeline module itself cannot be
        # imported standalone; its package __init__ pulls every family)
        B, C, T, H, W = x.shape
        tm = torch.tensor(mask)
        vec = (m.time_in(t, dtype=torch.float32)
               + m.vector_in(torch.tensor(pooled))
               + m.guidance_in(
                   torch.tensor([guidance], dtype=torch.float32) * 1000,
                   dtype=torch.float32))
        img = m.img_in(x)
        txt = m.txt_in(torch.tensor(prompt_emb), t, tm)
        split_token = int(tm.sum(dim=1))
        txt_len = int(txt.shape[1])
        for block in m.double_blocks:
            img, txt = block(img, txt, vec, (freqs_cos, freqs_sin),
                             split_token=split_token)
        xx = torch.concat([img, txt], dim=1)
        for block in m.single_blocks:
            xx = block(xx, vec, (freqs_cos, freqs_sin), txt_len=txt_len,
                       split_token=split_token)
        img = xx[:, :-txt_len]
        img = m.final_layer(img, vec)
        return m.unpatchify(img, T=T, H=H // 2, W=W // 2)

    sched = ref_sched_mod.FlowMatchScheduler(shift=7.0, sigma_min=0.0,
                                             extra_one_step=True)
    sched.set_timesteps(steps)
    with torch.no_grad():
        for t in sched.timesteps:
            pred = lets_dance(lat, t.unsqueeze(0))
            lat = sched.step(pred, t, lat)
    ref = lat.numpy().transpose(0, 2, 3, 4, 1)

    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-2)
