"""Pipeline-LEVEL golden parity for SDXL AnimateDiff (SDXLVideoPipeline).

Runs the reference composition — EnhancedDDIMScheduler with LINEAR betas
(diffsynth/pipelines/sdxl_video.py:19), per-frame noise (F,4,h,w) (:139),
`lets_dance_xl` with Timesteps(256)-embedded per-frame add_time_id /
add_text_embeds conditioning and temporal motion modules interleaved after
their mapped blocks (dancer.py:173-229), dual text encoders with clip_skip
1/2, CFG — against `SDXLVideoPipeline.__call__` with the same converted
weights, REAL dual CLIP tokenization, and the same initial noise, comparing
final latents."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import load_reference_module, reference_available

import zoo_ckpts as Z

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def test_sdxl_video_pipeline_matches_reference_denoise_loop():
    import torch

    from test_sdxl_unet import TINY_PLAN, ref_sdxl

    from goal_force_tpu.models.clip import CLIPConfig
    from goal_force_tpu.models.sd_motion import motion_params_from_torch
    from goal_force_tpu.models.sd_text_encoder import (
        sdxl_text_params_from_torch,
    )
    from goal_force_tpu.models.sdxl_unet import sdxl_unet_params_from_torch
    from goal_force_tpu.pipelines.sdxl_video import SDXLVideoPipeline
    from goal_force_tpu.prompters import sdxl_tokenizers

    ref_sched_mod = load_reference_module("diffsynth/schedulers/ddim.py",
                                          "ref_ddim_xlv")
    ref_te_mod = Z.refmodels("sdxl_text_encoder")
    ref_motion = Z.refmodels("sd_motion")

    time_dim, model_dim, pooled_dim = 16, 8, 16

    # --- tiny reference UNet (as in the SDXL image golden) ------------------
    torch.manual_seed(0)
    blocks = []
    for spec in TINY_PLAN:
        kind = spec[0]
        if kind == "res":
            blocks.append(ref_sdxl.ResnetBlock(spec[1], spec[2], time_dim,
                                               groups=4))
        elif kind == "attn":
            blocks.append(ref_sdxl.AttentionBlock(
                spec[1], spec[2], spec[3], spec[5], spec[4],
                norm_num_groups=4, eps=1e-6))
        elif kind == "push":
            blocks.append(ref_sdxl.PushBlock())
        elif kind == "pop":
            blocks.append(ref_sdxl.PopBlock())
        elif kind == "down":
            blocks.append(ref_sdxl.DownSampler(spec[1]))
        elif kind == "up":
            blocks.append(ref_sdxl.UpSampler(spec[1]))
    unet = torch.nn.Module()
    unet.time_embedding = torch.nn.Sequential(
        torch.nn.Linear(model_dim, time_dim), torch.nn.SiLU(),
        torch.nn.Linear(time_dim, time_dim))
    unet.add_time_embedding = torch.nn.Sequential(
        torch.nn.Linear(pooled_dim + 6 * 256, time_dim), torch.nn.SiLU(),
        torch.nn.Linear(time_dim, time_dim))
    unet.conv_in = torch.nn.Conv2d(4, model_dim, 3, padding=1)
    unet.blocks = torch.nn.ModuleList(blocks)
    unet.conv_norm_out = torch.nn.GroupNorm(4, model_dim, eps=1e-5)
    unet.conv_out = torch.nn.Conv2d(model_dim, 4, 3, padding=1)
    unet = unet.eval().float()

    # --- tiny motion modules after every attn block -------------------------
    attn_ids = [i for i, s in enumerate(TINY_PLAN) if s[0] == "attn"]
    torch.manual_seed(5)
    motion = torch.nn.Module()
    motion.motion_modules = torch.nn.ModuleList(
        [ref_motion.TemporalBlock(2, TINY_PLAN[pi][3] // 2, TINY_PLAN[pi][3],
                                  norm_num_groups=4, eps=1e-6)
         for pi in attn_ids])
    for p in motion.parameters():
        p.data = torch.randn_like(p.data) * 0.1
    motion = motion.eval()
    call_map = {pi: j for j, pi in enumerate(attn_ids)}

    # --- tiny dual text encoders --------------------------------------------
    te1 = ref_te_mod.SDXLTextEncoder(
        embed_dim=8, vocab_size=49408, max_position_embeddings=77,
        num_encoder_layers=2, encoder_intermediate_size=16)
    te1.encoders = torch.nn.ModuleList(
        [ref_te_mod.CLIPEncoderLayer(8, 16, num_heads=2, head_dim=4)
         for _ in range(2)])
    te1 = Z._seed(te1, 0.05, 1)
    te2 = ref_te_mod.SDXLTextEncoder2(
        embed_dim=pooled_dim, vocab_size=49408, max_position_embeddings=77,
        num_encoder_layers=3, encoder_intermediate_size=32)
    te2.encoders = torch.nn.ModuleList(
        [ref_te_mod.CLIPEncoderLayer(pooled_dim, 32, num_heads=2, head_dim=8,
                                     use_quick_gelu=False) for _ in range(3)])
    te2 = Z._seed(te2, 0.05, 2)

    t1_cfg = CLIPConfig(vocab_size=49408, text_dim=8, text_heads=2,
                        text_layers=2, max_positions=77,
                        hidden_act="quick_gelu")
    t2_cfg = CLIPConfig(vocab_size=49408, text_dim=pooled_dim, text_heads=2,
                        text_layers=3, max_positions=77, hidden_act="gelu",
                        text_pooling="argmax")
    tok1, tok2 = sdxl_tokenizers()
    pipe = SDXLVideoPipeline(
        unet=sdxl_unet_params_from_torch(Z.sd_of(unet), TINY_PLAN),
        motion=jax.tree_util.tree_map(
            jnp.asarray,
            motion_params_from_torch(Z.sd_of(motion), call_map=call_map)),
        text_encoder=sdxl_text_params_from_torch(Z.sd_of(te1), t1_cfg),
        text_encoder_2=sdxl_text_params_from_torch(Z.sd_of(te2), t2_cfg,
                                                   with_projection=True),
        vae_decoder=None, plan=TINY_PLAN, text_cfg=t1_cfg, text2_cfg=t2_cfg,
        groups=4, tokenize=tok1, tokenize_2=tok2, dtype=jnp.float32,
    )

    prompt, negative = "a castle on a hill", "low quality"
    steps, cfg, seed, frames, h, w = 4, 7.5, 7, 4, 32, 32
    ours = pipe(prompt, negative, num_frames=frames, height=h, width=w,
                num_inference_steps=steps, cfg_scale=cfg, seed=seed,
                return_latents=True)

    # --- reference loop ------------------------------------------------------
    noise = np.asarray(jax.random.normal(jax.random.PRNGKey(seed),
                                         (frames, h // 8, w // 8, 4),
                                         jnp.float32))
    lat = torch.tensor(noise.transpose(0, 3, 1, 2))

    def embed(text):
        ids1 = torch.tensor(np.asarray(tok1(text))[None].astype(np.int64))
        ids2 = torch.tensor(np.asarray(tok2(text))[None].astype(np.int64))
        with torch.no_grad():
            h1 = te1(ids1, clip_skip=1)
            pooled, h2 = te2(ids2, clip_skip=2)
        return torch.cat([h1, h2], dim=-1), pooled

    ctx_p, pool_p = embed(prompt)
    ctx_n, pool_n = embed(negative)
    add_ids = torch.tensor([h, w, 0, 0, h, w], dtype=torch.float32).repeat(
        frames)

    def dance_xl(sample, t, ctx, pooled):
        # dancer.py lets_dance_xl :138-236, single unet batch, no controlnet
        ctx = ctx.repeat(sample.shape[0], 1, 1)
        pooled = pooled.repeat(sample.shape[0], 1)
        with torch.no_grad():
            temb = ref_sdxl.Timesteps(model_dim)(t).to(sample.dtype)
            temb = unet.time_embedding(temb)
            ids = ref_sdxl.Timesteps(256)(add_ids).reshape(
                (pooled.shape[0], -1))
            add = torch.cat([pooled, ids], dim=-1)
            temb = temb + unet.add_time_embedding(add)
            hh = unet.conv_in(sample)
            stack = [hh]
            text_emb = ctx
            for block_id, block in enumerate(unet.blocks):
                hh, temb, text_emb, stack = block(hh, temb, text_emb, stack)
                if block_id in call_map:
                    hh, temb, text_emb, stack = motion.motion_modules[
                        call_map[block_id]](hh, temb, text_emb, stack,
                                            batch_size=1)
            hh = unet.conv_norm_out(hh)
            return unet.conv_out(torch.nn.functional.silu(hh))

    sched = ref_sched_mod.EnhancedDDIMScheduler(beta_schedule="linear")
    sched.set_timesteps(steps)
    with torch.no_grad():
        for t in sched.timesteps:
            tt = t[None].float() if t.ndim == 0 else t.float()
            e_p = dance_xl(lat, tt, ctx_p, pool_p)
            e_n = dance_xl(lat, tt, ctx_n, pool_n)
            eps = e_n + cfg * (e_p - e_n)
            lat = sched.step(eps, tt, lat)
    ref = lat.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-2)
