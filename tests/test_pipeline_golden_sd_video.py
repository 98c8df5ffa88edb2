"""Pipeline-LEVEL golden parity for AnimateDiff (SDVideoPipeline).

Runs the reference composition — EnhancedDDIMScheduler with LINEAR betas (the
original-AnimateDiff schedule, diffsynth/pipelines/sd_video.py:70-72),
per-frame noise (F,4,h,w) (:190), `lets_dance` with temporal motion modules
interleaved after their mapped blocks (dancer.py:94-100), CFG — on a tiny
reference SD UNet + SDMotionModel against `SDVideoPipeline.__call__` with the
same converted weights, REAL CLIP tokenization, and the same initial noise,
comparing final latents."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import load_reference_module, reference_available

import zoo_ckpts as Z

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def test_sd_video_pipeline_matches_reference_denoise_loop():
    import torch

    from test_sd_unet import _torch_tiny, ref_sd

    from goal_force_tpu.models.clip import CLIPConfig
    from goal_force_tpu.models.sd_motion import motion_params_from_torch
    from goal_force_tpu.models.sd_text_encoder import sd_text_params_from_torch
    from goal_force_tpu.models.sd_unet import (
        sd_unet_params_from_torch,
        tiny_sd_plan,
    )
    from goal_force_tpu.pipelines.sd_video import SDVideoPipeline
    from goal_force_tpu.prompters import sd_clip_tokenizer

    ref_sched_mod = load_reference_module("diffsynth/schedulers/ddim.py",
                                          "ref_ddim_v")
    ref_te_mod = Z.refmodels("sd_text_encoder")
    ref_motion = Z.refmodels("sd_motion")

    plan = tiny_sd_plan(ctx_dim=48)
    unet = _torch_tiny(plan, time_dim=16, model_dim=8, groups=4)

    # motion modules after every attn block of the tiny plan (the reference
    # maps block_id -> module_id in SDMotionModel.call_block_id :120-146)
    attn_ids = [i for i, s in enumerate(plan) if s[0] == "attn"]
    torch.manual_seed(5)
    motion = torch.nn.Module()
    motion.motion_modules = torch.nn.ModuleList(
        [ref_motion.TemporalBlock(2, plan[pi][3] // 2, plan[pi][3],
                                  norm_num_groups=4, eps=1e-6)
         for pi in attn_ids])
    for p in motion.parameters():
        p.data = torch.randn_like(p.data) * 0.1
    motion = motion.eval()
    call_map = {pi: j for j, pi in enumerate(attn_ids)}

    torch.manual_seed(3)
    te = ref_te_mod.SDTextEncoder(
        embed_dim=48, vocab_size=49408, max_position_embeddings=77,
        num_encoder_layers=2, encoder_intermediate_size=96)
    te.encoders = torch.nn.ModuleList(
        [ref_te_mod.CLIPEncoderLayer(48, 96, num_heads=4, head_dim=12)
         for _ in range(2)])
    te = Z._seed(te, 0.05, 3)

    te_cfg = CLIPConfig(vocab_size=49408, text_dim=48, text_heads=4,
                        text_layers=2, max_positions=77,
                        hidden_act="quick_gelu")
    tok = sd_clip_tokenizer()
    pipe = SDVideoPipeline(
        unet=sd_unet_params_from_torch(Z.sd_of(unet), plan),
        motion=jax.tree_util.tree_map(
            jnp.asarray,
            motion_params_from_torch(Z.sd_of(motion), call_map=call_map)),
        text_encoder=sd_text_params_from_torch(Z.sd_of(te), te_cfg),
        vae_decoder=None, plan=plan, text_cfg=te_cfg, groups=4,
        tokenize=tok, dtype=jnp.float32,
    )

    prompt, negative = "a dancing robot", "static"
    steps, cfg, seed, frames = 4, 7.5, 9, 4
    ours = pipe(prompt, negative, num_frames=frames, height=32, width=32,
                num_inference_steps=steps, cfg_scale=cfg, seed=seed,
                return_latents=True)

    # --- reference loop ----------------------------------------------------
    noise = np.asarray(jax.random.normal(jax.random.PRNGKey(seed),
                                         (frames, 4, 4, 4), jnp.float32))
    lat = torch.tensor(noise.transpose(0, 3, 1, 2))

    def embed(text):
        ids = torch.tensor(np.asarray(tok(text))[None].astype(np.int64))
        with torch.no_grad():
            return te(ids, clip_skip=1)

    ctx_p, ctx_n = embed(prompt), embed(negative)

    def dance(sample, timestep, ctx):
        # dancer.py lets_dance :57-110 with motion modules, single unet batch
        ctx = ctx.repeat(sample.shape[0], 1, 1)
        with torch.no_grad():
            temb = ref_sd.Timesteps(8)(timestep).to(sample.dtype)
            temb = unet.time_embedding(temb)
            h = unet.conv_in(sample)
            stack = [h]
            text_emb = ctx
            for block_id, block in enumerate(unet.blocks):
                h, temb, text_emb, stack = block(h, temb, text_emb, stack)
                if block_id in call_map:
                    h, temb, text_emb, stack = motion.motion_modules[
                        call_map[block_id]](h, temb, text_emb, stack,
                                            batch_size=1)
            h = unet.conv_norm_out(h)
            h = torch.nn.functional.silu(h)
            return unet.conv_out(h)

    sched = ref_sched_mod.EnhancedDDIMScheduler(beta_schedule="linear")
    sched.set_timesteps(steps)
    with torch.no_grad():
        for t in sched.timesteps:
            tt = t[None] if t.ndim == 0 else t
            e_p = dance(lat, tt.float(), ctx_p)
            e_n = dance(lat, tt.float(), ctx_n)
            eps = e_n + cfg * (e_p - e_n)
            lat = sched.step(eps, tt, lat)
    ref = lat.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-2)
