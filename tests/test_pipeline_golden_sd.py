"""Pipeline-LEVEL golden parity for one zoo family (VERDICT round-2 #8).

The per-model golden tests can't catch scheduler/CFG/composition drift; this
runs the reference's FULL denoise loop — its EnhancedDDIMScheduler
(diffsynth/schedulers/ddim.py), its SDTextEncoder, its plan-built UNet — on
tiny weights against `SDPipeline.__call__` with the SAME converted weights,
REAL CLIP tokenization, and the same initial noise, comparing final latents."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import load_reference_module, reference_available

import zoo_ckpts as Z

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def test_sd_pipeline_matches_reference_denoise_loop():
    import torch

    from test_sd_unet import _torch_forward, _torch_tiny
    from goal_force_tpu.models.sd_text_encoder import sd_text_params_from_torch
    from goal_force_tpu.models.sd_unet import (
        sd_unet_params_from_torch,
        tiny_sd_plan,
    )
    from goal_force_tpu.pipelines.sd import SDPipeline
    from goal_force_tpu.prompters import sd_clip_tokenizer

    ref_sched_mod = load_reference_module("diffsynth/schedulers/ddim.py",
                                          "ref_ddim")
    ref_te_mod = Z.refmodels("sd_text_encoder")

    plan = tiny_sd_plan(ctx_dim=48)
    unet = _torch_tiny(plan, time_dim=16, model_dim=8, groups=4)
    torch.manual_seed(3)
    te = ref_te_mod.SDTextEncoder(
        embed_dim=48, vocab_size=49408, max_position_embeddings=77,
        num_encoder_layers=2, encoder_intermediate_size=96)
    te.encoders = torch.nn.ModuleList(
        [ref_te_mod.CLIPEncoderLayer(48, 96, num_heads=4, head_dim=12)
         for _ in range(2)])
    te = Z._seed(te, 0.05, 3)

    from goal_force_tpu.models.clip import CLIPConfig

    te_cfg = CLIPConfig(vocab_size=49408, text_dim=48, text_heads=4,
                        text_layers=2, max_positions=77,
                        hidden_act="quick_gelu")
    tok = sd_clip_tokenizer()
    pipe = SDPipeline(
        unet=sd_unet_params_from_torch(Z.sd_of(unet), plan),
        text_encoder=sd_text_params_from_torch(Z.sd_of(te), te_cfg),
        vae_encoder=None, vae_decoder=None,
        plan=plan, text_cfg=te_cfg, groups=4,
        tokenize=tok, dtype=jnp.float32,
    )

    prompt, negative, steps, cfg, seed = "a red fox", "blurry", 5, 7.5, 11
    ours = pipe(prompt, negative, height=32, width=32,
                num_inference_steps=steps, cfg_scale=cfg, seed=seed,
                return_latents=True)

    # --- reference loop: same ids, same initial noise, its scheduler ---
    noise = np.asarray(jax.random.normal(jax.random.PRNGKey(seed),
                                         (1, 4, 4, 4), jnp.float32))
    lat = torch.tensor(noise.transpose(0, 3, 1, 2))
    ids_p = torch.tensor(np.asarray(tok(prompt))[None].astype(np.int64))
    ids_n = torch.tensor(np.asarray(tok(negative))[None].astype(np.int64))
    with torch.no_grad():
        ctx_p = te(ids_p, clip_skip=1)
        ctx_n = te(ids_n, clip_skip=1)
    sched = ref_sched_mod.EnhancedDDIMScheduler()
    sched.set_timesteps(steps)
    with torch.no_grad():
        for t in sched.timesteps:
            tt = t[None] if t.ndim == 0 else t
            e_p = _torch_forward(unet, plan, lat, tt.float(), ctx_p, model_dim=8)
            e_n = _torch_forward(unet, plan, lat, tt.float(), ctx_n, model_dim=8)
            eps = e_n + cfg * (e_p - e_n)
            lat = sched.step(eps, tt, lat)
    ref = lat.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-2)
