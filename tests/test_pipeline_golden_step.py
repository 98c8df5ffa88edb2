"""Pipeline-LEVEL golden parity for StepVideo.

StepVideo composes a REVERSED shift-13 flow-match schedule with
num_train_timesteps=1 (diffsynth/pipelines/step_video.py:24,175) and dual text
conditioning — a schedule direction no other family exercises. Drive the
reference's own FlowMatchScheduler and its StepVideoModel (fully configurable
ctor, as in the model golden) through the reference CFG loop
(step_video.py:188-201) against `StepVideoPipeline.__call__` with the same
weights, prompt embeddings, and noise, comparing final latents.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import load_reference_module, reference_available

import zoo_ckpts as Z

from goal_force_tpu.models.stepvideo_dit import (
    StepVideoConfig,
    stepvideo_dit_params_from_torch,
)
from goal_force_tpu.pipelines.step_video import StepVideoPipeline

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")

H, W, FRAMES, STEPS, CFG, SEED = 64, 96, 17, 5, 9.0, 3


def test_stepvideo_pipeline_matches_reference_loop():
    import torch

    ref_sv = Z.refmodels("stepvideo_dit")
    cfg = StepVideoConfig(num_heads=4, head_dim=16, num_layers=2,
                          in_channels=8, caption_dim=32, clip_dim=16,
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
    for blk in m.transformer_blocks:
        blk.attn1.rope_ch_split = list(cfg.rope_split)

    dit_p = jax.tree_util.tree_map(jnp.asarray, stepvideo_dit_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg))
    from goal_force_tpu.models.stepvideo_vae import tiny_stepvideo_vae_config

    pipe = StepVideoPipeline(dit=dit_p, vae=None, dit_cfg=cfg,
                             vae_cfg=tiny_stepvideo_vae_config(),
                             dtype=jnp.float32)
    ours = pipe("a panda", negative_prompt="static", cfg_scale=CFG,
                height=H, width=W, num_frames=FRAMES,
                num_inference_steps=STEPS, seed=SEED, return_latents=True)

    # shared embeddings: the pipeline's deterministic hashed stand-ins (the
    # Step-1/BERT encoders have their own golden tests; under test here is
    # the reversed-schedule + CFG + euler composition)
    llm_p, clip_p, llm_n, clip_n = [torch.tensor(np.asarray(x))
                                    for x in pipe._prompts("a panda", "static")]
    mask = torch.ones((1, clip_p.shape[1] + llm_p.shape[1]), dtype=torch.int64)

    f = max(FRAMES // 17 * 3, 1)
    noise = np.asarray(jax.random.normal(
        jax.random.PRNGKey(SEED), (1, f, H // 16, W // 16, cfg.in_channels),
        jnp.float32))
    lat = torch.tensor(noise.transpose(0, 1, 4, 2, 3))

    ref_fm = load_reference_module("diffsynth/schedulers/flow_match.py",
                                   "ref_flow_match_step")
    sched = ref_fm.FlowMatchScheduler(sigma_min=0.0, extra_one_step=True,
                                      shift=13.0, reverse_sigmas=True,
                                      num_train_timesteps=1)
    sched.set_timesteps(STEPS)
    with torch.no_grad():
        for i, t in enumerate(sched.timesteps):
            tt = t.unsqueeze(0).float()
            posi = m(lat, encoder_hidden_states=llm_p,
                     encoder_hidden_states_2=clip_p, timestep=tt,
                     encoder_attention_mask=mask)
            nega = m(lat, encoder_hidden_states=llm_n,
                     encoder_hidden_states_2=clip_n, timestep=tt,
                     encoder_attention_mask=mask)
            pred = nega + CFG * (posi - nega)
            lat = sched.step(pred, sched.timesteps[i], lat)
    ref = lat.numpy().transpose(0, 1, 3, 4, 2)

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-2)
