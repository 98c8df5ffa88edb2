"""Pipeline-LEVEL golden parity for Kolors.

Runs the reference's Kolors composition — EnhancedDDIMScheduler(beta_end=0.014,
num_train_timesteps=1100) (diffsynth/pipelines/sdxl_image.py:63-68),
KolorsPrompter: ChatGLM hidden_states[-2] seq-first as the prompt embedding,
hidden_states[-1][-1] (last pre-norm token) as the pooled embedding
(prompters/kolors_prompter.py:324-353), SDXLUNet-with-text_intermediate_proj
forward (models/sdxl_unet.py:99-111), CFG — on tiny weights against
`KolorsPipeline.__call__` with the same converted weights, the same
tokenization, and the same initial noise, comparing final latents."""

import zlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import load_reference_module, reference_available

import zoo_ckpts as Z

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def _tok(text, length=16, vocab=96):
    """Deterministic stand-in tokenizer shared by both sides (the real ChatGLM
    sentencepiece model is external data; tokenization is not under test)."""
    ids = [3 + zlib.crc32(w.encode()) % (vocab - 3) for w in text.split()]
    ids = ids[:length] + [0] * (length - len(ids))
    return np.asarray(ids, np.int64)


def test_kolors_pipeline_matches_reference_denoise_loop():
    import torch

    from test_kolors import ref_glm
    from test_sdxl_unet import ref_sdxl

    from goal_force_tpu.models.kolors_text_encoder import (
        ChatGLMConfig,
        chatglm_params_from_torch,
    )
    from goal_force_tpu.models.sdxl_unet import sdxl_unet_params_from_torch
    from goal_force_tpu.pipelines.kolors import (
        KolorsPipeline,
        tiny_kolors_configs,
    )

    ref_sched_mod = load_reference_module("diffsynth/schedulers/ddim.py",
                                          "ref_ddim_kolors")

    glm_cfg, plan = tiny_kolors_configs()
    ref_cfg = ref_glm.ChatGLMConfig(
        num_layers=glm_cfg.num_layers, padded_vocab_size=glm_cfg.vocab,
        hidden_size=glm_cfg.hidden_size, ffn_hidden_size=glm_cfg.ffn_hidden_size,
        kv_channels=glm_cfg.kv_channels, num_attention_heads=glm_cfg.num_heads,
        seq_length=32, hidden_dropout=0.0, attention_dropout=0.0,
        layernorm_epsilon=glm_cfg.eps, rmsnorm=True,
        apply_residual_connection_post_layernorm=False, post_layer_norm=True,
        add_bias_linear=False, add_qkv_bias=True, multi_query_attention=True,
        multi_query_group_num=glm_cfg.kv_groups, original_rope=True,
        torch_dtype=torch.float32, use_cache=False, output_hidden_states=True,
        return_dict=True)
    torch.manual_seed(0)
    glm = ref_glm.ChatGLMModel(ref_cfg, empty_init=False).eval().float()
    for p in glm.parameters():
        p.data = torch.randn_like(p.data) * 0.05

    # tiny Kolors UNet: SDXL blocks + text_intermediate_proj, add embedding
    # over (glm_hidden + 6*256)
    time_dim, model_dim, ctx_dim = 16, 8, 24
    torch.manual_seed(1)
    blocks = []
    for spec in plan:
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
        torch.nn.Linear(glm_cfg.hidden_size + 6 * 256, time_dim),
        torch.nn.SiLU(), torch.nn.Linear(time_dim, time_dim))
    unet.text_intermediate_proj = torch.nn.Linear(glm_cfg.hidden_size, ctx_dim)
    unet.conv_in = torch.nn.Conv2d(4, model_dim, 3, padding=1)
    unet.blocks = torch.nn.ModuleList(blocks)
    unet.conv_norm_out = torch.nn.GroupNorm(4, model_dim, eps=1e-5)
    unet.conv_out = torch.nn.Conv2d(model_dim, 4, 3, padding=1)
    unet = Z._seed(unet, 0.1, 1).eval().float()

    pipe = KolorsPipeline(
        unet=sdxl_unet_params_from_torch(Z.sd_of(unet), plan),
        glm=chatglm_params_from_torch(Z.sd_of(glm), glm_cfg),
        vae_encoder=None, vae_decoder=None, glm_cfg=glm_cfg, plan=plan,
        groups=4, tokenize=_tok, dtype=jnp.float32,
    )

    prompt, negative = "a jade palace in spring", "blurry text"
    steps, cfg, seed, h, w = 5, 6.0, 17, 32, 32
    ours = pipe(prompt, negative, height=h, width=w,
                num_inference_steps=steps, cfg_scale=cfg, seed=seed,
                return_latents=True)

    # --- reference loop ------------------------------------------------------
    noise = np.asarray(jax.random.normal(jax.random.PRNGKey(seed),
                                         (1, h // 8, w // 8, 4), jnp.float32))
    lat = torch.tensor(noise.transpose(0, 3, 1, 2))

    def embed(text):
        ids = torch.tensor(_tok(text)[None])
        with torch.no_grad():
            out = glm(input_ids=ids,
                      attention_mask=torch.ones_like(ids),
                      position_ids=torch.arange(ids.shape[1])[None],
                      output_hidden_states=True, use_cache=False,
                      return_dict=True)
        return (out.hidden_states[-2].permute(1, 0, 2).clone(),
                out.hidden_states[-1][-1, :, :].clone())

    ctx_p, pool_p = embed(prompt)
    ctx_n, pool_n = embed(negative)
    add_ids = torch.tensor([h, w, 0, 0, h, w], dtype=torch.float32)

    def unet_fwd(x, t, ctx, pooled):
        # SDXLUNet.forward with Kolors text_intermediate_proj (:96-111)
        with torch.no_grad():
            temb = ref_sdxl.Timesteps(model_dim)(t)
            temb = unet.time_embedding(temb)
            ids = ref_sdxl.Timesteps(256)(add_ids).reshape(1, -1)
            add = torch.cat([pooled, ids], dim=-1)
            temb = temb + unet.add_time_embedding(add)
            hh = unet.conv_in(x)
            stack = [hh]
            text_emb = unet.text_intermediate_proj(ctx)
            for block in unet.blocks:
                hh, temb, text_emb, stack = block(hh, temb, text_emb, stack)
            hh = unet.conv_norm_out(hh)
            return unet.conv_out(torch.nn.functional.silu(hh))

    sched = ref_sched_mod.EnhancedDDIMScheduler(beta_end=0.014,
                                                num_train_timesteps=1100)
    sched.set_timesteps(steps)
    with torch.no_grad():
        for t in sched.timesteps:
            tt = t[None].float() if t.ndim == 0 else t.float()
            e_p = unet_fwd(lat, tt, ctx_p, pool_p)
            e_n = unet_fwd(lat, tt, ctx_n, pool_n)
            eps = e_n + cfg * (e_p - e_n)
            lat = sched.step(eps, tt, lat)
    ref = lat.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-2)
