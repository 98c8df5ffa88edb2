"""Pipeline-LEVEL golden parity for the SD3 / SD3.5 family.

Runs the reference's full SD3 composition — default FlowMatchScheduler
(shift 3.0, sigma_min 0.003/1.002, no extra step:
diffsynth/schedulers/flow_match.py:7-31), SD3Prompter merge
(pad(cat(CLIP-L hidden, CLIP-G hidden)) cat-seq T5-or-zeros, pooled
cat(pooled1, pooled2): diffsynth/prompters/sd3_prompter.py:66-119 with
clip_skip=2 on BOTH towers: sd3_text_encoder.py:11,72), CFG
`nega + s*(posi-nega)` (sd3_image.py:121-133) — on tiny weights against
`SD3Pipeline.__call__` with the same converted weights, REAL dual CLIP
tokenization (distinct tokenizer_1/tokenizer_2), and the same initial noise,
comparing final latents."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import load_reference_module, reference_available

import zoo_ckpts as Z

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def test_sd3_pipeline_matches_reference_denoise_loop():
    import torch

    from goal_force_tpu.models.sd3_dit import sd3_dit_params_from_torch
    from goal_force_tpu.models.sd_text_encoder import (
        sd_text_params_from_torch,
        sdxl_text_params_from_torch,
    )
    from goal_force_tpu.pipelines.sd3 import SD3Pipeline, tiny_sd3_configs
    from goal_force_tpu.prompters import sd3_tokenizers

    ref_sd3 = Z.refmodels("sd3_dit")
    ref_te = Z.refmodels("sd3_text_encoder")
    ref_sched_mod = load_reference_module("diffsynth/schedulers/flow_match.py",
                                          "ref_flow_match")
    ref_clip_layer = Z.refmodels("sd_text_encoder").CLIPEncoderLayer

    dit_cfg, t5_cfg, c1_cfg, c2_cfg = tiny_sd3_configs()

    # --- tiny reference DiT (context/pooled/time embedders re-sized: the
    # class hardcodes 4096/2048/256 at sd3_dit.py:346-348) -----------------
    torch.manual_seed(0)
    dit = ref_sd3.SD3DiT(embed_dim=dit_cfg.dim, num_layers=dit_cfg.num_layers,
                         use_rms_norm=dit_cfg.use_rms_norm,
                         num_dual_blocks=dit_cfg.num_dual_blocks,
                         pos_embed_max_size=dit_cfg.pos_embed_max_size)
    dit.context_embedder = torch.nn.Linear(dit_cfg.text_dim, dit_cfg.dim)
    dit.pooled_text_embedder = torch.nn.Sequential(
        torch.nn.Linear(dit_cfg.pooled_dim, dit_cfg.dim), torch.nn.SiLU(),
        torch.nn.Linear(dit_cfg.dim, dit_cfg.dim))
    dit.time_embedder = ref_sd3.TimestepEmbeddings(dit_cfg.freq_dim,
                                                   dit_cfg.dim)
    dit = Z._seed(dit, 0.1).eval()

    # --- tiny reference text towers ----------------------------------------
    te1 = ref_te.SD3TextEncoder1.__new__(ref_te.SD3TextEncoder1)
    torch.nn.Module.__init__(te1)
    te1.token_embedding = torch.nn.Embedding(c1_cfg.vocab_size,
                                             c1_cfg.text_dim)
    te1.position_embeds = torch.nn.Parameter(
        torch.zeros(1, 77, c1_cfg.text_dim))
    te1.encoders = torch.nn.ModuleList(
        [ref_clip_layer(c1_cfg.text_dim, 2 * c1_cfg.text_dim,
                        num_heads=c1_cfg.text_heads,
                        head_dim=c1_cfg.text_dim // c1_cfg.text_heads)
         for _ in range(c1_cfg.text_layers)])
    te1.attn_mask = te1.attention_mask(77)
    te1.final_layer_norm = torch.nn.LayerNorm(c1_cfg.text_dim)
    te1 = Z._seed(te1, 0.05, 1).eval()

    ref_te2_mod = Z.refmodels("sdxl_text_encoder")
    te2 = ref_te2_mod.SDXLTextEncoder2(
        embed_dim=c2_cfg.text_dim, num_encoder_layers=c2_cfg.text_layers,
        encoder_intermediate_size=2 * c2_cfg.text_dim)
    te2.encoders = torch.nn.ModuleList(
        [ref_clip_layer(c2_cfg.text_dim, 2 * c2_cfg.text_dim,
                        num_heads=c2_cfg.text_heads,
                        head_dim=c2_cfg.text_dim // c2_cfg.text_heads,
                        use_quick_gelu=False)
         for _ in range(c2_cfg.text_layers)])
    te2 = Z._seed(te2, 0.05, 2).eval()

    # --- our pipeline on the converted weights ------------------------------
    tok1, tok2, tok3 = sd3_tokenizers(t5_length=16)
    pipe = SD3Pipeline(
        dit=sd3_dit_params_from_torch(Z.sd_of(dit), dit_cfg),
        clip1=sd_text_params_from_torch(Z.sd_of(te1), c1_cfg),
        clip2=sdxl_text_params_from_torch(Z.sd_of(te2), c2_cfg,
                                          with_projection=True),
        t5=None, vae_encoder=None, vae_decoder=None,
        dit_cfg=dit_cfg, t5_cfg=t5_cfg, clip1_cfg=c1_cfg, clip2_cfg=c2_cfg,
        tokenize_clip=tok1, tokenize_clip2=tok2, tokenize_t5=tok3,
        dtype=jnp.float32,
    )

    prompt, negative = "a fox leaping over a frozen river", "low quality"
    steps, cfg, seed, h, w = 5, 4.5, 11, 32, 32
    ours = pipe(prompt, negative, height=h, width=w,
                num_inference_steps=steps, cfg_scale=cfg, seed=seed,
                return_latents=True)

    # --- reference loop: same ids, same initial noise, its scheduler --------
    noise = np.asarray(jax.random.normal(jax.random.PRNGKey(seed),
                                         (1, h // 8, w // 8, 16), jnp.float32))
    lat = torch.tensor(noise.transpose(0, 3, 1, 2))

    def embed(text):
        # SD3Prompter.encode_prompt (sd3_prompter.py:92-119), T5 absent
        ids1 = torch.tensor(np.asarray(tok1(text))[None].astype(np.int64))
        ids2 = torch.tensor(np.asarray(tok2(text))[None].astype(np.int64))
        with torch.no_grad():
            pool1, h1 = te1(ids1)
            pool2, h2 = te2(ids2)
        clip_emb = torch.cat([h1, h2], dim=-1)
        clip_emb = torch.nn.functional.pad(
            clip_emb, (0, dit_cfg.text_dim - clip_emb.shape[-1]))
        t5_emb = torch.zeros((1, 16, dit_cfg.text_dim))
        return (torch.cat([clip_emb, t5_emb], dim=-2),
                torch.cat([pool1, pool2], dim=-1))

    ctx_p, pool_p = embed(prompt)
    ctx_n, pool_n = embed(negative)

    sched = ref_sched_mod.FlowMatchScheduler()
    sched.set_timesteps(steps)
    with torch.no_grad():
        for t in sched.timesteps:
            tt = t[None].float()
            e_p = dit(lat, tt, ctx_p, pool_p)
            e_n = dit(lat, tt, ctx_n, pool_n)
            eps = e_n + cfg * (e_p - e_n)
            lat = sched.step(eps, tt[0], lat)
    ref = lat.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-2)
