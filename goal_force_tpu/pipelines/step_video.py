"""StepVideo text-to-video pipeline.

Mirrors /root/reference/diffsynth/pipelines/step_video.py: FlowMatch scheduler
with shift 13, reversed sigmas and num_train_timesteps=1 (:24), latents
(1, F//17*3, 64, H/16, W/16) (:178), dual text conditioning (HunyuanDiT CLIP
pooled stream + Step-LLM hidden states :135-140), CFG over the full model
(:192-198), chunked StepVideo VAE decode with seam smoothing (:204-207).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.stepvideo_dit import (
    StepVideoConfig,
    init_stepvideo_dit,
    stepvideo_dit_forward,
)
from goal_force_tpu.models.stepvideo_vae import (
    StepVideoVAEConfig,
    stepvideo_vae_decode,
    tiny_stepvideo_vae_config,
)
from goal_force_tpu.schedulers import flow_match


@dataclasses.dataclass
class StepVideoPipeline:
    dit: Dict
    vae: Optional[Dict]
    dit_cfg: StepVideoConfig
    vae_cfg: StepVideoVAEConfig
    # encode_prompt(prompt, positive) -> (clip_emb (B, Lc, clip_dim),
    # llm_emb (B, L, llm_dim)); pluggable like the reference prompter
    encode_prompt: Optional[Callable] = None
    dtype: object = jnp.bfloat16

    @classmethod
    def from_pretrained(
        cls,
        dit_path,
        vae_path=None,
        vae_cfg=None,                      # StepVideoVAEConfig
        encode_prompt=None,                # (prompt, positive) -> (clip, llm)
        bert_path=None,                    # HunyuanDiT-CLIP text tower
        step1_path=None,                   # Step-1 LLM
        bert_tokenizer="vendored",
        step1_tokenizer_dir=None,          # ships with the LLM checkpoint
        dtype=jnp.bfloat16,
        bert_num_heads=None,
        step1_num_heads=None,
    ) -> "StepVideoPipeline":
        """StepVideo 'load weights, generate' (reference ModelManager rows;
        stepvideo_prompter.py: HunyuanDiT-CLIP 77 tokens + Step-1 LLM 320).
        Pass bert_path/step1_path to build the prompter from files, or a
        ready `encode_prompt` callable."""
        from goal_force_tpu.io.auto import load_model, load_weights
        from goal_force_tpu.models.stepvideo_vae import (
            StepVideoVAEConfig,
            stepvideo_vae_params_from_torch,
        )

        to_dev = lambda tree: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), tree)
        dit = load_model(dit_path)
        if dit["kind"] != "stepvideo_dit":
            raise ValueError(f"{dit_path} detected as {dit['kind']!r}")
        vae, vcfg = None, vae_cfg or StepVideoVAEConfig()
        if vae_path is not None:
            vae = to_dev(stepvideo_vae_params_from_torch(
                load_weights(vae_path), vcfg))
        if encode_prompt is None and bert_path is not None \
                and step1_path is not None:
            rb = load_model(bert_path, num_heads=bert_num_heads)
            rs = load_model(step1_path, num_heads=step1_num_heads)
            tok_bert = bert_tokenizer
            if bert_tokenizer == "vendored":
                from goal_force_tpu.prompters import hunyuan_dit_tokenizers

                tok_bert, _ = hunyuan_dit_tokenizers()
            tok_step1 = None
            if step1_tokenizer_dir is not None:
                from goal_force_tpu.prompters import load_text_tokenizer

                tok_step1 = load_text_tokenizer(step1_tokenizer_dir, 320)
            encode_prompt = make_stepvideo_prompt_encoder(
                to_dev(rb["params"]), rb["config"],
                to_dev(rs["params"]), rs["config"],
                tokenize_bert=tok_bert, tokenize_step1=tok_step1)
        return cls(dit=to_dev(dit["params"]), vae=vae, dit_cfg=dit["config"],
                   vae_cfg=vcfg, encode_prompt=encode_prompt, dtype=dtype)

    @classmethod
    def init_random(cls, key=None, dtype=jnp.float32) -> "StepVideoPipeline":
        from goal_force_tpu.models.stepvideo_vae import (
            stepvideo_vae_params_from_torch,
        )

        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, 2)
        dit_cfg = StepVideoConfig(num_heads=4, head_dim=16, num_layers=2,
                                  in_channels=8, caption_dim=32, clip_dim=16,
                                  rope_split=(8, 4, 4))
        vae_cfg = dataclasses.replace(tiny_stepvideo_vae_config(),
                                      z_dim=dit_cfg.in_channels)
        dit = init_stepvideo_dit(ks[0], dit_cfg, dtype=dtype)
        vae = _init_tiny_stepvideo_vae(ks[1], vae_cfg, dtype)
        return cls(dit=dit, vae=vae, dit_cfg=dit_cfg, vae_cfg=vae_cfg,
                   dtype=dtype)

    @functools.cached_property
    def _denoise_cfg(self):
        cfg = self.dit_cfg

        @jax.jit
        def fn(dit, latents, t, llm_p, clip_p, llm_n, clip_n, cfg_scale):
            vp = stepvideo_dit_forward(dit, cfg, latents, t, llm_p, clip_p)
            vn = stepvideo_dit_forward(dit, cfg, latents, t, llm_n, clip_n)
            return vn + cfg_scale * (vp - vn)

        return fn

    def _prompts(self, prompt, negative_prompt):
        if self.encode_prompt is not None:
            clip_p, llm_p = self.encode_prompt(prompt, True)
            clip_n, llm_n = self.encode_prompt(negative_prompt, False)
        else:  # deterministic hashed stand-in embeddings for tiny runs
            from goal_force_tpu.pipelines.flux import _hash_ids

            def emb(text, dim, length):
                ids = _hash_ids(text, 997, length)
                key = jax.random.PRNGKey(int(ids.sum()))
                return jax.random.normal(key, (1, length, dim), jnp.float32)

            clip_p = emb(prompt, self.dit_cfg.clip_dim, 4)
            clip_n = emb(negative_prompt, self.dit_cfg.clip_dim, 4)
            llm_p = emb(prompt, self.dit_cfg.caption_dim, 8)
            llm_n = emb(negative_prompt, self.dit_cfg.caption_dim, 8)
        cast = lambda x: x.astype(self.dtype)
        return cast(llm_p), cast(clip_p), cast(llm_n), cast(clip_n)

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 9.0,
        height: int = 544,
        width: int = 992,
        num_frames: int = 204,
        num_inference_steps: int = 30,
        seed: int = 0,
        smooth_scale: float = 0.6,
        tiled: bool = False,
        tile_size=(34, 34),
        tile_stride=(16, 16),
        return_latents: bool = False,
    ) -> np.ndarray:
        # tiled: spatially tiled VAE decode in latent units (reference
        # step_video.py:164-172 -> stepvideo_vae.py tiled_decode :1052-1101).
        # The reference signature also lists input_video/denoising_strength
        # but its body never consumes them (step_video.py:155-178), so they
        # are intentionally absent here.
        schedule = flow_match.make_schedule(
            num_inference_steps, shift=13.0, sigma_min=0.0,
            extra_one_step=True, reverse_sigmas=True, num_train_timesteps=1)
        llm_p, clip_p, llm_n, clip_n = self._prompts(prompt, negative_prompt)

        f = max(num_frames // self.vae_cfg.frame_len * self.vae_cfg.latent_len,
                1)
        latents = jax.random.normal(
            jax.random.PRNGKey(seed),
            (1, f, height // 16, width // 16, self.dit_cfg.in_channels),
            jnp.float32).astype(self.dtype)
        for i in range(len(schedule)):
            t = jnp.full((1,), schedule.timesteps[i], self.dtype)
            v = self._denoise_cfg(self.dit, latents, t, llm_p, clip_p, llm_n,
                                  clip_n, float(cfg_scale))
            latents = flow_match.euler_step(latents, v.astype(latents.dtype),
                                            schedule.sigmas[i],
                                            schedule.sigma_next(i))
        if return_latents:
            return np.asarray(latents, np.float32)
        if tiled:
            from goal_force_tpu.models.stepvideo_vae import (
                stepvideo_vae_decode_tiled,
            )

            video = stepvideo_vae_decode_tiled(
                self.vae, latents.astype(jnp.float32), self.vae_cfg,
                tuple(tile_size), tuple(tile_stride))
        else:
            video = stepvideo_vae_decode(self.vae,
                                         latents.astype(jnp.float32),
                                         self.vae_cfg,
                                         smooth_scale=smooth_scale)
        return np.asarray((video[0] + 1.0) / 2.0, np.float32).clip(0.0, 1.0)


def _init_tiny_stepvideo_vae(key, cfg: StepVideoVAEConfig, dtype):
    """Random decoder-only params in the converter layout (tests/smoke)."""
    import torch

    # build shapes via numpy directly (decoder only; encoder optional)
    rng = np.random.RandomState(0)

    def c3(kt, kh, kw, ci, co):
        return {"w": jnp.asarray(rng.randn(kt, kh, kw, ci, co) * 0.05, dtype),
                "b": jnp.zeros((co,), dtype)}

    def c2(ci, co):
        return {"w": jnp.asarray(rng.randn(3, 3, ci, co) * 0.05, dtype),
                "b": jnp.zeros((co,), dtype)}

    def nrm(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def res(ci, co):
        p = {"norm1": nrm(ci), "conv1": c3(3, 3, 3, ci, co),
             "norm2": nrm(co), "conv2": c3(3, 3, 3, co, co)}
        if ci != co:
            p["shortcut"] = c3(1, 1, 1, ci, co)
        return p

    def attn(c):
        return {"norm": nrm(c), "q": c3(1, 1, 1, c, c), "k": c3(1, 1, 1, c, c),
                "v": c3(1, 1, 1, c, c), "proj": c3(1, 1, 1, c, c)}

    channels = 4 * cfg.z_dim * 8
    block_in = cfg.dec_ch * cfg.dec_mult[-1]
    dec_up = []
    dims = [cfg.dec_ch * m for m in cfg.dec_mult]
    cur = block_in
    for i in reversed(range(len(cfg.dec_mult))):
        out = dims[i]
        lvl = {"blocks": []}
        ci = cur
        for _ in range(cfg.num_res_blocks + 1):
            lvl["blocks"].append(res(ci, out))
            ci = out
        if i != 0:
            if i in cfg.dec_up3d_levels:
                lvl["upsample"] = {"conv3d": {
                    "conv1": c3(3, 3, 3, out, out), "norm1": nrm(out),
                    "conv2": c3(3, 3, 3, out, out), "norm2": nrm(out)}}
            else:
                lvl["upsample"] = c2(out, out)
        dec_up.insert(0, lvl)
        cur = out
    decoder = {
        "conv_in": c3(3, 3, 3, cfg.z_dim, channels),
        "conv_unpatchify": c3(3, 3, 3, channels, block_in * 8),
        "mid_block1": res(block_in, block_in),
        "mid_attn": attn(block_in),
        "mid_block2": res(block_in, block_in),
        "up": dec_up,
        "norm_out": nrm(cfg.dec_ch * cfg.dec_mult[0]),
        "conv_out": c3(3, 3, 3, cfg.dec_ch * cfg.dec_mult[0], 3),
    }
    return {"decoder": decoder}


def make_stepvideo_prompt_encoder(bert, bert_cfg, step1, step1_cfg,
                                  tokenize_bert=None, tokenize_step1=None,
                                  clip_len: int = 77, llm_len: int = 320):
    """Build encode_prompt from loaded text towers (reference
    stepvideo_prompter.py:25-56: HunyuanDiT-CLIP at 77 tokens + Step-1 LLM at
    320). Returns (clip_emb (1, 77, bert_dim), llm_emb (1, 320, llm_dim))."""
    import numpy as _np

    from goal_force_tpu.models.text_encoders import bert_encode, step1_encode
    from goal_force_tpu.pipelines.flux import _hash_ids

    def encode(prompt: str, positive: bool = True):
        if tokenize_bert is not None:
            bids = _np.asarray(tokenize_bert(prompt))[None]
        else:
            bids = _hash_ids(prompt, bert_cfg.vocab, clip_len)[None]
        bids = jnp.asarray(bids, jnp.int32)
        clip_emb = bert_encode(bert, bert_cfg, bids,
                               (bids != 0).astype(jnp.int32))
        if tokenize_step1 is not None:
            sids = _np.asarray(tokenize_step1(prompt))[None]
        else:
            sids = _hash_ids(prompt, step1_cfg.vocab, llm_len)[None]
        sids = jnp.asarray(sids, jnp.int32)
        llm_emb = step1_encode(step1, step1_cfg, sids)
        return clip_emb, llm_emb

    return encode
