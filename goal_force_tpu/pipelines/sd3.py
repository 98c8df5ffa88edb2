"""Stable Diffusion 3 / 3.5 text-to-image pipeline.

Mirrors the reference SD3ImagePipeline core path (/root/reference/diffsynth/
pipelines/sd3_image.py and prompters/sd3_prompter.py:66-93): prompt embeddings are
cat-seq( pad(cat(CLIP-L hidden, bigG hidden), ->4096), T5 ), pooled is
cat(CLIP-L pooled, bigG pooled) (2048); flow-match Euler schedule (shift 3.0);
true CFG as a merged batch; 16-channel SD3 VAE.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.configs import T5Config
from goal_force_tpu.models import t5 as t5m
from goal_force_tpu.models.clip import CLIPConfig
from goal_force_tpu.models.sd3_dit import SD3DiTConfig, init_sd3_dit, sd3_dit_forward
from goal_force_tpu.models.sd_text_encoder import (
    SD_TEXT_CONFIG,
    SDXL_TEXT2_CONFIG,
    sd3_text1_encode,
    sdxl_text2_encode,
)
from goal_force_tpu.models.sd_vae import (
    SD3_SCALING,
    SD_VAE_DECODER_PLAN,
    SD_VAE_ENCODER_PLAN,
    sd3_vae_decode,
    sd3_vae_encode,
)
from goal_force_tpu.pipelines.flux import _hash_ids, _init_sd3_vae, tiny_sd3_vae_plans
from goal_force_tpu.schedulers import flow_match as fm


def tiny_sd3_configs():
    dit_cfg = SD3DiTConfig(dim=64, num_layers=3, num_dual_blocks=1,
                           use_rms_norm=True, pos_embed_max_size=16,
                           text_dim=48, pooled_dim=40, freq_dim=32)
    t5_cfg = T5Config(vocab=128, dim=48, dim_attn=48, dim_ffn=96, num_heads=4,
                      num_layers=2, shared_pos=True, text_len=16)
    clip1 = dataclasses.replace(SD_TEXT_CONFIG, text_dim=16, text_heads=2,
                                text_layers=2)
    clip2 = dataclasses.replace(SDXL_TEXT2_CONFIG, text_dim=24, text_heads=2,
                                text_layers=2)
    return dit_cfg, t5_cfg, clip1, clip2


@dataclasses.dataclass
class SD3Pipeline:
    dit: Dict
    clip1: Dict
    clip2: Dict
    t5: Optional[Dict]
    vae_encoder: Optional[Dict]
    vae_decoder: Dict
    dit_cfg: SD3DiTConfig
    t5_cfg: T5Config
    clip1_cfg: CLIPConfig = SD_TEXT_CONFIG
    clip2_cfg: CLIPConfig = SDXL_TEXT2_CONFIG
    vae_scaling: Tuple[float, float] = SD3_SCALING
    vae_enc_plan: Tuple = SD_VAE_ENCODER_PLAN
    vae_dec_plan: Tuple = SD_VAE_DECODER_PLAN
    vae_groups: int = 32
    vae_factor: int = 8
    tokenize_clip: Optional[Callable] = None
    # CLIP-G tokenizer (pads differently from CLIP-L — reference
    # sd3_prompter.py keeps tokenizer_1 AND tokenizer_2); falls back to
    # tokenize_clip when unset
    tokenize_clip2: Optional[Callable] = None
    tokenize_t5: Optional[Callable] = None
    dtype: object = jnp.bfloat16
    attn_impl: str = "auto"

    @classmethod
    def from_pretrained(
        cls,
        dit_path,
        text_encoder_path=None,            # CLIP-L (diffsynth naming)
        text_encoder_2_path=None,          # CLIP-G with projection
        text_encoder_3_path=None,          # T5-XXL (optional, like the ref)
        vae_encoder_path=None,
        vae_decoder_path=None,
        tokenizer="vendored",              # CLIP ids for both towers
        tokenizer_t5="vendored",
        t5_length: int = 128,
        vae_plans=None,
        dtype=jnp.bfloat16,
        clip_num_heads=None,
        t5_num_heads=None,
    ) -> "SD3Pipeline":
        """Reference-format SD3 family load (reference: model_manager.py:
        395-461 SD3 rows; sd3_prompter.py drives CLIP-L+CLIP-G+optional T5).
        Configs are shape-inferred; tiny test files pass head overrides."""
        import dataclasses as dc

        from goal_force_tpu.io.auto import load_model
        from goal_force_tpu.pipelines.flux import init_clip_text

        to_dev = lambda tree: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), tree)
        dit = load_model(dit_path)
        if dit["kind"] != "sd3_dit":
            raise ValueError(f"{dit_path} detected as {dit['kind']!r}, not sd3_dit")
        enc_plan, dec_plan, groups = vae_plans or \
            (SD_VAE_ENCODER_PLAN, SD_VAE_DECODER_PLAN, 32)
        key = jax.random.PRNGKey(0)

        clip1_cfg, clip1 = SD_TEXT_CONFIG, None
        if text_encoder_path is not None:
            r = load_model(text_encoder_path, num_heads=clip_num_heads)
            clip1_cfg, clip1 = r["config"], to_dev(r["params"])
        clip2_cfg, clip2 = SDXL_TEXT2_CONFIG, None
        if text_encoder_2_path is not None:
            r = load_model(text_encoder_2_path, num_heads=clip_num_heads)
            clip2_cfg, clip2 = r["config"], to_dev(r["params"])
        t5_cfg, t5 = None, None
        if text_encoder_3_path is not None:
            r = load_model(text_encoder_3_path, num_heads=t5_num_heads)
            t5_cfg = dc.replace(r["config"], text_len=t5_length)
            t5 = to_dev(r["params"])
        vae_enc = vae_dec = None
        if vae_encoder_path is not None:
            vae_enc = to_dev(load_model(vae_encoder_path, plan=enc_plan)["params"])
        if vae_decoder_path is not None:
            vae_dec = to_dev(load_model(vae_decoder_path, plan=dec_plan)["params"])

        tok_clip, tok_clip2, tok_t5 = tokenizer, None, tokenizer_t5
        if tokenizer == "vendored" or tokenizer_t5 == "vendored":
            from goal_force_tpu.prompters import sd3_tokenizers

            v1, v2, v3 = sd3_tokenizers(t5_length=t5_length)
            if tokenizer == "vendored":
                tok_clip, tok_clip2 = v1, v2
            else:
                tok_clip = tokenizer
            tok_t5 = v3 if tokenizer_t5 == "vendored" else tokenizer_t5

        t5_cfg = t5_cfg or tiny_sd3_configs()[1]
        return cls(
            dit=to_dev(dit["params"]),
            clip1=clip1 if clip1 is not None else
            init_clip_text(key, clip1_cfg, dtype),
            clip2=clip2 if clip2 is not None else
            init_clip_text(key, clip2_cfg, dtype),
            t5=t5,
            vae_encoder=vae_enc, vae_decoder=vae_dec,
            dit_cfg=dit["config"], t5_cfg=t5_cfg,
            clip1_cfg=clip1_cfg, clip2_cfg=clip2_cfg,
            vae_enc_plan=enc_plan, vae_dec_plan=dec_plan, vae_groups=groups,
            vae_factor=2 ** sum(1 for b in enc_plan if b[0] == "downe"),
            tokenize_clip=tok_clip, tokenize_clip2=tok_clip2,
            tokenize_t5=tok_t5,
            dtype=dtype,
        )

    @classmethod
    def init_random(cls, key=None, dtype=jnp.float32) -> "SD3Pipeline":
        from goal_force_tpu.models.clip import init_clip
        from goal_force_tpu.pipelines.flux import init_clip_text

        key = key if key is not None else jax.random.PRNGKey(0)
        dit_cfg, t5_cfg, clip1_cfg, clip2_cfg = tiny_sd3_configs()
        ks = jax.random.split(key, 5)
        enc_plan, dec_plan, groups = tiny_sd3_vae_plans()
        enc, dec = _init_sd3_vae(ks[4], enc_plan, dec_plan, dtype)
        clip2 = init_clip_text(ks[2], clip2_cfg, dtype)
        clip2["text_proj"] = (jax.random.normal(
            ks[2], (clip2_cfg.text_dim, clip2_cfg.text_dim)) * 0.02).astype(dtype)
        return cls(
            dit=init_sd3_dit(ks[0], dit_cfg, dtype),
            clip1=init_clip_text(ks[1], clip1_cfg, dtype),
            clip2=clip2,
            t5=t5m.init_t5(ks[3], t5_cfg, dtype),
            vae_encoder=enc, vae_decoder=dec,
            dit_cfg=dit_cfg, t5_cfg=t5_cfg,
            clip1_cfg=clip1_cfg, clip2_cfg=clip2_cfg,
            vae_enc_plan=enc_plan, vae_dec_plan=dec_plan, vae_groups=groups,
            vae_factor=2 ** sum(1 for b in enc_plan if b[0] == "downe"),
            dtype=dtype,
        )

    @functools.cached_property
    def _encode_text(self):
        t5_cfg, c1, c2 = self.t5_cfg, self.clip1_cfg, self.clip2_cfg
        text_dim = self.dit_cfg.text_dim

        @functools.partial(jax.jit, static_argnames=("use_t5",))
        def fn(clip1, clip2, t5_params, clip_ids, clip2_ids, t5_ids, use_t5):
            pooled1, hidden1 = sd3_text1_encode(clip1, clip_ids, c1)
            pooled2, hidden2 = sdxl_text2_encode(clip2, clip2_ids, c2)
            clip_hidden = jnp.concatenate([hidden1, hidden2], axis=-1)
            pad = text_dim - clip_hidden.shape[-1]
            clip_hidden = jnp.pad(clip_hidden, ((0, 0), (0, 0), (0, pad)))
            if use_t5:
                t5_emb = t5m.t5_encode(t5_params, t5_cfg, t5_ids,
                                       jnp.ones_like(t5_ids))
            else:
                t5_emb = jnp.zeros(
                    (clip_ids.shape[0], t5_ids.shape[1], text_dim),
                    clip_hidden.dtype)
            prompt_emb = jnp.concatenate(
                [clip_hidden, t5_emb.astype(clip_hidden.dtype)], axis=1)
            pooled = jnp.concatenate([pooled1, pooled2], axis=-1)
            return prompt_emb, pooled

        return fn

    @functools.cached_property
    def _denoise_step(self):
        cfg = self.dit_cfg
        attn_impl = self.attn_impl

        @functools.partial(jax.jit, donate_argnums=(1,),
                           static_argnames=("tile_ctx",))
        def fn(dit, latents, timestep, sigma, sigma_next, prompt_emb, pooled,
               cfg_scale, tile_ctx=None, local_w=None):
            # prompt_emb/pooled rows: [posi, nega, local_1..L] — one merged
            # XLA call per step (the reference runs 2+L sequential passes)
            b = latents.shape[0]
            n = prompt_emb.shape[0] // b
            x = jnp.concatenate([latents] * n, axis=0)
            t = jnp.concatenate([timestep] * n, axis=0)
            if tile_ctx is not None:
                # reference sd3_dit.py:355-369: the WHOLE DiT runs per latent
                # tile (per-tile cropped pos-embed), blended by the ramp mask
                from goal_force_tpu.models.tiler import tiled_forward_2d

                v = tiled_forward_2d(
                    lambda xt: sd3_dit_forward(dit, cfg, xt, t, prompt_emb,
                                               pooled, attn_impl=attn_impl),
                    x, tile_ctx[0], tile_ctx[1]).astype(x.dtype)
            else:
                v = sd3_dit_forward(dit, cfg, x, t, prompt_emb, pooled,
                                    attn_impl=attn_impl)
            v_pos, v_neg = v[:b], v[b:2 * b]
            if local_w is not None:
                from goal_force_tpu.pipelines.regional import (
                    blend_local_predictions,
                )

                v_pos = blend_local_predictions(v_pos, v[2 * b:], local_w)
            v = v_neg + cfg_scale * (v_pos - v_neg)
            return fm.euler_step(latents, v.astype(latents.dtype), sigma, sigma_next)

        return fn

    @functools.cached_property
    def _decode(self):
        return jax.jit(lambda p, z: sd3_vae_decode(
            p, z, self.vae_scaling, self.vae_dec_plan, self.vae_groups))

    def _ids(self, prompts):
        clip_ids = np.stack([
            np.asarray(self.tokenize_clip(p)) if self.tokenize_clip
            else _hash_ids(p, self.clip1_cfg.vocab_size, 77) for p in prompts])
        tok2 = self.tokenize_clip2 or self.tokenize_clip
        clip2_ids = np.stack([
            np.asarray(tok2(p)) if tok2
            else _hash_ids(p, self.clip2_cfg.vocab_size, 77) for p in prompts])
        t5_ids = np.stack([
            np.asarray(self.tokenize_t5(p)) if self.tokenize_t5
            else _hash_ids(p, self.t5_cfg.vocab, self.t5_cfg.text_len)
            for p in prompts])
        return (jnp.asarray(clip_ids, jnp.int32),
                jnp.asarray(clip2_ids, jnp.int32),
                jnp.asarray(t5_ids, jnp.int32))

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 7.0,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 28,
        sigma_shift: Optional[float] = None,
        seed: int = 0,
        input_image: Optional[np.ndarray] = None,    # (H, W, 3) in [0, 1]
        denoising_strength: float = 1.0,
        local_prompts=None,
        masks=None,
        mask_scales=None,
        local_blur_kernel_size: int = 33,
        local_blur_sigma: float = 10.0,
        progress: bool = False,
        tiled: bool = False,
        tile_size: int = 128,
        tile_stride: int = 64,
        return_latents: bool = False,
    ) -> np.ndarray:
        # tiled: reference sd3_image.py:88-98 defaults (128/64); the DiT runs
        # whole-model-per-latent-tile and the VAE decode is tiled.
        # local_prompts/masks/mask_scales: regional prompting (sd3_image.py
        # :94,130,160 via base.py control_noise_via_local_prompts); input_image
        # + denoising_strength: i2i (sd3_image.py:117-125).
        schedule = fm.make_schedule(
            num_steps=num_inference_steps,
            shift=3.0 if sigma_shift is None else sigma_shift,
            sigma_min=0.003 / 1.002, extra_one_step=False,
            denoising_strength=denoising_strength
            if input_image is not None else 1.0,
        )
        local_prompts = list(local_prompts or [])
        clip_ids, clip2_ids, t5_ids = self._ids(
            [prompt, negative_prompt] + local_prompts)
        prompt_emb, pooled = self._encode_text(
            self.clip1, self.clip2, self.t5, clip_ids, clip2_ids, t5_ids,
            self.t5 is not None)
        prompt_emb = prompt_emb.astype(self.dtype)
        pooled = pooled.astype(self.dtype)

        h, w = height // self.vae_factor, width // self.vae_factor
        local_w = None
        if local_prompts:
            from goal_force_tpu.pipelines.regional import local_prompt_weights

            local_w = jnp.asarray(local_prompt_weights(
                masks, mask_scales, h, w,
                local_blur_kernel_size, local_blur_sigma))
        noise = jax.random.normal(jax.random.PRNGKey(seed), (1, h, w, 16),
                                  jnp.float32).astype(self.dtype)
        if input_image is not None:
            img = jnp.asarray(np.asarray(input_image, np.float32) * 2.0 - 1.0,
                              jnp.float32)[None]
            enc = lambda c: sd3_vae_encode(self.vae_encoder, c,
                                           self.vae_scaling,
                                           self.vae_enc_plan, self.vae_groups)
            if tiled:
                from goal_force_tpu.models.tiler import tiled_forward_2d

                z = tiled_forward_2d(jax.jit(enc), img,
                                     tile_size * self.vae_factor,
                                     tile_stride * self.vae_factor)
            else:
                z = jax.jit(enc)(img)
            latents = fm.add_noise(z.astype(self.dtype), noise,
                                   schedule.sigmas[0]).astype(self.dtype)
        else:
            latents = noise
        it = range(len(schedule))
        if progress:
            import tqdm

            it = tqdm.tqdm(it)
        for i in it:
            tstep = jnp.full((1,), float(schedule.timesteps[i]), self.dtype)
            latents = self._denoise_step(
                self.dit, latents, tstep, schedule.sigmas[i],
                schedule.sigma_next(i), prompt_emb, pooled, cfg_scale,
                tile_ctx=(tile_size, tile_stride) if tiled else None,
                local_w=local_w)
        if return_latents:
            return np.asarray(latents, np.float32)
        if tiled:
            from goal_force_tpu.models.tiler import tiled_forward_2d

            img = tiled_forward_2d(
                lambda z: self._decode(self.vae_decoder, z),
                latents.astype(jnp.float32), tile_size, tile_stride)
        else:
            img = self._decode(self.vae_decoder, latents.astype(jnp.float32))
        return np.asarray((img[0] + 1.0) / 2.0, np.float32).clip(0.0, 1.0)
