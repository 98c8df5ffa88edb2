"""Kolors text-to-image pipeline: ChatGLM3 text encoder + SDXL UNet variant.

Mirrors the reference's Kolors path through SDXLImagePipeline
(/root/reference/diffsynth/pipelines/sdxl_image.py): when a Kolors UNet is
detected the scheduler becomes EnhancedDDIMScheduler(beta_end=0.014,
num_train_timesteps=1100) (:68) and the text branch is ChatGLM —
hidden_states[-2] as the 4096-dim prompt embedding (projected to 2048 inside the
UNet via text_intermediate_proj) and the last pre-norm token as the 4096-dim
pooled embedding feeding the 5632-wide add embedding
(/root/reference/diffsynth/models/sdxl_unet.py:16,21).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.kolors_text_encoder import (
    ChatGLMConfig,
    chatglm_encode,
    init_chatglm,
)
from goal_force_tpu.models.sdxl_unet import sdxl_unet_apply
from goal_force_tpu.schedulers.ddim import ddim_step, make_ddim_schedule


def tiny_kolors_configs():
    glm_cfg = ChatGLMConfig(hidden_size=32, ffn_hidden_size=48, num_layers=2,
                            num_heads=4, kv_channels=8, kv_groups=2, vocab=96)
    plan = (("res", 8, 8), ("push",), ("down", 8), ("push",),
            ("res", 8, 16), ("attn", 2, 8, 16, 24, 2), ("res", 16, 16),
            ("pop",), ("res", 24, 16), ("attn", 2, 8, 16, 24, 2),
            ("up", 16), ("pop",), ("res", 24, 8))
    return glm_cfg, plan


@dataclasses.dataclass
class KolorsPipeline:
    unet: Dict
    glm: Dict
    vae_encoder: Optional[Dict]
    vae_decoder: Dict
    glm_cfg: ChatGLMConfig
    plan: Tuple
    groups: int = 32
    vae_enc_plan: Tuple = ()
    vae_dec_plan: Tuple = ()
    vae_groups: int = 32
    vae_factor: int = 8
    vae_scaling: float = 0.13025           # SDXL VAE
    tokenize: Optional[Callable] = None
    dtype: object = jnp.bfloat16

    @classmethod
    def from_pretrained(
        cls,
        unet_path,                         # Kolors SDXL-arch UNet (diffsynth)
        text_encoder_path=None,            # ChatGLM3
        vae_encoder_path=None,
        vae_decoder_path=None,
        tokenizer="vendored",              # vendored chatglm spm, len 256
        glm_length: int = 256,
        plan=None,
        groups: int = 32,
        vae_plans=None,
        dtype=jnp.bfloat16,
        glm_num_heads=None,
    ) -> "KolorsPipeline":
        """Kolors 'load weights, generate' (reference ModelManager Kolors rows;
        kolors_prompter.py: ChatGLM3 encode at 256 tokens, left-padded)."""
        from goal_force_tpu.io.auto import load_model
        from goal_force_tpu.models.sd_vae import (
            SD_VAE_DECODER_PLAN,
            SD_VAE_ENCODER_PLAN,
        )
        from goal_force_tpu.models.sdxl_unet import SDXL_PLAN

        to_dev = lambda tree: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), tree)
        plan = plan or SDXL_PLAN
        unet = load_model(unet_path, plan=plan)
        if unet["kind"] != "sdxl_unet":
            raise ValueError(f"{unet_path} detected as {unet['kind']!r}")
        glm_cfg, glm = None, None
        if text_encoder_path is not None:
            r = load_model(text_encoder_path, num_heads=glm_num_heads)
            glm_cfg, glm = r["config"], to_dev(r["params"])
        enc_plan, dec_plan, vgroups = vae_plans or \
            (SD_VAE_ENCODER_PLAN, SD_VAE_DECODER_PLAN, 32)
        vae_enc = vae_dec = None
        if vae_encoder_path is not None:
            vae_enc = to_dev(load_model(vae_encoder_path, plan=enc_plan)["params"])
        if vae_decoder_path is not None:
            vae_dec = to_dev(load_model(vae_decoder_path, plan=dec_plan)["params"])
        tok = tokenizer
        if tokenizer == "vendored":
            from goal_force_tpu.prompters import kolors_tokenizer

            tok = kolors_tokenizer(length=glm_length)
        if glm_cfg is None:
            glm_cfg = tiny_kolors_configs()[0]
            glm = init_chatglm(jax.random.PRNGKey(0), glm_cfg, dtype)
        return cls(unet=to_dev(unet["params"]), glm=glm,
                   vae_encoder=vae_enc, vae_decoder=vae_dec, glm_cfg=glm_cfg,
                   plan=plan, groups=groups, vae_enc_plan=enc_plan,
                   vae_dec_plan=dec_plan, vae_groups=vgroups,
                   tokenize=tok, dtype=dtype)

    @classmethod
    def init_random(cls, key=None, dtype=jnp.float32) -> "KolorsPipeline":
        from goal_force_tpu.models.sdxl_unet import init_sdxl_unet
        from goal_force_tpu.pipelines.sd import _init_tiny_vae

        key = key if key is not None else jax.random.PRNGKey(0)
        glm_cfg, plan = tiny_kolors_configs()
        ks = jax.random.split(key, 4)
        unet = init_sdxl_unet(ks[0], plan, model_dim=8, time_dim=16,
                              add_embed_in=glm_cfg.hidden_size + 6 * 256,
                              dtype=dtype)
        unet["text_intermediate_proj"] = {
            "w": jax.random.normal(ks[1], (glm_cfg.hidden_size, 24), dtype) * 0.02,
            "b": jnp.zeros((24,), dtype),
        }
        vae_e, vae_d, enc_plan, dec_plan = _init_tiny_vae(ks[2], dtype)
        return cls(unet=unet, glm=init_chatglm(ks[3], glm_cfg, dtype),
                   vae_encoder=vae_e, vae_decoder=vae_d, glm_cfg=glm_cfg,
                   plan=plan, groups=4, vae_enc_plan=enc_plan,
                   vae_dec_plan=dec_plan, vae_groups=4, vae_factor=8,
                   dtype=dtype)

    @functools.cached_property
    def _encode_text(self):
        cfg = self.glm_cfg

        @jax.jit
        def fn(glm, ids):
            return chatglm_encode(glm, cfg, ids, clip_skip=2)

        return fn

    @functools.cached_property
    def _denoise_cfg(self):
        plan, groups = self.plan, self.groups

        @jax.jit
        def fn(unet, latents, t, ctx2, pooled2, add_time_id, cfg_scale,
               local_w=None):
            # ctx2/pooled2 rows: [posi, nega, local_1..L] in one merged batch
            b = latents.shape[0]
            n = ctx2.shape[0] // b
            x2 = jnp.concatenate([latents] * n, axis=0)
            eps = sdxl_unet_apply(unet, plan, x2,
                                  jnp.full((n * b,), t, latents.dtype),
                                  ctx2, add_time_id, pooled2, groups=groups)
            e_pos, e_neg = eps[:b], eps[b:2 * b]
            if local_w is not None:
                from goal_force_tpu.pipelines.regional import (
                    blend_local_predictions,
                )

                e_pos = blend_local_predictions(e_pos, eps[2 * b:], local_w)
            return e_neg + cfg_scale * (e_pos - e_neg)

        return fn

    def _ids(self, prompts):
        from goal_force_tpu.pipelines.flux import _hash_ids

        ids = np.stack([
            np.asarray(self.tokenize(p)) if self.tokenize
            else _hash_ids(p, self.glm_cfg.vocab, 32) for p in prompts])
        return jnp.asarray(ids, jnp.int32)

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 7.5,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 20,
        seed: int = 0,
        input_image: Optional[np.ndarray] = None,    # (H, W, 3) in [0, 1]
        denoising_strength: float = 1.0,
        local_prompts=None,
        masks=None,
        mask_scales=None,
        local_blur_kernel_size: int = 33,
        local_blur_sigma: float = 10.0,
        tiled: bool = False,
        tile_size: int = 64,
        tile_stride: int = 32,
        progress: bool = False,
        return_latents: bool = False,
    ) -> np.ndarray:
        # Kolors rides the reference SDXLImagePipeline, so its full surface
        # applies: i2i (sdxl_image.py:139-146), regional prompting (:94,168,
        # 215), tiled VAE (:131-141).
        from goal_force_tpu.models.sd_vae import sd_vae_decode, sd_vae_encode
        from goal_force_tpu.schedulers.ddim import ddim_add_noise

        schedule = make_ddim_schedule(num_inference_steps, beta_end=0.014,
                                      num_train_timesteps=1100,
                                      denoising_strength=denoising_strength
                                      if input_image is not None else 1.0)
        local_prompts = list(local_prompts or [])
        ids = self._ids([prompt, negative_prompt] + local_prompts)
        ctx2, pooled2 = self._encode_text(self.glm, ids)
        ctx2 = ctx2.astype(self.dtype)
        pooled2 = pooled2.astype(self.dtype)

        h, w = height // self.vae_factor, width // self.vae_factor
        local_w = None
        if local_prompts:
            from goal_force_tpu.pipelines.regional import local_prompt_weights

            local_w = jnp.asarray(local_prompt_weights(
                masks, mask_scales, h, w,
                local_blur_kernel_size, local_blur_sigma))
        noise = jax.random.normal(jax.random.PRNGKey(seed), (1, h, w, 4),
                                  jnp.float32).astype(self.dtype)
        if input_image is not None:
            enc = lambda c: sd_vae_encode(self.vae_encoder, c,
                                          self.vae_enc_plan,
                                          groups=self.vae_groups,
                                          scaling=self.vae_scaling)
            img = jnp.asarray(np.asarray(input_image, np.float32)
                              * 2.0 - 1.0)[None]
            if tiled:
                from goal_force_tpu.models.tiler import tiled_forward_2d

                z = tiled_forward_2d(jax.jit(enc), img,
                                     tile_size * self.vae_factor,
                                     tile_stride * self.vae_factor)
            else:
                z = enc(img)
            latents = ddim_add_noise(schedule, z.astype(self.dtype), noise,
                                     int(schedule.timesteps[0])) \
                .astype(self.dtype)
        else:
            latents = noise
        add_time_id = jnp.tile(
            jnp.asarray([height, width, 0, 0, height, width], jnp.float32),
            2 + len(local_prompts))

        it = range(len(schedule))
        if progress:
            import tqdm

            it = tqdm.tqdm(it)
        for i in it:
            eps = self._denoise_cfg(self.unet, latents,
                                    float(schedule.timesteps[i]), ctx2, pooled2,
                                    add_time_id, cfg_scale, local_w=local_w)
            latents = ddim_step(schedule, eps.astype(latents.dtype), i, latents)
        if return_latents:
            return np.asarray(latents, np.float32)
        dec = lambda z: sd_vae_decode(self.vae_decoder, z, self.vae_dec_plan,
                                      groups=self.vae_groups,
                                      scaling=self.vae_scaling)
        if tiled:
            from goal_force_tpu.models.tiler import tiled_forward_2d

            img = tiled_forward_2d(jax.jit(dec),
                                   latents.astype(jnp.float32),
                                   min(tile_size, h, w), tile_stride)
        else:
            img = dec(latents.astype(jnp.float32))
        return np.asarray((img[0] + 1.0) / 2.0, np.float32).clip(0.0, 1.0)
