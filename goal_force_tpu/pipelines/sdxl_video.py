"""SDXL/AnimateDiff-XL text-to-video pipeline.

Mirrors /root/reference/diffsynth/pipelines/sdxl_video.py: the SDXL UNet run
over all frames with SDXL AnimateDiff temporal modules applied after the
mapped blocks, EnhancedDDIM with linear betas, size conditioning, CFG.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.sd_motion import init_motion_modules
from goal_force_tpu.models.sdxl_unet import sdxl_unet_apply
from goal_force_tpu.schedulers.ddim import ddim_step, make_ddim_schedule


@dataclasses.dataclass
class SDXLVideoPipeline:
    unet: Dict
    motion: Optional[Dict]
    text_encoder: Dict
    text_encoder_2: Dict
    vae_decoder: Dict
    plan: Tuple
    text_cfg: object
    text2_cfg: object
    groups: int = 32
    vae_dec_plan: Tuple = ()
    vae_groups: int = 32
    dtype: object = jnp.float32
    tokenize: object = None      # CLIP-L tokenizer; hash fallback when unset
    tokenize_2: object = None    # CLIP-G tokenizer

    @classmethod
    def from_pretrained(cls, unet_path, motion_path=None, dtype=jnp.float32,
                        motion_call_map=None, **sdxl_kwargs) -> "SDXLVideoPipeline":
        """SDXL AnimateDiff load: SDXLPipeline.from_pretrained components +
        the temporal motion modules (reference ModelManager SDXL motion rows).
        sdxl_kwargs forward to SDXLPipeline.from_pretrained."""
        from goal_force_tpu.io.auto import load_model
        from goal_force_tpu.models.sd_motion import SDXL_MOTION_CALL
        from goal_force_tpu.pipelines.sdxl import SDXLPipeline

        base = SDXLPipeline.from_pretrained(unet_path, dtype=dtype,
                                            **sdxl_kwargs)
        motion = None
        if motion_path is not None:
            motion = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, dtype),
                load_model(motion_path,
                           call_map=motion_call_map or SDXL_MOTION_CALL)["params"])
        return cls(unet=base.unet, motion=motion,
                   text_encoder=base.text_encoder,
                   text_encoder_2=base.text_encoder_2,
                   vae_decoder=base.vae_decoder, plan=base.plan,
                   text_cfg=base.text_cfg, text2_cfg=base.text2_cfg,
                   groups=base.groups, vae_dec_plan=base.vae_dec_plan,
                   vae_groups=base.vae_groups, dtype=dtype,
                   tokenize=base.tokenize, tokenize_2=base.tokenize_2)

    @classmethod
    def init_random(cls, key=None, dtype=jnp.float32) -> "SDXLVideoPipeline":
        from goal_force_tpu.pipelines.sdxl import SDXLPipeline

        base = SDXLPipeline.init_random(key, dtype=dtype)
        attn_ids = [i for i, s in enumerate(base.plan) if s[0] == "attn"]
        call = {pi: j for j, pi in enumerate(attn_ids)}
        channels = [base.plan[pi][3] for pi in attn_ids]
        motion = init_motion_modules(jax.random.PRNGKey(7), channels, call,
                                     heads=2, dtype=dtype)
        return cls(unet=base.unet, motion=motion,
                   text_encoder=base.text_encoder,
                   text_encoder_2=base.text_encoder_2,
                   vae_decoder=base.vae_decoder, plan=base.plan,
                   text_cfg=base.text_cfg, text2_cfg=base.text2_cfg,
                   groups=base.groups, vae_dec_plan=base.vae_dec_plan,
                   vae_groups=base.vae_groups, dtype=dtype)

    @functools.cached_property
    def _denoise(self):
        plan, groups = self.plan, self.groups
        motion = self.motion

        @functools.partial(jax.jit, static_argnames=("cross_frame",))
        def fn(unet, latents, t, ctx, add_time_id, pooled, cn_res=None,
               cross_frame=False):
            f = latents.shape[0]
            return sdxl_unet_apply(
                unet, plan, latents, jnp.full((f,), t, latents.dtype),
                jnp.broadcast_to(ctx, (f,) + ctx.shape[1:]),
                add_time_id,
                jnp.broadcast_to(pooled, (f,) + pooled.shape[1:]),
                groups=groups, motion=motion, video_batch=1,
                controlnet_res=cn_res, cross_frame_attention=cross_frame)

        return fn

    def _encode(self, prompt):
        from goal_force_tpu.models.sd_text_encoder import (sdxl_text_encode,
                                                           sdxl_text2_encode)
        from goal_force_tpu.pipelines.flux import _hash_ids

        if self.tokenize is not None:
            ids1 = jnp.asarray(np.asarray(self.tokenize(prompt))
                               .reshape(1, -1).astype(np.int32))
            tok2 = self.tokenize_2 or self.tokenize
            ids2 = jnp.asarray(np.asarray(tok2(prompt))
                               .reshape(1, -1).astype(np.int32))
        else:
            ids1 = jnp.asarray(
                _hash_ids(prompt, self.text_cfg.vocab_size, 8)[None], jnp.int32)
            ids2 = jnp.asarray(
                _hash_ids(prompt, self.text2_cfg.vocab_size, 8)[None], jnp.int32)
        # clip_skip 1 (CLIP-L) / 2 (CLIP-G) — reference sdxl_video.py:102 with
        # the SDXLPrompter defaults (sdxl_prompter.py:36-49)
        h1 = sdxl_text_encode(self.text_encoder, ids1, self.text_cfg, 1)
        pooled, h2 = sdxl_text2_encode(self.text_encoder_2, ids2,
                                       self.text2_cfg, 2)
        return (jnp.concatenate([h1, h2], axis=-1).astype(self.dtype),
                pooled.astype(self.dtype))

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 7.5,
        num_frames: int = 16,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 20,
        seed: int = 0,
        cross_frame_attention: bool = False,
        controlnet: Optional[Dict] = None,      # {"params", "plan"(opt), "task_id"(opt)}
        controlnet_frames: Optional[np.ndarray] = None,  # (F, 8h, 8w, 3) [0,1]
        tiled: bool = False,
        tile_size: int = 64,
        tile_stride: int = 32,
        return_latents: bool = False,
    ) -> np.ndarray:
        """lets_dance_xl parity (reference dancer.py:119-245): per-frame
        ControlNet residuals injected into the skip stack each step, optional
        cross-frame self-attention over the whole clip.

        tiled: spatially tiled VAE decode, latent-unit tile_size (reference
        sdxl_video.py:78-84 decode_video -> sd_vae_decoder tiled_forward)."""
        from goal_force_tpu.models.sd_vae import (SDXL_SCALING_FACTOR,
                                                  sd_vae_decode)

        schedule = make_ddim_schedule(num_inference_steps,
                                      beta_schedule="linear")
        ctx_p, pool_p = self._encode(prompt)
        ctx_n, pool_n = self._encode(negative_prompt)
        add_id = jnp.tile(jnp.asarray(
            [height, width, 0, 0, height, width], jnp.float32), num_frames)

        latents = jax.random.normal(jax.random.PRNGKey(seed),
                                    (num_frames, height // 8, width // 8, 4),
                                    jnp.float32).astype(self.dtype)

        cn_fn = None
        if controlnet is not None and controlnet_frames is not None:
            from goal_force_tpu.models.sd_controlnet import (
                sdxl_controlnet_apply,
            )

            cn_params = controlnet["params"]
            task_id = controlnet.get("task_id", 3)
            cn_kwargs = {} if controlnet.get("plan") is None \
                else {"plan": controlnet["plan"]}
            cond = jnp.asarray(controlnet_frames, jnp.float32).astype(self.dtype)

            @jax.jit
            def cn_fn(lat, t, ctx, pooled):
                f = lat.shape[0]
                return sdxl_controlnet_apply(
                    cn_params, lat, jnp.full((f,), t, lat.dtype),
                    jnp.broadcast_to(ctx, (f,) + ctx.shape[1:]), cond, add_id,
                    jnp.broadcast_to(pooled, (f,) + pooled.shape[1:]),
                    task_id=task_id, groups=self.groups, **cn_kwargs)

        for i in range(len(schedule)):
            t = float(schedule.timesteps[i])
            res_p = cn_fn(latents, t, ctx_p, pool_p) if cn_fn is not None \
                else None
            res_n = cn_fn(latents, t, ctx_n, pool_n) if cn_fn is not None \
                else None
            e_p = self._denoise(self.unet, latents, t, ctx_p, add_id, pool_p,
                                res_p, cross_frame=cross_frame_attention)
            e_n = self._denoise(self.unet, latents, t, ctx_n, add_id, pool_n,
                                res_n, cross_frame=cross_frame_attention)
            eps = e_n + cfg_scale * (e_p - e_n)
            latents = ddim_step(schedule, eps.astype(latents.dtype), i, latents)
        if return_latents:
            return np.asarray(latents, np.float32)
        dec = lambda z: sd_vae_decode(self.vae_decoder, z, self.vae_dec_plan,
                                      groups=self.vae_groups,
                                      scaling=SDXL_SCALING_FACTOR)
        if tiled:
            from goal_force_tpu.models.tiler import tiled_forward_2d

            video = tiled_forward_2d(
                jax.jit(dec), latents.astype(jnp.float32),
                min(tile_size, height // 8, width // 8), tile_stride)
        else:
            video = dec(latents.astype(jnp.float32))
        return np.asarray((video + 1.0) / 2.0, np.float32).clip(0.0, 1.0)
