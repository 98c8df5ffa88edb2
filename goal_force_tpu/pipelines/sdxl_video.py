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
    vae_encoder: Optional[Dict] = None
    vae_enc_plan: Tuple = ()
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
                   vae_encoder=base.vae_encoder,
                   vae_enc_plan=base.vae_enc_plan,
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
        from goal_force_tpu.pipelines.sd import _init_tiny_vae

        enc, _, enc_plan, _ = _init_tiny_vae(jax.random.PRNGKey(9), dtype)
        return cls(unet=base.unet, motion=motion,
                   text_encoder=base.text_encoder,
                   text_encoder_2=base.text_encoder_2,
                   vae_decoder=base.vae_decoder, plan=base.plan,
                   text_cfg=base.text_cfg, text2_cfg=base.text2_cfg,
                   vae_encoder=enc, vae_enc_plan=enc_plan,
                   groups=base.groups, vae_dec_plan=base.vae_dec_plan,
                   vae_groups=base.vae_groups, dtype=dtype)

    @functools.cached_property
    def _denoise(self):
        plan, groups = self.plan, self.groups
        motion = self.motion

        @functools.partial(jax.jit, static_argnames=("cross_frame",))
        def fn(unet, latents, t, ctx, add_time_id, pooled, cn_res=None,
               cross_frame=False, ip=None):
            f = latents.shape[0]
            return sdxl_unet_apply(
                unet, plan, latents, jnp.full((f,), t, latents.dtype),
                jnp.broadcast_to(ctx, (f,) + ctx.shape[1:]),
                add_time_id,
                jnp.broadcast_to(pooled, (f,) + pooled.shape[1:]),
                groups=groups, motion=motion, video_batch=1, ipadapter=ip,
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
        input_frames: Optional[np.ndarray] = None,       # (F, H, W, 3) [0,1]
        denoising_strength: float = 1.0,
        ipadapter: Optional[Dict] = None,
        ipadapter_image_emb: Optional[np.ndarray] = None,
        ipadapter_scale: float = 1.0,
        animatediff_batch_size: int = 16,
        animatediff_stride: int = 8,
        unet_batch_size: int = 1,               # accepted for API parity;
        controlnet_batch_size: int = 1,         # XLA batches on device
        smoother=None,
        smoother_progress_ids=(),
        tiled: bool = False,
        tile_size: int = 64,
        tile_stride: int = 32,
        return_latents: bool = False,
    ) -> np.ndarray:
        """lets_dance_xl parity (reference dancer.py:119-245): per-frame
        ControlNet residuals injected into the skip stack each step, optional
        cross-frame self-attention over the whole clip.

        tiled: spatially tiled VAE decode, latent-unit tile_size (reference
        sdxl_video.py:78-84 decode_video -> sd_vae_decoder tiled_forward).
        input_frames + denoising_strength: v2v; sliding-window/smoother
        semantics as pipelines/sd_video.py (reference sdxl_video.py shares the
        sd_video loop structure :150-260)."""
        from goal_force_tpu.models.sd_vae import (SDXL_SCALING_FACTOR,
                                                  sd_vae_decode,
                                                  sd_vae_encode)
        from goal_force_tpu.schedulers.ddim import (
            ddim_add_noise,
            ddim_return_to_timestep,
        )

        schedule = make_ddim_schedule(num_inference_steps,
                                      beta_schedule="linear",
                                      denoising_strength=denoising_strength
                                      if input_frames is not None else 1.0)
        ctx_p, pool_p = self._encode(prompt)
        ctx_n, pool_n = self._encode(negative_prompt)
        add_one = jnp.asarray([height, width, 0, 0, height, width],
                              jnp.float32)

        h, w = height // 8, width // 8
        noise = jax.random.normal(jax.random.PRNGKey(seed),
                                  (num_frames, h, w, 4),
                                  jnp.float32).astype(self.dtype)
        enc = lambda f01: sd_vae_encode(
            self.vae_encoder,
            jnp.asarray(np.asarray(f01, np.float32) * 2.0 - 1.0, self.dtype),
            self.vae_enc_plan, groups=self.vae_groups,
            scaling=SDXL_SCALING_FACTOR)
        if input_frames is not None:
            z = enc(input_frames)
            latents = ddim_add_noise(schedule, z, noise,
                                     int(schedule.timesteps[0])) \
                .astype(self.dtype)
        else:
            latents = noise

        ip_kwargs = None
        if ipadapter is not None and ipadapter_image_emb is not None:
            from goal_force_tpu.models.ipadapter import (
                ipadapter_kwargs_for_plan,
            )

            ip_kwargs = ipadapter_kwargs_for_plan(
                self.plan, ipadapter, jnp.asarray(ipadapter_image_emb),
                scale=ipadapter_scale)

        cn_fn = None
        cond_all = None
        if controlnet is not None and controlnet_frames is not None:
            from goal_force_tpu.models.sd_controlnet import (
                sdxl_controlnet_apply,
            )

            cn_params = controlnet["params"]
            task_id = controlnet.get("task_id", 3)
            cn_kwargs = {} if controlnet.get("plan") is None \
                else {"plan": controlnet["plan"]}
            cond_all = jnp.asarray(controlnet_frames,
                                   jnp.float32).astype(self.dtype)

            @jax.jit
            def cn_fn(lat, t, ctx, pooled, cond):
                f = lat.shape[0]
                return sdxl_controlnet_apply(
                    cn_params, lat, jnp.full((f,), t, lat.dtype),
                    jnp.broadcast_to(ctx, (f,) + ctx.shape[1:]), cond,
                    jnp.tile(add_one, f),
                    jnp.broadcast_to(pooled, (f,) + pooled.shape[1:]),
                    task_id=task_id, groups=self.groups, **cn_kwargs)

        def eps_for(lat, t, ctx, pooled):
            if num_frames <= animatediff_batch_size:
                res = cn_fn(lat, t, ctx, pooled, cond_all) \
                    if cn_fn is not None else None
                return self._denoise(self.unet, lat, t, ctx,
                                     jnp.tile(add_one, lat.shape[0]),
                                     pooled, res,
                                     cross_frame=cross_frame_attention,
                                     ip=ip_kwargs)
            value = jnp.zeros(lat.shape, jnp.float32)
            weight = jnp.zeros((num_frames, 1, 1, 1), jnp.float32)
            for b0 in range(0, num_frames, animatediff_stride):
                b1 = min(b0 + animatediff_batch_size, num_frames)
                lat_s = lat[b0:b1]
                res = cn_fn(lat_s, t, ctx, pooled, cond_all[:, b0:b1]) \
                    if cn_fn is not None else None
                e = self._denoise(self.unet, lat_s, t, ctx,
                                  jnp.tile(add_one, b1 - b0), pooled, res,
                                  cross_frame=cross_frame_attention,
                                  ip=ip_kwargs).astype(jnp.float32)
                idx = np.arange(b0, b1, dtype=np.float32)
                bias = np.maximum(
                    1 - np.abs(idx - (b0 + b1 - 1) / 2)
                    / ((b1 - b0 - 1 + 1e-2) / 2), 1e-2)
                bias = jnp.asarray(bias)[:, None, None, None]
                value = value.at[b0:b1].add(e * bias)
                weight = weight.at[b0:b1].add(bias)
                if b1 == num_frames:
                    break
            return (value / weight).astype(lat.dtype)

        dec = lambda z: sd_vae_decode(self.vae_decoder, z, self.vae_dec_plan,
                                      groups=self.vae_groups,
                                      scaling=SDXL_SCALING_FACTOR)

        def decode(z):
            if tiled:
                from goal_force_tpu.models.tiler import tiled_forward_2d

                return tiled_forward_2d(jax.jit(dec), z.astype(jnp.float32),
                                        min(tile_size, h, w), tile_stride)
            return dec(z.astype(jnp.float32))

        smoother_progress_ids = list(smoother_progress_ids or ())
        for i in range(len(schedule)):
            t = float(schedule.timesteps[i])
            e_p = eps_for(latents, t, ctx_p, pool_p)
            e_n = eps_for(latents, t, ctx_n, pool_n)
            eps = e_n + cfg_scale * (e_p - e_n)
            if smoother is not None and i in smoother_progress_ids:
                x0 = ddim_step(schedule, eps.astype(latents.dtype), i,
                               latents, to_final=True)
                frames01 = np.asarray((np.asarray(decode(x0), np.float32)
                                       + 1.0) / 2.0).clip(0.0, 1.0)
                frames01 = smoother(frames01, original_frames=input_frames)
                target = enc(frames01)
                eps = ddim_return_to_timestep(schedule, i, latents,
                                              target.astype(latents.dtype))
            latents = ddim_step(schedule, eps.astype(latents.dtype), i, latents)
        if return_latents:
            return np.asarray(latents, np.float32)
        out = np.asarray((np.asarray(decode(latents), np.float32) + 1.0)
                         / 2.0).clip(0.0, 1.0)
        if smoother is not None and (num_inference_steps in
                                     smoother_progress_ids
                                     or -1 in smoother_progress_ids):
            out = smoother(out, original_frames=input_frames)
        return out
