"""SD/AnimateDiff text-to-video pipeline.

Mirrors /root/reference/diffsynth/pipelines/sd_video.py: the SD-1.5 UNet run
over all frames with AnimateDiff temporal modules applied after the mapped
blocks (dancer.py via sd_unet_apply's motion hooks), EnhancedDDIM with LINEAR
betas for original AnimateDiff (:70-72), CFG, per-frame VAE decode.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.sd_motion import SD_MOTION_CALL, init_motion_modules
from goal_force_tpu.models.sd_unet import sd_unet_apply, tiny_sd_plan
from goal_force_tpu.schedulers.ddim import ddim_step, make_ddim_schedule


@dataclasses.dataclass
class SDVideoPipeline:
    unet: Dict
    motion: Optional[Dict]
    text_encoder: Dict
    vae_decoder: Dict
    plan: Tuple
    text_cfg: object
    vae_encoder: Optional[Dict] = None
    vae_enc_plan: Tuple = ()
    groups: int = 32
    vae_dec_plan: Tuple = ()
    vae_groups: int = 32
    tokenize: Optional[Callable] = None
    dtype: object = jnp.float32

    @classmethod
    def from_pretrained(
        cls,
        unet_path,
        motion_path=None,                  # AnimateDiff temporal modules
        text_encoder_path=None,
        vae_decoder_path=None,
        vae_encoder_path=None,
        tokenizer="vendored",
        plan=None,
        groups: int = 32,
        vae_dec_plan=None,
        vae_groups: int = 32,
        dtype=jnp.float32,
        clip_num_heads=None,
        motion_call_map=None,
    ) -> "SDVideoPipeline":
        """AnimateDiff 'load weights, generate' (reference ModelManager SD +
        SDMotionModel rows; sd tokenizer assets)."""
        from goal_force_tpu.io.auto import load_model
        from goal_force_tpu.models.sd_unet import SD15_PLAN
        from goal_force_tpu.models.sd_vae import SD_VAE_DECODER_PLAN

        to_dev = lambda tree: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), tree)
        plan = plan or SD15_PLAN
        unet = load_model(unet_path, plan=plan)
        motion = None
        if motion_path is not None:
            motion = to_dev(load_model(
                motion_path, call_map=motion_call_map)["params"])
        text_cfg, text = None, None
        if text_encoder_path is not None:
            r = load_model(text_encoder_path, num_heads=clip_num_heads)
            text_cfg, text = r["config"], to_dev(r["params"])
        dec_plan = vae_dec_plan or SD_VAE_DECODER_PLAN
        vae_dec = vae_enc = None
        enc_plan = ()
        if vae_decoder_path is not None:
            vae_dec = to_dev(load_model(vae_decoder_path, plan=dec_plan)["params"])
        if vae_encoder_path is not None:
            from goal_force_tpu.models.sd_vae import SD_VAE_ENCODER_PLAN

            enc_plan = SD_VAE_ENCODER_PLAN
            vae_enc = to_dev(load_model(vae_encoder_path,
                                        plan=enc_plan)["params"])
        tok = tokenizer
        if tokenizer == "vendored":
            from goal_force_tpu.prompters import sd_clip_tokenizer

            tok = sd_clip_tokenizer()
        if text is None:
            from goal_force_tpu.models.clip import init_clip
            from goal_force_tpu.models.sd_text_encoder import SD_TEXT_CONFIG

            text_cfg = SD_TEXT_CONFIG
            text = {"text": init_clip(jax.random.PRNGKey(0), text_cfg,
                                      dtype)["text"]}
        return cls(unet=to_dev(unet["params"]), motion=motion,
                   text_encoder=text, vae_decoder=vae_dec,
                   vae_encoder=vae_enc, vae_enc_plan=enc_plan,
                   plan=plan, text_cfg=text_cfg, groups=groups,
                   vae_dec_plan=dec_plan, vae_groups=vae_groups,
                   tokenize=tok, dtype=dtype)

    @classmethod
    def init_random(cls, key=None, dtype=jnp.float32) -> "SDVideoPipeline":
        from goal_force_tpu.models.clip import CLIPConfig, init_clip
        from goal_force_tpu.models.sd_unet import init_sd_unet
        from goal_force_tpu.pipelines.sd import _init_tiny_vae

        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        plan = tiny_sd_plan(ctx_dim=24)
        unet = init_sd_unet(ks[0], plan, model_dim=8, time_dim=16, dtype=dtype)
        # temporal modules after each attn block of the tiny plan
        attn_ids = [i for i, s in enumerate(plan) if s[0] == "attn"]
        call = {pi: j for j, pi in enumerate(attn_ids)}
        channels = [plan[pi][3] for pi in attn_ids]
        motion = init_motion_modules(ks[1], channels, call, heads=2,
                                     dtype=dtype)
        tcfg = CLIPConfig(vocab_size=64, text_dim=24, text_heads=2,
                          text_layers=2, max_positions=12, image_size=14,
                          patch_size=7, vision_dim=16, vision_heads=2,
                          vision_layers=1, proj_dim=8)
        te = init_clip(ks[2], tcfg, dtype)
        vae_e, vae_d, enc_plan, dec_plan = _init_tiny_vae(ks[3], dtype)
        return cls(unet=unet, motion=motion, text_encoder=te,
                   vae_decoder=vae_d, vae_encoder=vae_e,
                   vae_enc_plan=enc_plan, plan=plan, text_cfg=tcfg, groups=4,
                   vae_dec_plan=dec_plan, vae_groups=4, dtype=dtype)

    @functools.cached_property
    def _denoise(self):
        plan, groups = self.plan, self.groups
        motion = self.motion  # closed over: its call map holds static indices

        @functools.partial(jax.jit, static_argnames=("cross_frame",))
        def fn(unet, latents, t, ctx, cn_res=None, cross_frame=False,
               ip=None):
            return sd_unet_apply(unet, plan, latents,
                                 jnp.full((latents.shape[0],), t,
                                          latents.dtype),
                                 jnp.broadcast_to(
                                     ctx, (latents.shape[0],) + ctx.shape[1:]),
                                 groups=groups, motion=motion, video_batch=1,
                                 controlnet_res=cn_res, ipadapter=ip,
                                 cross_frame_attention=cross_frame)

        return fn

    def _encode_text(self, prompt):
        from goal_force_tpu.models.sd_text_encoder import sd_text_encode
        from goal_force_tpu.pipelines.flux import _hash_ids

        ids = _hash_ids(prompt, self.text_cfg.vocab_size, 8)[None] \
            if self.tokenize is None else np.asarray(self.tokenize(prompt))[None]
        hidden = sd_text_encode(self.text_encoder, jnp.asarray(ids, jnp.int32),
                                self.text_cfg, 1)
        return hidden.astype(self.dtype)

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 7.5,
        num_frames: int = 16,
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 20,
        seed: int = 0,
        use_original_animatediff: bool = True,
        cross_frame_attention: bool = False,
        controlnet: Optional[Dict] = None,      # {"params", "plan"(opt)}
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
        smoother: Optional[Callable] = None,
        smoother_progress_ids=(),
        tiled: bool = False,
        tile_size: int = 64,
        tile_stride: int = 32,
        return_latents: bool = False,
    ) -> np.ndarray:
        """dancer.py parity: per-frame ControlNet residual stacks injected into
        the UNet skip stack each step (reference dancer.py:33-60,104-110) and
        optional cross-frame self-attention over the whole clip (:88).

        tiled: spatially tiled VAE decode, latent-unit tile_size (reference
        sd_video.py:125-131 decode_video -> sd_vae_decoder.py tiled_forward).
        input_frames + denoising_strength: v2v (:192-200). When num_frames >
        animatediff_batch_size, the UNet runs over sliding frame windows
        blended with the triangular bias (lets_dance_with_long_video :14-59).
        smoother(frames01, original_frames=...) runs mid-loop at the listed
        progress ids via to_final + return_to_timestep (:249-255, -1 or
        num_inference_steps = after the loop :266-267). unet_batch_size /
        controlnet_batch_size are VRAM knobs in the reference; outputs don't
        depend on them, so they are accepted and ignored."""
        from goal_force_tpu.models.sd_vae import sd_vae_decode, sd_vae_encode
        from goal_force_tpu.schedulers.ddim import (
            ddim_add_noise,
            ddim_return_to_timestep,
        )

        schedule = make_ddim_schedule(
            num_inference_steps,
            beta_schedule="linear" if use_original_animatediff
            else "scaled_linear",
            denoising_strength=denoising_strength
            if input_frames is not None else 1.0)
        ctx_p = self._encode_text(prompt)
        ctx_n = self._encode_text(negative_prompt)

        h, w = height // 8, width // 8
        noise = jax.random.normal(jax.random.PRNGKey(seed),
                                  (num_frames, h, w, 4),
                                  jnp.float32).astype(self.dtype)
        enc = lambda f01: sd_vae_encode(
            self.vae_encoder,
            jnp.asarray(np.asarray(f01, np.float32) * 2.0 - 1.0, self.dtype),
            self.vae_enc_plan, groups=self.vae_groups)
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
        if controlnet is not None and controlnet_frames is not None:
            from goal_force_tpu.models.sd_controlnet import sd_controlnet_apply

            cn_params = controlnet["params"]
            cn_plan = controlnet.get("plan")
            cond_all = jnp.asarray(controlnet_frames,
                                   jnp.float32).astype(self.dtype)
            cn_kwargs = {} if cn_plan is None else {"plan": cn_plan}

            @jax.jit
            def cn_fn(lat, t, ctx, cond):
                return sd_controlnet_apply(
                    cn_params, lat, jnp.full((lat.shape[0],), t, lat.dtype),
                    jnp.broadcast_to(ctx, (lat.shape[0],) + ctx.shape[1:]),
                    cond, groups=self.groups, **cn_kwargs)

        def eps_for(lat, t, ctx):
            cond = cond_all if cn_fn is not None else None
            if num_frames <= animatediff_batch_size:
                res = cn_fn(lat, t, ctx, cond) if cn_fn is not None else None
                return self._denoise(self.unet, lat, t, ctx, res,
                                     cross_frame=cross_frame_attention,
                                     ip=ip_kwargs)
            # sliding windows with triangular bias blending
            # (lets_dance_with_long_video :36-59)
            value = jnp.zeros(lat.shape, jnp.float32)
            weight = jnp.zeros((num_frames, 1, 1, 1), jnp.float32)
            for b0 in range(0, num_frames, animatediff_stride):
                b1 = min(b0 + animatediff_batch_size, num_frames)
                lat_s = lat[b0:b1]
                res = cn_fn(lat_s, t, ctx, cond[:, b0:b1]) \
                    if cn_fn is not None else None
                e = self._denoise(self.unet, lat_s, t, ctx, res,
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
                                      groups=self.vae_groups)

        def decode(z):
            if tiled:
                from goal_force_tpu.models.tiler import tiled_forward_2d

                return tiled_forward_2d(jax.jit(dec), z.astype(jnp.float32),
                                        min(tile_size, h, w), tile_stride)
            return dec(z.astype(jnp.float32))

        smoother_progress_ids = list(smoother_progress_ids or ())
        for i in range(len(schedule)):
            t = float(schedule.timesteps[i])
            e_p = eps_for(latents, t, ctx_p)
            e_n = eps_for(latents, t, ctx_n)
            eps = e_n + cfg_scale * (e_p - e_n)
            if smoother is not None and i in smoother_progress_ids:
                # to_final render -> smoother -> return_to_timestep (:249-255)
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
        video = decode(latents)
        out = np.asarray((np.asarray(video, np.float32) + 1.0) / 2.0) \
            .clip(0.0, 1.0)
        if smoother is not None and (num_inference_steps in
                                     smoother_progress_ids
                                     or -1 in smoother_progress_ids):
            out = smoother(out, original_frames=input_frames)
        return out
