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
        vae_dec = None
        if vae_decoder_path is not None:
            vae_dec = to_dev(load_model(vae_decoder_path, plan=dec_plan)["params"])
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
        _, vae_d, _, dec_plan = _init_tiny_vae(ks[3], dtype)
        return cls(unet=unet, motion=motion, text_encoder=te,
                   vae_decoder=vae_d, plan=plan, text_cfg=tcfg, groups=4,
                   vae_dec_plan=dec_plan, vae_groups=4, dtype=dtype)

    @functools.cached_property
    def _denoise(self):
        plan, groups = self.plan, self.groups
        motion = self.motion  # closed over: its call map holds static indices

        @functools.partial(jax.jit, static_argnames=("cross_frame",))
        def fn(unet, latents, t, ctx, cn_res=None, cross_frame=False):
            return sd_unet_apply(unet, plan, latents,
                                 jnp.full((latents.shape[0],), t,
                                          latents.dtype),
                                 jnp.broadcast_to(
                                     ctx, (latents.shape[0],) + ctx.shape[1:]),
                                 groups=groups, motion=motion, video_batch=1,
                                 controlnet_res=cn_res,
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
        tiled: bool = False,
        tile_size: int = 64,
        tile_stride: int = 32,
        return_latents: bool = False,
    ) -> np.ndarray:
        """dancer.py parity: per-frame ControlNet residual stacks injected into
        the UNet skip stack each step (reference dancer.py:33-60,104-110) and
        optional cross-frame self-attention over the whole clip (:88).

        tiled: spatially tiled VAE decode, latent-unit tile_size (reference
        sd_video.py:125-131 decode_video -> sd_vae_decoder.py tiled_forward)."""
        from goal_force_tpu.models.sd_vae import sd_vae_decode

        schedule = make_ddim_schedule(
            num_inference_steps,
            beta_schedule="linear" if use_original_animatediff
            else "scaled_linear")
        ctx_p = self._encode_text(prompt)
        ctx_n = self._encode_text(negative_prompt)

        h, w = height // 8, width // 8
        latents = jax.random.normal(jax.random.PRNGKey(seed),
                                    (num_frames, h, w, 4),
                                    jnp.float32).astype(self.dtype)

        cn_fn = None
        if controlnet is not None and controlnet_frames is not None:
            from goal_force_tpu.models.sd_controlnet import sd_controlnet_apply

            cn_params = controlnet["params"]
            cn_plan = controlnet.get("plan")
            cond = jnp.asarray(controlnet_frames, jnp.float32).astype(self.dtype)
            cn_kwargs = {} if cn_plan is None else {"plan": cn_plan}

            @jax.jit
            def cn_fn(lat, t, ctx):
                return sd_controlnet_apply(
                    cn_params, lat, jnp.full((lat.shape[0],), t, lat.dtype),
                    jnp.broadcast_to(ctx, (lat.shape[0],) + ctx.shape[1:]),
                    cond, groups=self.groups, **cn_kwargs)

        for i in range(len(schedule)):
            t = float(schedule.timesteps[i])
            res_p = cn_fn(latents, t, ctx_p) if cn_fn is not None else None
            res_n = cn_fn(latents, t, ctx_n) if cn_fn is not None else None
            e_p = self._denoise(self.unet, latents, t, ctx_p, res_p,
                                cross_frame=cross_frame_attention)
            e_n = self._denoise(self.unet, latents, t, ctx_n, res_n,
                                cross_frame=cross_frame_attention)
            eps = e_n + cfg_scale * (e_p - e_n)
            latents = ddim_step(schedule, eps.astype(latents.dtype), i, latents)
        if return_latents:
            return np.asarray(latents, np.float32)
        dec = lambda z: sd_vae_decode(self.vae_decoder, z, self.vae_dec_plan,
                                      groups=self.vae_groups)
        if tiled:
            from goal_force_tpu.models.tiler import tiled_forward_2d

            video = tiled_forward_2d(jax.jit(dec),
                                     latents.astype(jnp.float32),
                                     min(tile_size, h, w), tile_stride)
        else:
            video = dec(latents.astype(jnp.float32))
        return np.asarray((video + 1.0) / 2.0, np.float32).clip(0.0, 1.0)
