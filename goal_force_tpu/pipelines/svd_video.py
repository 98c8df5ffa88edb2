"""Stable Video Diffusion image-to-video pipeline.

Mirrors /root/reference/diffsynth/pipelines/svd_video.py: EDM continuous-ODE
scheduler (:16), CLIP image conditioning + noise-augmented VAE image latents
concatenated per frame (:150-154), per-frame linearly spaced CFG scales
(:157-158), add_time_id = (fps-1, motion_bucket_id, noise_aug_strength)
(:161), post-normalize + contrast enhance before the temporal VAE decode
(:183-186).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.svd_unet import svd_unet_apply, tiny_svd_plan
from goal_force_tpu.schedulers.continuous_ode import (
    make_continuous_ode_schedule,
    ode_step,
)


@dataclasses.dataclass
class SVDVideoPipeline:
    unet: Dict
    vae_decoder: Dict
    plan: Sequence[Tuple]
    vae_dec_plan: Sequence[Tuple]
    groups: int = 32
    vae_groups: int = 32
    vae_scaling: float = 0.18215
    # encode_image(image (H, W, 3) in [-1,1]) -> (1, 1024) CLIP embedding;
    # pluggable (the reference uses a ViT-H tower, svd_video.py:41-49)
    encode_image: Optional[Callable] = None
    # encode_image_latent(image) -> (1, h, w, 4) unscaled VAE latents
    encode_image_latent: Optional[Callable] = None
    # encode_video(frames (F, H, W, 3) in [-1,1]) -> (F, h, w, 4) SCALED
    # latents (reference encode_video_with_vae, svd_video.py:60-67); needed
    # for input_video v2v and mask_frames
    encode_video: Optional[Callable] = None
    clip_dim: int = 1024
    dtype: object = jnp.float32

    @classmethod
    def from_pretrained(
        cls,
        unet_path,
        vae_decoder_path=None,
        plan=None,
        vae_dec_plan=None,
        groups: int = 32,
        vae_groups: int = 32,
        encode_image=None,                 # ViT-H CLIP tower (pluggable)
        encode_image_latent=None,
        encode_video=None,                 # VAE video encoder (pluggable)
        clip_dim: int = 1024,
        dtype=jnp.float32,
    ) -> "SVDVideoPipeline":
        """SVD 'load weights, generate' (reference ModelManager SVD rows).
        The conditioning towers (open-clip ViT-H image encoder, VAE encoder)
        stay pluggable callables like init_random's."""
        from goal_force_tpu.io.auto import load_model, load_weights
        from goal_force_tpu.models.svd_unet import SVD_PLAN
        from goal_force_tpu.models.svd_vae import (
            SVD_VAE_DECODER_PLAN,
            svd_vae_decoder_params_from_torch,
        )

        to_dev = lambda tree: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), tree)
        plan = plan or SVD_PLAN
        unet = load_model(unet_path, plan=plan)
        if unet["kind"] != "svd_unet":
            raise ValueError(f"{unet_path} detected as {unet['kind']!r}")
        vae_dec = None
        dec_plan = vae_dec_plan or SVD_VAE_DECODER_PLAN
        if vae_decoder_path is not None:
            vae_dec = to_dev(svd_vae_decoder_params_from_torch(
                load_weights(vae_decoder_path), dec_plan))
        return cls(unet=to_dev(unet["params"]), vae_decoder=vae_dec,
                   plan=plan, vae_dec_plan=dec_plan, groups=groups,
                   vae_groups=vae_groups, encode_image=encode_image,
                   encode_image_latent=encode_image_latent,
                   encode_video=encode_video,
                   clip_dim=clip_dim, dtype=dtype)

    @classmethod
    def init_random(cls, key=None, dtype=jnp.float32) -> "SVDVideoPipeline":
        from goal_force_tpu.models.svd_unet import init_svd_unet

        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, 2)
        plan = tiny_svd_plan()
        unet = init_svd_unet(ks[0], plan, model_dim=8, time_dim=16,
                             clip_dim=16, dtype=dtype)
        dec_plan = (("res", 8, 8), ("tres", 8), ("vattn", 8),
                    ("res", 8, 8), ("tres", 8), ("up", 8),
                    ("res", 8, 8), ("tres", 8))
        vae_d = _init_tiny_svd_vae_decoder(ks[1], dec_plan, dtype)
        return cls(unet=unet, vae_decoder=vae_d, plan=plan,
                   vae_dec_plan=dec_plan, groups=4, vae_groups=4, clip_dim=16,
                   dtype=dtype)

    @functools.cached_property
    def _denoise(self):
        plan, groups = self.plan, self.groups

        @jax.jit
        def fn(unet, latents, img_lat_p, clip_p, t, add_id, cfg_scales):
            zeros_lat = jnp.zeros_like(img_lat_p)
            zeros_clip = jnp.zeros_like(clip_p)
            x_p = jnp.concatenate([latents, img_lat_p], axis=-1)
            x_n = jnp.concatenate([latents, zeros_lat], axis=-1)
            e_p = svd_unet_apply(unet, plan, x_p, t, clip_p, add_id,
                                 groups=groups)
            e_n = svd_unet_apply(unet, plan, x_n, t, zeros_clip, add_id,
                                 groups=groups)
            return e_n + cfg_scales * (e_p - e_n)

        return fn

    def __call__(
        self,
        input_image: np.ndarray,            # (H, W, 3) in [-1, 1]
        input_video: Optional[np.ndarray] = None,  # (F, H, W, 3) in [-1, 1]
        mask_frames: Optional[np.ndarray] = None,  # (M, H, W, 3) in [-1, 1]
        mask_frame_ids=(),
        denoising_strength: float = 1.0,
        num_frames: int = 25,
        height: int = 576,
        width: int = 1024,
        min_cfg_scale: float = 1.0,
        max_cfg_scale: float = 3.0,
        fps: int = 7,
        motion_bucket_id: int = 127,
        noise_aug_strength: float = 0.02,
        num_inference_steps: int = 20,
        post_normalize: bool = True,
        contrast_enhance_scale: float = 1.2,
        seed: int = 0,
    ) -> np.ndarray:
        # input_video + denoising_strength < 1: v2v (reference svd_video.py
        # :140-144). mask_frames/mask_frame_ids: those frames are clamped to
        # noised encodings of the given frames every step (:147-148,166-168).
        from goal_force_tpu.models.svd_vae import svd_vae_decode
        from goal_force_tpu.schedulers.continuous_ode import ode_add_noise

        schedule = make_continuous_ode_schedule(
            num_inference_steps, denoising_strength=denoising_strength)
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        h8, w8 = height // 8, width // 8
        noise = jax.random.normal(k1, (num_frames, h8, w8, 4), self.dtype)
        if denoising_strength == 1.0 or input_video is None:
            latents = noise
        else:
            if self.encode_video is None:
                raise ValueError("input_video requires encode_video")
            z = jnp.asarray(self.encode_video(input_video), self.dtype)
            latents = ode_add_noise(schedule, z, noise, 0)
        mask_latents = None
        mask_frame_ids = list(mask_frame_ids or ())
        if mask_frames is not None and len(mask_frame_ids) > 0:
            if self.encode_video is None:
                raise ValueError("mask_frames requires encode_video")
            mask_latents = jnp.asarray(self.encode_video(mask_frames),
                                       self.dtype)

        if self.encode_image is not None:
            clip_emb = jnp.asarray(self.encode_image(input_image))
        else:
            clip_emb = jnp.zeros((1, self.clip_dim), self.dtype)
        if self.encode_image_latent is not None:
            img = jnp.asarray(input_image)[None]
            img = img + noise_aug_strength * jax.random.normal(
                k2, img.shape, img.dtype)
            img_lat = jnp.asarray(self.encode_image_latent(img))
        else:
            img_lat = jnp.zeros((1, h8, w8, 4), self.dtype)
        img_lat = jnp.broadcast_to(img_lat, (num_frames, h8, w8, 4))

        cfg_scales = jnp.linspace(min_cfg_scale, max_cfg_scale,
                                  num_frames).reshape(-1, 1, 1, 1)
        add_id = jnp.asarray([fps - 1, motion_bucket_id, noise_aug_strength],
                             jnp.float32)

        for i in range(len(schedule)):
            if mask_latents is not None:
                ids = jnp.asarray(mask_frame_ids, jnp.int32)
                latents = latents.at[ids].set(
                    ode_add_noise(schedule, mask_latents, noise[ids], i))
            t = jnp.asarray(schedule.timesteps[i], self.dtype)
            eps = self._denoise(self.unet, latents, img_lat, clip_emb, t,
                                add_id, cfg_scales.astype(self.dtype))
            latents = ode_step(schedule, eps.astype(latents.dtype), i, latents)

        if post_normalize:
            mean, std = latents.mean(), latents.std()
            latents = (latents - latents.mean((1, 2, 3), keepdims=True)) \
                / latents.std((1, 2, 3), keepdims=True) * std + mean
        latents = latents * contrast_enhance_scale
        video = svd_vae_decode(self.vae_decoder, latents.astype(jnp.float32),
                               self.vae_dec_plan, groups=self.vae_groups,
                               scaling=self.vae_scaling)
        return np.asarray((video + 1.0) / 2.0, np.float32).clip(0.0, 1.0)


def _init_tiny_svd_vae_decoder(key, plan, dtype):
    rng = np.random.RandomState(1)
    j = lambda a: jnp.asarray(a, dtype)
    conv = lambda ci, co, k=3: {"w": j(rng.randn(k, k, ci, co) * 0.05),
                                "b": j(np.zeros(co))}
    c3 = lambda ci, co: {"w": j(rng.randn(3, 1, 1, ci, co) * 0.05),
                         "b": j(np.zeros(co))}
    nrm = lambda c: {"scale": j(np.ones(c)), "bias": j(np.zeros(c))}
    lin = lambda di, do: j(rng.randn(di, do) * 0.05)
    blocks = []
    for spec in plan:
        kind = spec[0]
        if kind == "res":
            ci, co = spec[1], spec[2]
            p = {"norm1": nrm(ci), "conv1": conv(ci, co),
                 "norm2": nrm(co), "conv2": conv(co, co)}
            if ci != co:
                p["shortcut"] = conv(ci, co, k=1)
            blocks.append(p)
        elif kind == "tres":
            c = spec[1]
            blocks.append({"norm1": nrm(c), "conv1": c3(c, c),
                           "norm2": nrm(c), "conv2": c3(c, c),
                           "mix": j(np.zeros(()))})
        elif kind == "vattn":
            c = spec[1]
            blocks.append({"norm": nrm(c), "attn": {
                "q_w": lin(c, c), "q_b": j(np.zeros(c)),
                "k_w": lin(c, c), "k_b": j(np.zeros(c)),
                "v_w": lin(c, c), "v_b": j(np.zeros(c)),
                "o_w": lin(c, c), "o_b": j(np.zeros(c))}})
        elif kind == "up":
            blocks.append({"conv": conv(spec[1], spec[1])})
    return {"conv_in": conv(4, plan[0][1]), "blocks": blocks,
            "conv_norm_out": nrm(plan[-1][1]),
            "conv_out": conv(plan[-1][1], 3),
            "time_conv_out": c3(3, 3)}
