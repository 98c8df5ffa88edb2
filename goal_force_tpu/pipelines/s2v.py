"""S2VPipeline — speech-to-video generation (Wan2.2-S2V-14B).

The reference runs S2V inside WanVideoPipeline: WanVideoUnit_S2V prepares audio
embeds / motion latents / pose latents (/root/reference/src/goal_force/
wan_video_new.py:1150-1227), WanVideoUnit_ImageEmbedderFused pins the reference
latent into frame 0 (:921-938 + the per-step re-pin :722-723), and the denoise
loop dispatches to model_fn_wans2v (:1594-1693). Here those become explicit
stages around ONE jitted denoise step over models/s2v.py::wan_s2v_forward.

CFG follows the reference: the negative branch zeroes the audio embeds
(:1215-1216) and uses the negative prompt. S2V's two-row t_mod (video vs
ref/motion tokens) keeps the branches as two batch-1 calls inside the step.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu import configs
from goal_force_tpu.configs import PipelineConfig, T5Config, VAEConfig
from goal_force_tpu.models import t5 as t5m
from goal_force_tpu.models import vae as vaem
from goal_force_tpu.models.s2v import S2VConfig, s2v_params_from_torch, wan_s2v_forward
from goal_force_tpu.models.tokenizer import load_tokenizer
from goal_force_tpu.schedulers import flow_match as fm

MOTION_FRAMES = 73  # reference WanVideoUnit_S2V.process_motion_latents :1170


@dataclasses.dataclass
class S2VPipeline:
    cfg: S2VConfig
    t5_cfg: T5Config
    vae_cfg: VAEConfig
    pipe_cfg: PipelineConfig
    params: Dict                      # {s2v, t5, vae}
    tokenizer: object
    dtype: object = jnp.bfloat16
    attn_impl: str = "auto"
    mesh: Optional[object] = None

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        s2v_model,                        # safetensors path/glob or state dict
        t5_path: Optional[str] = None,
        vae_path: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
        cfg: Optional[S2VConfig] = None,
        t5_cfg: Optional[T5Config] = None,
        vae_cfg: Optional[VAEConfig] = None,
        pipe_cfg: Optional[PipelineConfig] = None,
        dtype=jnp.bfloat16,
    ) -> "S2VPipeline":
        from goal_force_tpu.io import torch_convert as tc
        from goal_force_tpu.io.safetensors_io import load_safetensors, load_torch_pth

        cfg = cfg or S2VConfig()
        t5_cfg = t5_cfg or configs.UMT5_XXL
        vae_cfg = vae_cfg or configs.WAN21_VAE
        pipe_cfg = pipe_cfg or PipelineConfig()

        def _load_any(path):
            if path is None:
                return None
            if isinstance(path, dict):
                return path
            if str(path).endswith((".pth", ".pt")):
                return load_torch_pth(path)
            return load_safetensors(path)

        def to_dev(tree):
            return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), tree)

        params: Dict = {"s2v": to_dev(s2v_params_from_torch(_load_any(s2v_model), cfg))}
        if t5_path is not None:
            params["t5"] = to_dev(tc.t5_params_from_torch(_load_any(t5_path), t5_cfg))
        if vae_path is not None:
            params["vae"] = to_dev(tc.vae_params_from_torch(_load_any(vae_path), vae_cfg))
        tok = load_tokenizer(tokenizer_path, t5_cfg.vocab, t5_cfg.text_len)
        return cls(cfg, t5_cfg, vae_cfg, pipe_cfg, params, tok, dtype)

    # ------------------------------------------------------------------
    # Jitted stages
    # ------------------------------------------------------------------

    @functools.cached_property
    def _encode_text(self):
        t5_cfg = self.t5_cfg

        @jax.jit
        def fn(t5_params, ids, mask):
            emb = t5m.t5_encode(t5_params, t5_cfg, ids, mask)
            return emb * (mask[..., None] > 0)

        return fn

    @functools.cached_property
    def _encode_vae(self):
        cfg = self.vae_cfg

        @jax.jit
        def fn(vae_params, video):
            return vaem.encode_video(vae_params, cfg, video)

        return fn

    @functools.cached_property
    def _decode_vae(self):
        cfg = self.vae_cfg

        @jax.jit
        def fn(vae_params, latents):
            return vaem.decode_video(vae_params, cfg, latents)

        return fn

    @functools.cached_property
    def _denoise_step(self):
        cfg = self.cfg
        attn_impl = self.attn_impl

        @functools.partial(jax.jit, static_argnames=("use_motion", "use_pose"))
        def fn(s2v_params, latents, ref_lat, timestep, sigma, sigma_next,
               ctx_posi, ctx_nega, audio, motion_latents, pose_cond, cfg_scale,
               use_motion, use_pose):
            """One Euler step. latents (1, L, h, w, z) with frame 0 = ref latent."""
            x = jnp.concatenate([ref_lat, latents[:, 1:]], axis=1)
            mot = motion_latents if use_motion else None
            pose = pose_cond if use_pose else None
            v_posi = wan_s2v_forward(s2v_params, cfg, x, timestep, ctx_posi,
                                     audio, motion_latents=mot, pose_cond=pose,
                                     attn_impl=attn_impl)
            v = v_posi
            if cfg_scale is not None:
                v_nega = wan_s2v_forward(s2v_params, cfg, x, timestep, ctx_nega,
                                         jnp.zeros_like(audio), motion_latents=mot,
                                         pose_cond=pose, attn_impl=attn_impl)
                v = v_nega + cfg_scale * (v_posi - v_nega)
            stepped = fm.euler_step(x, v.astype(x.dtype), sigma, sigma_next)
            # re-pin the reference latent (reference :722-723 via first_frame_latents)
            return jnp.concatenate([ref_lat, stepped[:, 1:]], axis=1)

        return fn

    # ------------------------------------------------------------------
    # Conditioning
    # ------------------------------------------------------------------

    def encode_prompts(self, prompts):
        ids, mask = self.tokenizer(prompts)
        return self._encode_text(self.params["t5"], jnp.asarray(ids), jnp.asarray(mask))

    def _encode_px(self, video_01: np.ndarray) -> jnp.ndarray:
        """(F, H, W, 3) in [0,1] -> (1, L, h, w, z)."""
        x = jnp.asarray(video_01, jnp.float32)[None] * 2.0 - 1.0
        return self._encode_vae(self.params["vae"], x).astype(self.dtype)

    def _pose_latents(self, s2v_pose_video: np.ndarray, num_frames: int,
                      h: int, w: int) -> jnp.ndarray:
        """(<=F-1, H, W, 3) -> (1, L-1, h, w, z): pad with -1 to infer_frames, prepend
        a copy of frame 0, encode, drop the first latent frame (reference :1183-1204)."""
        infer_frames = num_frames - 1
        pose = np.asarray(s2v_pose_video, np.float32)[:infer_frames] * 2.0 - 1.0
        if pose.shape[0] < infer_frames:
            pad = -np.ones((infer_frames - pose.shape[0], h, w, 3), np.float32)
            pose = np.concatenate([pose, pad], axis=0)
        pose = np.concatenate([pose[:1], pose], axis=0)
        lat = self._encode_vae(self.params["vae"], jnp.asarray(pose)[None])
        return lat[:, 1:].astype(self.dtype)

    def audio_features(self, input_audio: np.ndarray, audio_sample_rate: int,
                       num_frames: int, fps: int = 16,
                       wav2vec_path: Optional[str] = None) -> np.ndarray:
        """Raw waveform -> (1, layers, C, num_frames-1) stacked wav2vec2 features
        (reference get_audio_feats_per_inference, batch_frames=num_frames-1)."""
        from goal_force_tpu.models.audio import Wav2Vec2Features

        feats = Wav2Vec2Features(wav2vec_path)
        buckets = feats.extract(input_audio, audio_sample_rate, fps=fps,
                                batch_frames=num_frames - 1)
        return np.asarray(buckets[:1])

    # ------------------------------------------------------------------
    # Generation
    # ------------------------------------------------------------------

    def __call__(self, *args, **kwargs) -> np.ndarray:
        """Generate one clip (see _generate for the full signature). Runs with the
        pipeline's mesh ambient so activation constraints become GSPMD hints."""
        from goal_force_tpu.parallel import use_mesh

        with use_mesh(self.mesh):
            return self._generate(*args, **kwargs)

    def _generate(
        self,
        prompt: str,
        input_image: np.ndarray,              # (H, W, 3) float [0,1]
        audio_embeds: Optional[np.ndarray] = None,   # (1, layers, C, F-1)
        input_audio: Optional[np.ndarray] = None,    # raw waveform (needs wav2vec)
        audio_sample_rate: int = 16000,
        wav2vec_path: Optional[str] = None,
        s2v_pose_video: Optional[np.ndarray] = None,  # (F-1, H, W, 3) float [0,1]
        motion_video: Optional[np.ndarray] = None,    # (73, H, W, 3) float [0,1]
        negative_prompt: Optional[str] = None,
        seed: int = 0,
        num_frames: Optional[int] = None,
        num_inference_steps: Optional[int] = None,
        cfg_scale: Optional[float] = None,
        sigma_shift: Optional[float] = None,
        progress: bool = False,
    ) -> np.ndarray:
        """Returns (F, H, W, 3) float32 frames in [0, 1]; frame 0 ~ input_image."""
        pc = self.pipe_cfg
        num_frames = num_frames or pc.num_frames
        steps = num_inference_steps or pc.num_inference_steps
        cfg_scale = pc.cfg_scale if cfg_scale is None else cfg_scale
        shift = sigma_shift or pc.sigma_shift
        negative_prompt = pc.negative_prompt if negative_prompt is None else negative_prompt
        h, w = input_image.shape[:2]

        if audio_embeds is None:
            if input_audio is None:
                raise ValueError("pass audio_embeds or input_audio")
            audio_embeds = self.audio_features(input_audio, audio_sample_rate,
                                               num_frames, wav2vec_path=wav2vec_path)
        audio = jnp.asarray(audio_embeds, self.dtype)

        ctx = self.encode_prompts([prompt, negative_prompt])
        ctx_posi, ctx_nega = ctx[:1], ctx[1:]

        ref_lat = self._encode_px(input_image[None])          # (1, 1, h, w, z)

        use_motion = motion_video is not None
        if use_motion:
            if motion_video.shape[0] != MOTION_FRAMES:
                raise ValueError(f"motion_video must have {MOTION_FRAMES} frames "
                                 f"(reference :1172), got {motion_video.shape[0]}")
            motion_latents = self._encode_px(motion_video)
            # the reference FramePackMotioner hardcodes 16-channel motion latents
            # (wan_video_dit_s2v.py:176-178); the packer weights define the truth
            packer_c = self.params["s2v"]["frame_packer"]["proj"]["w"].shape[0] // 4
            if motion_latents.shape[-1] != packer_c:
                raise ValueError(
                    f"motion latents have {motion_latents.shape[-1]} channels but the "
                    f"frame packer expects {packer_c} (VAE z_dim mismatch)")
        else:
            # zeros are encoded anyway in the reference but then dropped
            # (drop_motion_frames=True): no motion tokens enter the model
            motion_latents = jnp.zeros((1, 1, h // 8, w // 8, self.vae_cfg.z_dim),
                                       self.dtype)
        use_pose = s2v_pose_video is not None
        pose_cond = (self._pose_latents(s2v_pose_video, num_frames, h, w)
                     if use_pose else jnp.zeros((1, 1, 1, 1, 1), self.dtype))

        schedule = fm.make_schedule(num_steps=steps, shift=shift, sigma_min=0.0,
                                    extra_one_step=True)
        lat_f = (num_frames - 1) // 4 + 1
        shape = (1, lat_f, h // 8, w // 8, self.vae_cfg.z_dim)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape,
                                    jnp.float32).astype(self.dtype)

        it = range(len(schedule))
        if progress:
            import tqdm

            it = tqdm.tqdm(it)
        cfg_arg = None if cfg_scale == 1.0 else cfg_scale
        for i in it:
            t_val = float(schedule.timesteps[i])
            tstep = jnp.full((1,), t_val, self.dtype)
            latents = self._denoise_step(
                self.params["s2v"], latents, ref_lat, tstep,
                schedule.sigmas[i], schedule.sigma_next(i),
                ctx_posi, ctx_nega, audio, motion_latents, pose_cond, cfg_arg,
                use_motion, use_pose,
            )

        if use_motion:
            # WanVideoPostUnit_S2V (reference :1232-1239, drop_motion_frames=False):
            # decode the motion context followed by the generated frames — the ref
            # latent frame is dropped, the 73 motion frames lead the output.
            latents = jnp.concatenate([motion_latents, latents[:, 1:]], axis=1)
        video = self._decode_vae(self.params["vae"], latents.astype(jnp.float32))
        return np.asarray((video[0] + 1.0) / 2.0, np.float32)
