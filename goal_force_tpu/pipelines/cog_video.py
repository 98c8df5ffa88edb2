"""CogVideoX text-to-video pipeline.

Mirrors the reference CogVideoPipeline (/root/reference/diffsynth/pipelines/
cog_video.py): zero-terminal-SNR DDIM with v-prediction (:17), true CFG as two
passes merged into one batched call, 49-frame 480x720 defaults, T5-v1.1 text
conditioning (226 tokens), video-to-video via add_noise. The Cog VAE is
pluggable (decode: (B, T, h, w, 16) latents -> frames)."""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.configs import T5Config
from goal_force_tpu.models import t5 as t5m
from goal_force_tpu.models.cog_dit import CogDiTConfig, cog_dit_forward, init_cog_dit
from goal_force_tpu.schedulers.ddim import (
    ddim_add_noise,
    ddim_step,
    make_ddim_schedule,
)


def tiny_cog_configs():
    # rope_dim must split 1/4 + 3/8 + 3/8 into even dims -> head_dim 16
    dit_cfg = CogDiTConfig(dim=64, cond_dim=32, num_heads=4, num_blocks=2,
                           text_dim=32, freq_dim=32, rope_dim=16)
    t5_cfg = T5Config(vocab=128, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
                      num_layers=2, shared_pos=True, text_len=16)
    return dit_cfg, t5_cfg


@dataclasses.dataclass
class CogVideoPipeline:
    dit: Dict
    t5: Optional[Dict]
    dit_cfg: CogDiTConfig
    t5_cfg: Optional[T5Config] = None
    tokenize: Optional[Callable] = None
    decode_video: Optional[Callable] = None
    encode_video: Optional[Callable] = None
    dtype: object = jnp.bfloat16
    attn_impl: str = "auto"

    @classmethod
    def init_random(cls, key=None, dtype=jnp.float32):
        key = key if key is not None else jax.random.PRNGKey(0)
        dit_cfg, t5_cfg = tiny_cog_configs()
        ks = jax.random.split(key, 2)
        return cls(dit=init_cog_dit(ks[0], dit_cfg, dtype),
                   t5=t5m.init_t5(ks[1], t5_cfg, dtype),
                   dit_cfg=dit_cfg, t5_cfg=t5_cfg, dtype=dtype)

    @classmethod
    def from_pretrained(
        cls,
        dit_path,
        text_encoder_path=None,            # T5 (diffsynth or HF naming)
        vae_encoder_path=None,
        vae_decoder_path=None,
        vae_cfg=None,                      # CogVAEConfig; default = released 5B
        tokenizer="vendored",              # cog spiece (len 226)
        t5_length: int = 226,
        dtype=jnp.bfloat16,
        t5_num_heads=None,
        **infer_kw,                        # rope_dim for tiny DiT files
    ) -> "CogVideoPipeline":
        """CogVideoX 'load weights, generate' (reference ModelManager Cog rows;
        cog_prompter.py tokenizes to 226 T5 tokens)."""
        import dataclasses as dc

        from goal_force_tpu.io.auto import load_model, load_weights

        to_dev = lambda tree: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), tree)
        dit = load_model(dit_path, **infer_kw)
        if dit["kind"] != "cog_dit":
            raise ValueError(f"{dit_path} detected as {dit['kind']!r}")
        t5_cfg, t5 = None, None
        if text_encoder_path is not None:
            r = load_model(text_encoder_path, num_heads=t5_num_heads)
            t5_cfg = dc.replace(r["config"], text_len=t5_length)
            t5 = to_dev(r["params"])

        decode_video = encode_video = None
        from goal_force_tpu.models import cog_vae as cv

        vcfg = vae_cfg or cv.CogVAEConfig()
        if vae_decoder_path is not None:
            dec = to_dev(cv.cog_vae_decoder_params_from_torch(
                load_weights(vae_decoder_path), vcfg))
            decode_video = lambda z, **tk: (
                cv.cog_vae_decode_tiled(dec, z, vcfg, tk["tile_size"],
                                        tk["tile_stride"])
                if tk.get("tiled") else cv.cog_vae_decode(dec, z, vcfg))
        if vae_encoder_path is not None:
            enc = to_dev(cv.cog_vae_encoder_params_from_torch(
                load_weights(vae_encoder_path), vcfg))
            encode_video = lambda v, **tk: (
                cv.cog_vae_encode_tiled(enc, v, vcfg, tk["tile_size"],
                                        tk["tile_stride"])
                if tk.get("tiled") else cv.cog_vae_encode(enc, v, vcfg))

        tok = tokenizer
        if tokenizer == "vendored":
            from goal_force_tpu.prompters import cog_tokenizer

            tok = cog_tokenizer(length=t5_length)
        return cls(dit=to_dev(dit["params"]), t5=t5,
                   dit_cfg=dit["config"],
                   t5_cfg=t5_cfg or tiny_cog_configs()[1],
                   tokenize=tok, decode_video=decode_video,
                   encode_video=encode_video, dtype=dtype)

    @functools.cached_property
    def _encode_text(self):
        t5_cfg = self.t5_cfg

        @jax.jit
        def fn(t5_params, ids):
            return t5m.t5_encode(t5_params, t5_cfg, ids, jnp.ones_like(ids))

        return fn

    @functools.cached_property
    def _model_cfg(self):
        cfg = self.dit_cfg
        attn_impl = self.attn_impl

        @jax.jit
        def fn(dit, latents, timestep, emb2, cfg_scale):
            b = latents.shape[0]
            x2 = jnp.concatenate([latents, latents], axis=0)
            t2 = jnp.concatenate([timestep, timestep], axis=0)
            v = cog_dit_forward(dit, cfg, x2, t2, emb2, attn_impl=attn_impl)
            return v[b:] + cfg_scale * (v[:b] - v[b:])

        return fn

    def _ids(self, prompts):
        from goal_force_tpu.pipelines.flux import _hash_ids

        ids = np.stack([
            np.asarray(self.tokenize(p)) if self.tokenize
            else _hash_ids(p, self.t5_cfg.vocab, self.t5_cfg.text_len)
            for p in prompts])
        return jnp.asarray(ids, jnp.int32)

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 7.0,
        input_video: Optional[np.ndarray] = None,
        denoising_strength: float = 1.0,
        num_frames: int = 49,
        height: int = 480,
        width: int = 720,
        num_inference_steps: int = 20,
        seed: int = 0,
        progress: bool = False,
        tiled: bool = False,
        tile_size=(60, 90),
        tile_stride=(30, 45),
    ) -> np.ndarray:
        # tiled: spatial VAE tiling in latent units (reference cog_video.py
        # :73-83 tiler_kwargs -> cog_vae.py TileWorker2Dto3D paths). Only
        # callables wired by from_pretrained accept the tiling kwargs;
        # user-injected encode/decode see plain calls when tiled=False.
        tk = dict(tiled=tiled, tile_size=tuple(tile_size),
                  tile_stride=tuple(tile_stride)) if tiled else {}
        schedule = make_ddim_schedule(num_inference_steps,
                                      prediction_type="v_prediction",
                                      rescale_zero_terminal_snr=True,
                                      denoising_strength=denoising_strength)
        emb = self._encode_text(self.t5, self._ids([prompt, negative_prompt]))
        emb = emb.astype(self.dtype)

        lt = num_frames // 4 + 1
        noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (1, lt, height // 8, width // 8, self.dit_cfg.in_channels),
            jnp.float32).astype(self.dtype)
        if denoising_strength == 1.0 or input_video is None:
            latents = noise
        else:
            z = self.encode_video(input_video, **tk).astype(self.dtype)
            latents = ddim_add_noise(schedule, z, noise,
                                     int(schedule.timesteps[0]))

        it = range(len(schedule))
        if progress:
            import tqdm

            it = tqdm.tqdm(it)
        for i in it:
            ts = jnp.full((1,), float(schedule.timesteps[i]), self.dtype)
            v = self._model_cfg(self.dit, latents, ts, emb, cfg_scale)
            latents = ddim_step(schedule, v.astype(latents.dtype), i, latents)
        if self.decode_video is not None:
            return self.decode_video(latents, **tk)
        return np.asarray(latents, np.float32)
