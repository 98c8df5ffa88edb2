"""HunyuanDiT text-to-image pipeline.

Mirrors /root/reference/diffsynth/pipelines/hunyuan_image.py: EnhancedDDIM
v-prediction scheduler (beta 0.00085..0.03, :129), dual text conditioning
(HunyuanDiT CLIP 77x1024 + mT5 256x2048 with attention masks), image-size
conditioning vector, standard CFG (:260-277).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.hunyuan_dit import (
    HunyuanDiTConfig,
    hunyuan_dit_forward,
    init_hunyuan_dit,
)
from goal_force_tpu.schedulers.ddim import ddim_step, make_ddim_schedule


@dataclasses.dataclass
class HunyuanImagePipeline:
    dit: Dict
    vae_decoder: Dict
    cfg: HunyuanDiTConfig
    vae_encoder: Optional[Dict] = None
    vae_enc_plan: Tuple = ()
    vae_dec_plan: Tuple = ()
    vae_groups: int = 32
    vae_scaling: float = 0.13025       # SDXL VAE (reference fetches sdxl vae)
    vae_factor: int = 8
    # encode_prompt(prompt) -> (clip_emb, clip_mask, t5_emb, t5_mask)
    encode_prompt: Optional[Callable] = None
    dtype: object = jnp.bfloat16

    @classmethod
    def from_pretrained(
        cls,
        dit_path,
        bert_path=None,                    # HunyuanDiT CLIP-style BERT tower
        t5_path=None,                      # mT5 encoder (diffsynth naming)
        vae_decoder_path=None,
        tokenizer="vendored",              # vendored hunyuan_dit BERT vocab
        vae_dec_plan=None,
        vae_groups: int = 32,
        dtype=jnp.bfloat16,
        bert_num_heads=None,
        t5_num_heads=None,
        **infer_kw,                        # num_heads for tiny DiT files
    ) -> "HunyuanImagePipeline":
        """HunyuanDiT 'load weights, generate' (reference ModelManager rows;
        hunyuan_dit_prompter.py: BERT 77 tokens + mT5 256 tokens)."""
        from goal_force_tpu.io.auto import load_model
        from goal_force_tpu.models.sd_vae import SD_VAE_DECODER_PLAN

        to_dev = lambda tree: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), tree)
        dit = load_model(dit_path, **infer_kw)
        if dit["kind"] != "hunyuan_dit":
            raise ValueError(f"{dit_path} detected as {dit['kind']!r}")
        cfg = dit["config"]

        encode_prompt = None
        if bert_path is not None:
            from goal_force_tpu.models.text_encoders import bert_encode
            from goal_force_tpu.models import t5 as t5m

            rb = load_model(bert_path, num_heads=bert_num_heads)
            bert, bert_cfg = to_dev(rb["params"]), rb["config"]
            t5p = t5_cfg = None
            if t5_path is not None:
                rt = load_model(t5_path, num_heads=t5_num_heads)
                t5p, t5_cfg = to_dev(rt["params"]), rt["config"]
            tok_bert = tokenizer
            if tokenizer == "vendored":
                from goal_force_tpu.prompters import hunyuan_dit_tokenizers

                tok_bert, _ = hunyuan_dit_tokenizers()
                tok_bert = tok_bert.with_length(cfg.text_len)

            def encode_prompt(prompt):
                import numpy as _np

                ids = jnp.asarray(_np.asarray(tok_bert(prompt))[None], jnp.int32)
                mask = (ids != 0).astype(jnp.int32)
                clip_emb = bert_encode(bert, bert_cfg, ids, mask)
                if t5p is not None:
                    from goal_force_tpu.pipelines.flux import _hash_ids

                    tids = jnp.asarray(
                        _hash_ids(prompt, t5_cfg.vocab, cfg.t5_len)[None],
                        jnp.int32)
                    tmask = (tids != 0).astype(jnp.int32)
                    t5_emb = t5m.t5_encode(t5p, t5_cfg, tids, tmask)
                else:
                    t5_emb = jnp.zeros((1, cfg.t5_len, cfg.t5_dim), clip_emb.dtype)
                    tmask = jnp.zeros((1, cfg.t5_len), jnp.int32)
                return clip_emb, mask, t5_emb, tmask

        vae_dec = None
        dec_plan = vae_dec_plan or SD_VAE_DECODER_PLAN
        if vae_decoder_path is not None:
            vae_dec = to_dev(load_model(vae_decoder_path, plan=dec_plan)["params"])
        return cls(dit=to_dev(dit["params"]), vae_decoder=vae_dec, cfg=cfg,
                   vae_dec_plan=dec_plan, vae_groups=vae_groups,
                   encode_prompt=encode_prompt, dtype=dtype)

    @classmethod
    def init_random(cls, key=None, dtype=jnp.float32) -> "HunyuanImagePipeline":
        from goal_force_tpu.pipelines.sd import _init_tiny_vae

        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, 2)
        cfg = HunyuanDiTConfig(dim=16, num_heads=2, num_layers_down=4,
                               num_layers_up=2, text_dim=12, t5_dim=16,
                               text_len=8, t5_len=6)
        dit = init_hunyuan_dit(ks[0], cfg, dtype=dtype)
        vae_e, vae_d, enc_plan, dec_plan = _init_tiny_vae(ks[1], dtype)
        return cls(dit=dit, vae_decoder=vae_d, cfg=cfg,
                   vae_encoder=vae_e, vae_enc_plan=enc_plan,
                   vae_dec_plan=dec_plan, vae_groups=4, dtype=dtype)

    @functools.cached_property
    def _denoise_cfg(self):
        cfg = self.cfg

        @jax.jit
        def fn(dit, latents, t, clip2, cm2, t52, t5m2, size_emb, cfg_scale,
               local_w=None):
            # prompt rows: [posi, nega, local_1..L] in one merged batch (the
            # reference runs 2+L sequential passes, hunyuan_image.py:260-277)
            b = latents.shape[0]
            n = clip2.shape[0] // b
            x2 = jnp.concatenate([latents] * n, axis=0)
            t2 = jnp.concatenate([t] * n, axis=0)
            pred = hunyuan_dit_forward(dit, cfg, x2, clip2, t52, cm2, t5m2,
                                       t2, size_emb)
            p_pos, p_neg = pred[:b], pred[b:2 * b]
            if local_w is not None:
                from goal_force_tpu.pipelines.regional import (
                    blend_local_predictions,
                )

                p_pos = blend_local_predictions(p_pos, pred[2 * b:], local_w)
            return p_neg + cfg_scale * (p_pos - p_neg)

        return fn

    def _embeds(self, prompts):
        if self.encode_prompt is not None:
            encs = [self.encode_prompt(p) for p in prompts]
        else:
            from goal_force_tpu.pipelines.flux import _hash_ids

            def emb(text, dim, length):
                ids = _hash_ids(text, 997, length)
                k = jax.random.PRNGKey(int(ids.sum()))
                return jax.random.normal(k, (1, length, dim), jnp.float32)

            encs = [(emb(p, self.cfg.text_dim, self.cfg.text_len),
                     jnp.ones((1, self.cfg.text_len)),
                     emb(p, self.cfg.t5_dim, self.cfg.t5_len),
                     jnp.ones((1, self.cfg.t5_len))) for p in prompts]
        cat = lambda i: jnp.concatenate([e[i] for e in encs], axis=0)
        return (cat(0).astype(self.dtype), cat(1),
                cat(2).astype(self.dtype), cat(3))

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 7.5,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 30,
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
        return_latents: bool = False,
    ) -> np.ndarray:
        # tiled: spatially tiled VAE decode, latent-unit tile_size (reference
        # hunyuan_image.py:171-172 decode_image -> sd_vae_decoder tiled path)
        # local_prompts/masks/mask_scales: regional prompting
        # (hunyuan_image.py:223,246,265 via control_noise_via_local_prompts);
        # input_image + denoising_strength: i2i (hunyuan_image.py:233-239)
        from goal_force_tpu.models.sd_vae import sd_vae_decode, sd_vae_encode
        from goal_force_tpu.schedulers.ddim import ddim_add_noise

        schedule = make_ddim_schedule(num_inference_steps,
                                      beta_start=0.00085, beta_end=0.03,
                                      prediction_type="v_prediction",
                                      denoising_strength=denoising_strength
                                      if input_image is not None else 1.0)
        local_prompts = list(local_prompts or [])
        clip2, cm2, t52, t5m2 = self._embeds(
            [prompt, negative_prompt] + local_prompts)
        # width FIRST (reference prepare_extra_input :197:
        # [width, height, width, height, 0, 0])
        size_emb = jnp.tile(
            jnp.asarray([[width, height, width, height, 0, 0]], jnp.float32),
            (2 + len(local_prompts), 1))

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
            img = jnp.asarray(np.asarray(input_image, np.float32) * 2.0 - 1.0,
                              jnp.float32)[None]
            enc = jax.jit(lambda c: sd_vae_encode(
                self.vae_encoder, c, self.vae_enc_plan,
                groups=self.vae_groups, scaling=self.vae_scaling))
            if tiled:
                from goal_force_tpu.models.tiler import tiled_forward_2d

                z = tiled_forward_2d(enc, img, tile_size * self.vae_factor,
                                     tile_stride * self.vae_factor)
            else:
                z = enc(img)
            latents = ddim_add_noise(schedule, z.astype(self.dtype), noise,
                                     int(schedule.timesteps[0])) \
                .astype(self.dtype)
        else:
            latents = noise
        for i in range(len(schedule)):
            t = jnp.full((1,), float(schedule.timesteps[i]), self.dtype)
            pred = self._denoise_cfg(self.dit, latents, t, clip2, cm2, t52,
                                     t5m2, size_emb, float(cfg_scale),
                                     local_w=local_w)
            latents = ddim_step(schedule, pred.astype(latents.dtype), i,
                                latents)
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
