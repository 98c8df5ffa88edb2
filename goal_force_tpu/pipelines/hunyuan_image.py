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
        _, vae_d, _, dec_plan = _init_tiny_vae(ks[1], dtype)
        return cls(dit=dit, vae_decoder=vae_d, cfg=cfg, vae_dec_plan=dec_plan,
                   vae_groups=4, dtype=dtype)

    @functools.cached_property
    def _denoise_cfg(self):
        cfg = self.cfg

        @jax.jit
        def fn(dit, latents, t, clip2, cm2, t52, t5m2, size_emb, cfg_scale):
            b = latents.shape[0]
            x2 = jnp.concatenate([latents, latents], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            pred = hunyuan_dit_forward(dit, cfg, x2, clip2, t52, cm2, t5m2,
                                       t2, size_emb)
            return pred[b:] + cfg_scale * (pred[:b] - pred[b:])

        return fn

    def _embeds(self, prompt, negative_prompt):
        if self.encode_prompt is not None:
            cp, cmp, tp, tmp_ = self.encode_prompt(prompt)
            cn, cmn, tn, tmn = self.encode_prompt(negative_prompt)
        else:
            from goal_force_tpu.pipelines.flux import _hash_ids

            def emb(text, dim, length):
                ids = _hash_ids(text, 997, length)
                k = jax.random.PRNGKey(int(ids.sum()))
                return jax.random.normal(k, (1, length, dim), jnp.float32)

            cp = emb(prompt, self.cfg.text_dim, self.cfg.text_len)
            cn = emb(negative_prompt, self.cfg.text_dim, self.cfg.text_len)
            tp = emb(prompt, self.cfg.t5_dim, self.cfg.t5_len)
            tn = emb(negative_prompt, self.cfg.t5_dim, self.cfg.t5_len)
            cmp = cmn = jnp.ones((1, self.cfg.text_len))
            tmp_ = tmn = jnp.ones((1, self.cfg.t5_len))
        cat = lambda a, b: jnp.concatenate([a, b], axis=0)
        return (cat(cp, cn).astype(self.dtype), cat(cmp, cmn),
                cat(tp, tn).astype(self.dtype), cat(tmp_, tmn))

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 7.5,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 30,
        seed: int = 0,
        return_latents: bool = False,
    ) -> np.ndarray:
        from goal_force_tpu.models.sd_vae import sd_vae_decode

        schedule = make_ddim_schedule(num_inference_steps,
                                      beta_start=0.00085, beta_end=0.03,
                                      prediction_type="v_prediction")
        clip2, cm2, t52, t5m2 = self._embeds(prompt, negative_prompt)
        # width FIRST (reference prepare_extra_input :197:
        # [width, height, width, height, 0, 0])
        size_emb = jnp.tile(
            jnp.asarray([[width, height, width, height, 0, 0]], jnp.float32),
            (2, 1))

        h, w = height // self.vae_factor, width // self.vae_factor
        latents = jax.random.normal(jax.random.PRNGKey(seed), (1, h, w, 4),
                                    jnp.float32).astype(self.dtype)
        for i in range(len(schedule)):
            t = jnp.full((1,), float(schedule.timesteps[i]), self.dtype)
            pred = self._denoise_cfg(self.dit, latents, t, clip2, cm2, t52,
                                     t5m2, size_emb, float(cfg_scale))
            latents = ddim_step(schedule, pred.astype(latents.dtype), i,
                                latents)
        if return_latents:
            return np.asarray(latents, np.float32)
        img = sd_vae_decode(self.vae_decoder, latents.astype(jnp.float32),
                            self.vae_dec_plan, groups=self.vae_groups,
                            scaling=self.vae_scaling)
        return np.asarray((img[0] + 1.0) / 2.0, np.float32).clip(0.0, 1.0)
