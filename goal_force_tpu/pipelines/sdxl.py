"""SDXL text-to-image pipeline.

Reference: diffsynth/pipelines/sdxl_image.py — dual text encoders
(CLIP-L penultimate states + OpenCLIP-bigG penultimate states concatenated to
the 2048-dim context; bigG's projected EOT pooling becomes add_text_embeds),
size/crop conditioning via add_time_id = (h, w, 0, 0, h, w), epsilon DDIM
loop, SDXL VAE (SD architecture at scaling 0.13025). One jitted CFG step, as
in pipelines/sd.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.clip import CLIPConfig, init_clip
from goal_force_tpu.models.sd_text_encoder import (
    SDXL_TEXT2_CONFIG,
    SDXL_TEXT_CONFIG,
    sdxl_text2_encode,
    sdxl_text_encode,
)
from goal_force_tpu.models.sd_vae import (
    SD_VAE_DECODER_PLAN,
    SD_VAE_ENCODER_PLAN,
    SDXL_SCALING_FACTOR,
    sd_vae_decode,
    sd_vae_encode,
)
from goal_force_tpu.models.sdxl_unet import (
    SDXL_PLAN,
    init_sdxl_unet,
    sdxl_unet_apply,
)
from goal_force_tpu.pipelines.sd import _init_tiny_vae, _init_vae
from goal_force_tpu.schedulers.ddim import make_ddim_schedule


@dataclasses.dataclass
class SDXLPipeline:
    unet: Dict
    text_encoder: Dict
    text_encoder_2: Dict
    vae_decoder: Dict
    vae_encoder: Optional[Dict] = None
    vae_enc_plan: Tuple = SD_VAE_ENCODER_PLAN
    plan: Tuple = SDXL_PLAN
    text_cfg: CLIPConfig = SDXL_TEXT_CONFIG
    text2_cfg: CLIPConfig = SDXL_TEXT2_CONFIG
    groups: int = 32
    vae_dec_plan: Tuple = SD_VAE_DECODER_PLAN
    vae_groups: int = 32
    vae_scaling: float = SDXL_SCALING_FACTOR
    tokenize: Optional[Callable[[str], np.ndarray]] = None
    # second tokenizer (CLIP-G pads differently — reference sdxl_prompter.py
    # uses a separate tokenizer_2); falls back to `tokenize` when unset
    tokenize_2: Optional[Callable[[str], np.ndarray]] = None
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        self._step = jax.jit(self._denoise_cfg,
                             static_argnames=("tile_ctx", "cn_plan",
                                              "cn_task", "cn_nhead"))
        self._decode = jax.jit(lambda p, z: sd_vae_decode(
            p, z, self.vae_dec_plan, groups=self.vae_groups,
            scaling=self.vae_scaling))
        self._encode_img = jax.jit(lambda p, img: sd_vae_encode(
            p, img, self.vae_enc_plan, groups=self.vae_groups,
            scaling=self.vae_scaling))
        self._encode = jax.jit(self._encode_prompt, static_argnums=(4, 5))

    def _encode_prompt(self, te1, te2, ids, ids2, clip_skip, clip_skip_2):
        # ids/ids2 are (num_sentence, 77) long-prompt chunks (reference
        # sdxl_prompter.py:44-61): encode each sentence as a batch row,
        # flatten to (1, num_sentence*77, 2048); pooled add_text_embeds come
        # from the FIRST sentence only (sdxl_prompter.py:60).
        h1 = sdxl_text_encode(te1, ids, self.text_cfg, clip_skip=clip_skip)
        pooled, h2 = sdxl_text2_encode(te2, ids2, self.text2_cfg,
                                       clip_skip=clip_skip_2)
        ctx = jnp.concatenate([h1, h2], axis=-1)
        return ctx.reshape(1, -1, ctx.shape[-1]), pooled[0:1]

    # merged (posi, nega, local_1..L) batch: one XLA call per step (the
    # reference runs 2+L sequential lets_dance_xl invocations)
    def _denoise_cfg(self, unet, latents, t, ctx_pos, ctx_neg, pool_pos,
                     pool_neg, add_ids, cfg_scale, w_x, w_e, tile_ctx=None,
                     ipadapter=None, ctx_locals=None, pool_locals=None,
                     local_w=None, cn=None, cn_cond=None, cn_plan=None,
                     cn_task=3, cn_nhead=8, ctx_len=None):
        b = latents.shape[0]
        ctx_rows = [ctx_pos, ctx_neg]
        pool_rows = [pool_pos, pool_neg]
        if ctx_locals is not None:
            ctx_rows.append(ctx_locals)
            pool_rows.append(pool_locals)
        ctx = jnp.concatenate(ctx_rows, axis=0)
        pool = jnp.concatenate(pool_rows, axis=0)
        n = ctx.shape[0] // b
        x2 = jnp.concatenate([latents] * n, axis=0)
        tfull = jnp.full((n * b,), t, latents.dtype)
        if ctx_len is not None:
            ctx_len = jnp.repeat(jnp.asarray(ctx_len, jnp.int32), b)
        cn_res = None
        if cn is not None:
            from goal_force_tpu.models.sd_controlnet import (
                sdxl_controlnet_apply,
            )

            cn_kwargs = {} if cn_plan is None else {"plan": cn_plan}
            # n_head is a STATIC int hoisted out of the params pytree in
            # __call__ (a traced int would fail the reshape in the
            # cn_transformer); reinsert it here
            cn = {**cn, "cn_transformer": {**cn["cn_transformer"],
                                           "n_head": cn_nhead}}
            cn_res = sdxl_controlnet_apply(
                cn, x2, tfull, ctx, jnp.concatenate([cn_cond] * n, axis=0),
                jnp.tile(add_ids, n * b), pool, task_id=cn_task,
                groups=self.groups, ctx_len=ctx_len, **cn_kwargs)
        eps = sdxl_unet_apply(unet, self.plan, x2, tfull, ctx,
                              jnp.tile(add_ids, n * b), pool,
                              groups=self.groups, controlnet_res=cn_res,
                              ipadapter=ipadapter, tile_ctx=tile_ctx,
                              ctx_len=ctx_len)
        eps_pos, eps_neg = eps[:b], eps[b:2 * b]
        if ctx_locals is not None:
            from goal_force_tpu.pipelines.regional import (
                blend_local_predictions,
            )

            eps_pos = blend_local_predictions(eps_pos, eps[2 * b:], local_w)
        eps = eps_neg + cfg_scale * (eps_pos - eps_neg)
        return latents * w_x + eps * w_e

    def _ids(self, prompt: str) -> jnp.ndarray:
        if self.tokenize is None:
            rng = np.random.default_rng(abs(hash(prompt)) % (2**32))
            ids = rng.integers(1, self.text_cfg.vocab_size - 1,
                               (1, self.text_cfg.max_positions))
            return jnp.asarray(ids.astype(np.int32))
        return jnp.asarray(np.asarray(self.tokenize(prompt))
                           .reshape(1, -1).astype(np.int32))

    def _ids2(self, prompt: str) -> jnp.ndarray:
        if self.tokenize_2 is None:
            return self._ids(prompt)
        return jnp.asarray(np.asarray(self.tokenize_2(prompt))
                           .reshape(1, -1).astype(np.int32))

    def _long_ids(self, prompts):
        """[(ids1, ids2), ...] — both tokenizers chunked per
        tokenize_long_prompt (reference sdxl_prompter.py:44-48) with ONE
        sentence count shared across tokenizers and prompts (the reference
        trims the two encoders' outputs to the min batch before concat,
        sdxl_prompter.py:52-56; equal counts make that trim a no-op, and the
        merged-CFG batch needs posi/nega context lengths equal)."""
        from goal_force_tpu.prompters import tokenize_long_prompt

        if (self.tokenize is None or not hasattr(self.tokenize, "encode")
                or self.tokenize_2 is None
                or not hasattr(self.tokenize_2, "encode")):
            ids = [(self._ids(p), self._ids2(p)) for p in prompts]
            return ids, [i[0].shape[-1] for i in ids]
        c1 = [tokenize_long_prompt(self.tokenize, p) for p in prompts]
        c2 = [tokenize_long_prompt(self.tokenize_2, p) for p in prompts]
        # each prompt's NATURAL context length = the reference's min-of-the-
        # two-encoders trim (sdxl_prompter.py:52-56) at its natural counts;
        # the denoise step masks cross-attention keys past it (ctx_len) so
        # the shared-count padding is never attended
        nat_len = [min(a.shape[0], b.shape[0]) * a.shape[1]
                   for a, b in zip(c1, c2)]
        ns = max(c.shape[0] for c in c1 + c2)
        if ns > 1:
            c1 = [tokenize_long_prompt(self.tokenize, p, num_sentences=ns)
                  for p in prompts]
            c2 = [tokenize_long_prompt(self.tokenize_2, p, num_sentences=ns)
                  for p in prompts]
        return [(jnp.asarray(a), jnp.asarray(b)) for a, b in zip(c1, c2)], \
            nat_len

    def __call__(self, prompt: str, negative_prompt: str = "",
                 height: int = 1024, width: int = 1024,
                 num_inference_steps: int = 20, cfg_scale: float = 7.5,
                 clip_skip: int = 1, clip_skip_2: int = 2, seed: int = 0,
                 input_image: Optional[np.ndarray] = None,   # (H, W, 3) [0,1]
                 denoising_strength: float = 1.0,
                 ipadapter: Optional[Dict] = None,
                 ipadapter_image_emb: Optional[np.ndarray] = None,
                 ipadapter_scale: float = 1.0,
                 local_prompts=None, masks=None, mask_scales=None,
                 local_blur_kernel_size: int = 33,
                 local_blur_sigma: float = 10.0,
                 controlnet: Optional[Dict] = None,
                 controlnet_image: Optional[np.ndarray] = None,
                 tiled: bool = False, tile_size: int = 64,
                 tile_stride: int = 32,
                 return_latents: bool = False) -> np.ndarray:
        # clip_skip defaults 1 (CLIP-L) / 2 (CLIP-G) as in the reference
        # (sdxl_image.py:120-121, sdxl_prompter.py:36-49).
        # tiled: reference sdxl_image.py:131-141 — per-transformer-block UNet
        # tiling + tiled VAE decode (see pipelines/sd.py docstring).
        # local_prompts/masks/mask_scales: regional prompting (sdxl_image.py
        # :94,168,215 via base.py control_noise_via_local_prompts); controlnet:
        # union ControlNet residuals each step ({"params","plan"?,"task_id"?} +
        # (H, W, 3) [0,1] image, sdxl_image.py:186-194); input_image +
        # denoising_strength: i2i (sdxl_image.py:139-146).
        from goal_force_tpu.schedulers.ddim import ddim_add_noise

        sched = make_ddim_schedule(num_inference_steps,
                                   denoising_strength=denoising_strength
                                   if input_image is not None else 1.0)
        noise = jax.random.normal(jax.random.PRNGKey(seed),
                                  (1, height // 8, width // 8, 4), self.dtype)
        if input_image is not None:
            img = jnp.asarray(np.asarray(input_image, np.float32) * 2.0 - 1.0,
                              self.dtype)[None]
            if tiled:
                from goal_force_tpu.models.tiler import tiled_forward_2d

                z = tiled_forward_2d(
                    lambda crop: self._encode_img(self.vae_encoder, crop),
                    img, tile_size * 8, tile_stride * 8).astype(self.dtype)
            else:
                z = self._encode_img(self.vae_encoder, img)
            latents = ddim_add_noise(sched, z, noise,
                                     int(sched.timesteps[0])).astype(self.dtype)
        else:
            latents = noise
        all_ids, nat_len = self._long_ids([prompt, negative_prompt,
                                           *(local_prompts or [])])
        ctx_len = None
        if len(set(nat_len)) > 1:
            ctx_len = jnp.asarray(nat_len, jnp.int32)
        ctx_p, pool_p = self._encode(self.text_encoder, self.text_encoder_2,
                                     all_ids[0][0], all_ids[0][1],
                                     clip_skip, clip_skip_2)
        ctx_n, pool_n = self._encode(self.text_encoder, self.text_encoder_2,
                                     all_ids[1][0], all_ids[1][1], clip_skip,
                                     clip_skip_2)
        ctx_l = pool_l = local_w = None
        if local_prompts:
            from goal_force_tpu.pipelines.regional import local_prompt_weights

            encs = [self._encode(self.text_encoder, self.text_encoder_2,
                                 i1, i2, clip_skip,
                                 clip_skip_2) for i1, i2 in all_ids[2:]]
            ctx_l = jnp.concatenate([e[0] for e in encs], axis=0) \
                .astype(self.dtype)
            pool_l = jnp.concatenate([e[1] for e in encs], axis=0) \
                .astype(self.dtype)
            local_w = jnp.asarray(local_prompt_weights(
                masks, mask_scales, height // 8, width // 8,
                local_blur_kernel_size, local_blur_sigma))
        ip_kwargs = None
        if ipadapter is not None and ipadapter_image_emb is not None:
            from goal_force_tpu.models.ipadapter import (
                ipadapter_kwargs_for_plan,
            )

            ip_kwargs = ipadapter_kwargs_for_plan(
                self.plan, ipadapter, jnp.asarray(ipadapter_image_emb),
                scale=ipadapter_scale)
        cn_params = cn_cond = cn_plan = None
        cn_task, cn_nhead = 3, 8
        if controlnet is not None and controlnet_image is not None:
            cn_params = dict(controlnet["params"])
            ct = dict(cn_params["cn_transformer"])
            cn_nhead = ct.pop("n_head")
            cn_params["cn_transformer"] = ct
            cn_plan = controlnet.get("plan")
            cn_plan = None if cn_plan is None else tuple(map(tuple, cn_plan))
            cn_task = controlnet.get("task_id", 3)
            cn_cond = jnp.asarray(controlnet_image, jnp.float32)[None] \
                .astype(self.dtype)
        add_ids = jnp.asarray(
            np.array([height, width, 0, 0, height, width], np.float32))
        acp = sched.alphas_cumprod
        for i in range(len(sched)):
            t = int(sched.timesteps[i])
            a_t = float(acp[t])
            a_prev = 1.0 if i + 1 >= len(sched) else \
                float(acp[int(sched.timesteps[i + 1])])
            w_e = math.sqrt(1 - a_prev) - math.sqrt(a_prev * (1 - a_t) / a_t)
            w_x = math.sqrt(a_prev / a_t)
            latents = self._step(self.unet, latents, float(t),
                                 ctx_p.astype(self.dtype),
                                 ctx_n.astype(self.dtype),
                                 pool_p.astype(self.dtype),
                                 pool_n.astype(self.dtype),
                                 add_ids, float(cfg_scale), w_x, w_e,
                                 tile_ctx=(tile_size, tile_stride)
                                 if tiled else None,
                                 ipadapter=ip_kwargs,
                                 ctx_locals=ctx_l, pool_locals=pool_l,
                                 local_w=local_w, cn=cn_params,
                                 cn_cond=cn_cond, cn_plan=cn_plan,
                                 cn_task=cn_task, cn_nhead=cn_nhead,
                                 ctx_len=ctx_len)
        if return_latents:
            return np.asarray(latents, np.float32)
        if tiled:
            from goal_force_tpu.models.tiler import tiled_forward_2d

            image = tiled_forward_2d(
                lambda z: self._decode(self.vae_decoder, z),
                latents, tile_size, tile_stride)
        else:
            image = self._decode(self.vae_decoder, latents)
        return np.clip((np.asarray(image[0], np.float32) + 1.0) / 2.0, 0.0, 1.0)

    @classmethod
    def from_pretrained(
        cls,
        unet_path,
        text_encoder_path=None,            # CLIP-L (diffsynth, no final LN)
        text_encoder_2_path=None,          # CLIP-G with projection
        vae_decoder_path=None,
        tokenizer="vendored",
        tokenizer_2="vendored",
        plan=None,
        groups: int = 32,
        vae_dec_plan=None,
        vae_groups: int = 32,
        dtype=jnp.float32,
        clip_num_heads=None,
    ) -> "SDXLPipeline":
        """Reference-format SDXL load (reference ModelManager SDXL hash rows;
        sdxl_prompter.py drives two CLIP tokenizers over the vendored
        stable_diffusion[-_xl] assets)."""
        from goal_force_tpu.io.auto import load_model

        to_dev = lambda tree: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), tree)
        plan = plan or SDXL_PLAN
        unet = load_model(unet_path, plan=plan)
        if unet["kind"] != "sdxl_unet":
            raise ValueError(f"{unet_path} detected as {unet['kind']!r}")
        te1_cfg, te1 = SDXL_TEXT_CONFIG, None
        if text_encoder_path is not None:
            r = load_model(text_encoder_path, num_heads=clip_num_heads)
            te1_cfg, te1 = r["config"], to_dev(r["params"])
        te2_cfg, te2 = SDXL_TEXT2_CONFIG, None
        if text_encoder_2_path is not None:
            r = load_model(text_encoder_2_path, num_heads=clip_num_heads)
            te2_cfg, te2 = r["config"], to_dev(r["params"])
        vae_dec = None
        dec_plan = vae_dec_plan or SD_VAE_DECODER_PLAN
        if vae_decoder_path is not None:
            vae_dec = to_dev(load_model(vae_decoder_path, plan=dec_plan)["params"])

        tok1, tok2 = tokenizer, tokenizer_2
        if tokenizer == "vendored" or tokenizer_2 == "vendored":
            from goal_force_tpu.prompters import sdxl_tokenizers

            v1, v2 = sdxl_tokenizers()
            tok1 = v1 if tokenizer == "vendored" else tokenizer
            tok2 = v2 if tokenizer_2 == "vendored" else tokenizer_2

        key = jax.random.PRNGKey(0)
        from goal_force_tpu.pipelines.flux import init_clip_text

        return cls(
            unet=to_dev(unet["params"]),
            text_encoder=te1 if te1 is not None else
            init_clip_text(key, te1_cfg, dtype),
            text_encoder_2=te2 if te2 is not None else
            init_clip_text(key, te2_cfg, dtype),
            vae_decoder=vae_dec,
            plan=plan, text_cfg=te1_cfg, text2_cfg=te2_cfg, groups=groups,
            vae_dec_plan=dec_plan, vae_groups=vae_groups,
            tokenize=tok1, tokenize_2=tok2, dtype=dtype,
        )

    @classmethod
    def init_random(cls, key=None, tiny: bool = True, dtype=jnp.float32):
        key = jax.random.PRNGKey(0) if key is None else key
        ks = jax.random.split(key, 4)
        if tiny:
            plan = (("res", 8, 8), ("push",), ("down", 8), ("push",),
                    ("res", 8, 16), ("attn", 2, 8, 16, 24, 2), ("res", 16, 16),
                    ("pop",), ("res", 24, 16), ("attn", 2, 8, 16, 24, 2),
                    ("up", 16), ("pop",), ("res", 24, 8))
            t1 = CLIPConfig(vocab_size=64, text_dim=8, text_heads=2,
                            text_layers=2, max_positions=12, image_size=14,
                            patch_size=7, vision_dim=16, vision_heads=2,
                            vision_layers=1, proj_dim=8)
            t2 = CLIPConfig(vocab_size=64, text_dim=16, text_heads=2,
                            text_layers=3, max_positions=12,
                            hidden_act="gelu", text_pooling="argmax",
                            image_size=14, patch_size=7, vision_dim=16,
                            vision_heads=2, vision_layers=1, proj_dim=16)
            unet = init_sdxl_unet(ks[0], plan, model_dim=8, time_dim=16,
                                  add_embed_in=16 + 6 * 256, dtype=dtype)
            groups = 4
            _, vae_d, _, dec_plan = _init_tiny_vae(ks[1], dtype)
        else:
            plan, t1, t2 = SDXL_PLAN, SDXL_TEXT_CONFIG, SDXL_TEXT2_CONFIG
            unet = init_sdxl_unet(ks[0], plan, dtype=dtype)
            groups = 32
            vae_d = _init_vae(ks[1], SD_VAE_DECODER_PLAN, 4, 3, 512, 128,
                              False, dtype)
            dec_plan = SD_VAE_DECODER_PLAN
        te1 = init_clip(ks[2], t1, dtype)
        te2 = init_clip(ks[3], t2, dtype)
        return cls(unet=unet, text_encoder=te1, text_encoder_2=te2,
                   vae_decoder=vae_d, plan=plan, text_cfg=t1, text2_cfg=t2,
                   groups=groups, vae_dec_plan=dec_plan, vae_groups=groups,
                   dtype=dtype)
