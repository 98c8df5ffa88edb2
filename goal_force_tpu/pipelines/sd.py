"""Stable Diffusion 1.5 text-to-image / image-to-image pipeline.

Mirrors the reference's SDImagePipeline denoise loop (reference:
diffsynth/pipelines/sd_image.py): CLIP text embeddings (with clip_skip),
classifier-free guidance over an epsilon-prediction UNet under the enhanced
DDIM schedule, SD VAE decode. TPU-native shape: ONE jitted CFG denoise step
reused for all steps (timestep and DDIM weights are passed as arrays), NHWC
everywhere, bf16 by default on TPU.

Weights load from the reference's diffsynth-format state dicts (see
models/sd_unet.py on the civitai conversion path); `init_random` builds a
random pipeline at either the tiny test plan or the real geometry.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.clip import CLIPConfig, init_clip
from goal_force_tpu.models.sd_text_encoder import SD_TEXT_CONFIG, sd_text_encode
from goal_force_tpu.models.sd_unet import (
    SD15_PLAN,
    init_sd_unet,
    sd_unet_apply,
    tiny_sd_plan,
)
from goal_force_tpu.models.sd_vae import (
    SD_VAE_DECODER_PLAN,
    SD_VAE_ENCODER_PLAN,
    sd_vae_decode,
    sd_vae_encode,
)
from goal_force_tpu.schedulers.ddim import (
    ddim_add_noise,
    make_ddim_schedule,
)


@dataclasses.dataclass
class SDPipeline:
    unet: Dict
    text_encoder: Dict
    vae_encoder: Optional[Dict]
    vae_decoder: Dict
    plan: Tuple = SD15_PLAN
    text_cfg: CLIPConfig = SD_TEXT_CONFIG
    groups: int = 32
    vae_enc_plan: Tuple = SD_VAE_ENCODER_PLAN
    vae_dec_plan: Tuple = SD_VAE_DECODER_PLAN
    vae_groups: int = 32
    tokenize: Optional[Callable[[str], np.ndarray]] = None
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        self._step = jax.jit(self._denoise_cfg,
                             static_argnames=("tile_ctx", "cn_plan"))
        self._decode = jax.jit(
            lambda p, z: sd_vae_decode(p, z, self.vae_dec_plan,
                                       groups=self.vae_groups))
        self._encode_img = jax.jit(
            lambda p, img: sd_vae_encode(p, img, self.vae_enc_plan,
                                         groups=self.vae_groups))
        self._encode_text = jax.jit(
            lambda p, ids, skip: sd_text_encode(p, ids, self.text_cfg,
                                                clip_skip=skip),
            static_argnums=2)

    # one CFG step: merged (posi, nega, local_1..L) batch — ONE XLA call per
    # step vs the reference's 2+L sequential model invocations — with epsilon
    # blended on host weights
    def _denoise_cfg(self, unet, latents, t, ctx_pos, ctx_neg, cfg_scale,
                     w_x, w_e, ipadapter=None, tile_ctx=None,
                     ctx_locals=None, local_w=None, cn=None, cn_cond=None,
                     cn_plan=None, ctx_len=None):
        b = latents.shape[0]
        rows = [ctx_pos, ctx_neg]
        if ctx_locals is not None:
            rows.append(ctx_locals)
        ctx = jnp.concatenate(rows, axis=0)
        n = ctx.shape[0] // b
        x2 = jnp.concatenate([latents] * n, axis=0)
        tfull = jnp.full((n * b,), t, latents.dtype)
        if ctx_len is not None:
            ctx_len = jnp.repeat(jnp.asarray(ctx_len, jnp.int32), b)
        cn_res = None
        if cn is not None:
            from goal_force_tpu.models.sd_controlnet import sd_controlnet_apply

            cond = jnp.concatenate([cn_cond] * n, axis=0)
            cn_kwargs = {} if cn_plan is None else {"plan": cn_plan}
            cn_res = sd_controlnet_apply(cn, x2, tfull, ctx, cond,
                                         groups=self.groups, ctx_len=ctx_len,
                                         **cn_kwargs)
        eps = sd_unet_apply(self.unet if unet is None else unet, self.plan,
                            x2, tfull, ctx,
                            groups=self.groups, ipadapter=ipadapter,
                            controlnet_res=cn_res, tile_ctx=tile_ctx,
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
            # deterministic hash-token fallback (zero-egress environments)
            rng = np.random.default_rng(abs(hash(prompt)) % (2**32))
            ids = rng.integers(1, self.text_cfg.vocab_size - 1,
                               (1, self.text_cfg.max_positions))
            return jnp.asarray(ids.astype(np.int32))
        ids = np.asarray(self.tokenize(prompt)).reshape(1, -1)
        return jnp.asarray(ids.astype(np.int32))

    def _long_ids(self, prompts: Sequence[str]) -> tuple:
        """Tokenize each prompt into (num_sentence, 77) chunks with a SHARED
        sentence count (reference sd_prompter.py:69 via tokenize_long_prompt;
        the shared count is ours — the merged-CFG batch needs equal context
        lengths where the reference runs posi/nega as separate calls).

        Also returns each prompt's NATURAL context length in tokens: the
        denoise step masks cross-attention keys past it (sd_unet._attention
        ctx_len), so a padded row computes exactly the reference's separate
        natural-length call — the pad sentences are never attended."""
        from goal_force_tpu.prompters import tokenize_long_prompt

        if self.tokenize is None or not hasattr(self.tokenize, "encode"):
            ids = [self._ids(p) for p in prompts]
            return ids, [i.shape[-1] for i in ids]
        chunked = [tokenize_long_prompt(self.tokenize, p) for p in prompts]
        nat_len = [c.size for c in chunked]
        ns = max(c.shape[0] for c in chunked)
        if ns > 1:
            chunked = [tokenize_long_prompt(self.tokenize, p, num_sentences=ns)
                       for p in prompts]
        return [jnp.asarray(c) for c in chunked], nat_len

    def _ctx(self, ids: jnp.ndarray, clip_skip: int) -> jnp.ndarray:
        """(num_sentence, 77) ids -> (1, num_sentence*77, dim) context
        (reference sd_prompter.py:70-72: per-sentence encode then flatten)."""
        h = self._encode_text(self.text_encoder, ids, clip_skip)
        return h.reshape(1, -1, h.shape[-1])

    def __call__(self,
                 prompt: str,
                 negative_prompt: str = "",
                 height: int = 512,
                 width: int = 512,
                 num_inference_steps: int = 20,
                 cfg_scale: float = 7.5,
                 clip_skip: int = 1,
                 input_image: Optional[np.ndarray] = None,
                 denoising_strength: float = 1.0,
                 seed: int = 0,
                 ipadapter: Optional[Dict] = None,
                 ipadapter_image_emb: Optional[np.ndarray] = None,
                 ipadapter_scale: float = 1.0,
                 local_prompts: Optional[Sequence[str]] = None,
                 masks: Optional[Sequence[np.ndarray]] = None,
                 mask_scales: Optional[Sequence[float]] = None,
                 local_blur_kernel_size: int = 33,
                 local_blur_sigma: float = 10.0,
                 controlnet: Optional[Dict] = None,     # {"params", ...}
                 controlnet_image: Optional[np.ndarray] = None,  # (H, W, 3) [0,1]
                 tiled: bool = False,
                 tile_size: int = 64,
                 tile_stride: int = 32,
                 return_latents: bool = False) -> np.ndarray:
        """-> (H, W, 3) float image in [0, 1].

        ipadapter: SD IP-Adapter params (models/ipadapter.py) driven by the
        CLIP image embedding ipadapter_image_emb (B, clip_dim); the image K/V
        are injected into every mapped cross-attention unit.

        local_prompts/masks/mask_scales: regional prompting (reference
        sd_image.py:94,137,170 via base.py control_noise_via_local_prompts):
        each local prompt denoises the same latents and the positive epsilon is
        mask-blended before CFG; masks are (H, W[, C]) floats in [0, 1]. The
        blur defaults (33, 10) match the reference; shrink for tiny latents.

        controlnet + controlnet_image: SD ControlNet residuals added to the
        UNet skip stack each step for every prompt row (reference
        sd_image.py:149-157, lets_dance controlnet path).

        tiled: the reference's spatial tiling (sd_image.py:108-118): the VAE
        encode/decode run per overlapping tile and every UNet transformer block
        attends within (tile_size, tile_size) tiles of its resolution, blended
        with the border-ramp mask. tile_size is in PIXELS for the VAE encode and
        in LATENT units for the UNet/decode, as in the reference."""
        import math

        from goal_force_tpu.models.tiler import tiled_forward_2d

        sched = make_ddim_schedule(num_inference_steps,
                                   denoising_strength=denoising_strength
                                   if input_image is not None else 1.0)
        key = jax.random.PRNGKey(seed)
        h8, w8 = height // 8, width // 8
        noise = jax.random.normal(key, (1, h8, w8, 4), self.dtype)
        if input_image is not None:
            img = jnp.asarray(np.asarray(input_image, np.float32) / 127.5 - 1.0,
                              self.dtype)[None]
            if tiled:
                z = tiled_forward_2d(
                    lambda crop: self._encode_img(self.vae_encoder, crop),
                    img, tile_size, tile_stride).astype(self.dtype)
            else:
                z = self._encode_img(self.vae_encoder, img)
            latents = ddim_add_noise(sched, z, noise, int(sched.timesteps[0]))
            latents = latents.astype(self.dtype)
        else:
            latents = noise

        all_ids, nat_len = self._long_ids([prompt, negative_prompt,
                                           *(local_prompts or [])])
        ctx_len = None
        if len(set(nat_len)) > 1:
            ctx_len = jnp.asarray(nat_len, jnp.int32)
        ctx_pos = self._ctx(all_ids[0], clip_skip).astype(self.dtype)
        ctx_neg = self._ctx(all_ids[1], 1).astype(self.dtype)
        ctx_locals = local_w = None
        if local_prompts:
            from goal_force_tpu.pipelines.regional import local_prompt_weights

            ctx_locals = jnp.concatenate([
                self._ctx(ids, clip_skip)
                for ids in all_ids[2:]], axis=0).astype(self.dtype)
            local_w = jnp.asarray(local_prompt_weights(
                masks, mask_scales, h8, w8,
                local_blur_kernel_size, local_blur_sigma))

        cn_params = cn_cond = cn_plan = None
        if controlnet is not None and controlnet_image is not None:
            cn_params = controlnet["params"]
            cn_plan = controlnet.get("plan")
            cn_plan = None if cn_plan is None else tuple(map(tuple, cn_plan))
            cn_cond = jnp.asarray(controlnet_image, jnp.float32)[None] \
                .astype(self.dtype)

        ip_kwargs = None
        if ipadapter is not None and ipadapter_image_emb is not None:
            from goal_force_tpu.models.ipadapter import (
                ipadapter_kwargs_for_plan,
            )

            ip_kwargs = ipadapter_kwargs_for_plan(
                self.plan, ipadapter, jnp.asarray(ipadapter_image_emb),
                scale=ipadapter_scale)

        acp = sched.alphas_cumprod
        for i in range(len(sched)):
            t = int(sched.timesteps[i])
            a_t = float(acp[t])
            a_prev = 1.0 if i + 1 >= len(sched) else \
                float(acp[int(sched.timesteps[i + 1])])
            w_e = math.sqrt(1 - a_prev) - math.sqrt(a_prev * (1 - a_t) / a_t)
            w_x = math.sqrt(a_prev / a_t)
            latents = self._step(self.unet, latents, float(t), ctx_pos,
                                 ctx_neg, float(cfg_scale), w_x, w_e,
                                 ip_kwargs,
                                 tile_ctx=(tile_size, tile_stride)
                                 if tiled else None,
                                 ctx_locals=ctx_locals, local_w=local_w,
                                 cn=cn_params, cn_cond=cn_cond,
                                 cn_plan=cn_plan, ctx_len=ctx_len)
        if return_latents:
            return np.asarray(latents, np.float32)
        if tiled:
            image = tiled_forward_2d(
                lambda z: self._decode(self.vae_decoder, z),
                latents, tile_size, tile_stride)
        else:
            image = self._decode(self.vae_decoder, latents)
        return np.clip((np.asarray(image[0], np.float32) + 1.0) / 2.0, 0.0, 1.0)

    @classmethod
    def from_pretrained(
        cls,
        unet_path,                         # diffsynth unet OR bundled civitai
        text_encoder_path=None,
        vae_encoder_path=None,
        vae_decoder_path=None,
        tokenizer="vendored",
        plan=None,
        groups: int = 32,
        vae_plans=None,                    # (enc_plan, dec_plan, groups)
        dtype=jnp.float32,
        clip_num_heads=None,
    ) -> "SDPipeline":
        """Reference-format SD-1.5 load: either one bundled civitai checkpoint
        (split by prefix, reference ModelManager hash rows) or separate
        diffsynth-format files; real CLIP tokenizer by default (reference
        sd_prompter.py over tokenizer_configs/stable_diffusion)."""
        from goal_force_tpu.io.auto import load_model, load_weights
        from goal_force_tpu.io.detect import detect_model_kind

        tok = tokenizer
        if tokenizer == "vendored":
            from goal_force_tpu.prompters import sd_clip_tokenizer

            tok = sd_clip_tokenizer()

        sd = load_weights(unet_path)
        if detect_model_kind(sd) == "sd_civitai":
            pipe = sd_pipeline_from_civitai(sd, tokenize=tok, dtype=dtype)
            return pipe
        to_dev = lambda tree: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), tree)
        plan = plan or SD15_PLAN
        enc_plan, dec_plan, vgroups = vae_plans or \
            (SD_VAE_ENCODER_PLAN, SD_VAE_DECODER_PLAN, 32)
        unet = load_model(sd, plan=plan)
        text_cfg, text = SD_TEXT_CONFIG, None
        if text_encoder_path is not None:
            r = load_model(text_encoder_path, num_heads=clip_num_heads)
            text_cfg, text = r["config"], to_dev(r["params"])
        vae_enc = vae_dec = None
        if vae_encoder_path is not None:
            vae_enc = to_dev(load_model(vae_encoder_path, plan=enc_plan)["params"])
        if vae_decoder_path is not None:
            vae_dec = to_dev(load_model(vae_decoder_path, plan=dec_plan)["params"])
        if text is None:
            text = init_clip(jax.random.PRNGKey(0), text_cfg, dtype)["text"]
            text = {"text": text}
        return cls(
            unet=to_dev(unet["params"]), text_encoder=text,
            vae_encoder=vae_enc, vae_decoder=vae_dec,
            plan=plan, text_cfg=text_cfg, groups=groups,
            vae_enc_plan=enc_plan, vae_dec_plan=dec_plan, vae_groups=vgroups,
            tokenize=tok, dtype=dtype,
        )

    @classmethod
    def init_random(cls, key=None, tiny: bool = True, dtype=jnp.float32):
        """Random-weight pipeline (tests / smoke); tiny=False builds the real
        860M SD-1.5 geometry."""
        key = jax.random.PRNGKey(0) if key is None else key
        ks = jax.random.split(key, 4)
        if tiny:
            plan = tiny_sd_plan(ctx_dim=32)
            text_cfg = CLIPConfig(vocab_size=64, text_dim=32, text_heads=4,
                                  text_layers=2, max_positions=12,
                                  image_size=14, patch_size=7, vision_dim=16,
                                  vision_heads=2, vision_layers=1, proj_dim=16)
            unet = init_sd_unet(ks[0], plan, model_dim=8, time_dim=16, dtype=dtype)
            groups = 4
            vae_e, vae_d, enc_plan, dec_plan = _init_tiny_vae(ks[1], dtype)
        else:
            plan = SD15_PLAN
            text_cfg = SD_TEXT_CONFIG
            unet = init_sd_unet(ks[0], plan, dtype=dtype)
            groups = 32
            vae_e = _init_vae(ks[1], SD_VAE_ENCODER_PLAN, 3, 8, 128, 512,
                              True, dtype)
            vae_d = _init_vae(ks[2], SD_VAE_DECODER_PLAN, 4, 3, 512, 128,
                              False, dtype)
            enc_plan, dec_plan = SD_VAE_ENCODER_PLAN, SD_VAE_DECODER_PLAN
        text = init_clip(ks[3], text_cfg, dtype)
        return cls(unet=unet, text_encoder=text, vae_encoder=vae_e,
                   vae_decoder=vae_d, plan=plan, text_cfg=text_cfg,
                   groups=groups, vae_enc_plan=enc_plan,
                   vae_dec_plan=dec_plan,
                   vae_groups=groups, dtype=dtype)


def _init_vae(key, plan, c_in, c_out, dim_in, dim_out, is_encoder, dtype):
    ks = iter(jax.random.split(key, 4 * len(plan) + 8))
    n = lambda *s: jax.random.normal(next(ks), s, dtype) * 0.02
    norm = lambda c: {"scale": jnp.ones(c, dtype), "bias": jnp.zeros(c, dtype)}
    conv = lambda ci, co, k=3: {"w": n(k, k, ci, co), "b": jnp.zeros(co, dtype)}
    blocks = []
    for spec in plan:
        kind = spec[0]
        if kind == "res":
            _, ci, co = spec
            p = {"norm1": norm(ci), "conv1": conv(ci, co),
                 "norm2": norm(co), "conv2": conv(co, co)}
            if ci != co:
                p["shortcut"] = conv(ci, co, 1)
            blocks.append(p)
        elif kind == "vattn":
            c = spec[1]
            blocks.append({"norm": norm(c), "attn": {
                "q_w": n(c, c), "q_b": jnp.zeros(c, dtype),
                "k_w": n(c, c), "k_b": jnp.zeros(c, dtype),
                "v_w": n(c, c), "v_b": jnp.zeros(c, dtype),
                "o_w": n(c, c), "o_b": jnp.zeros(c, dtype)}})
        elif kind in ("downe", "up"):
            blocks.append({"conv": conv(spec[1], spec[1])})
    params = {"conv_in": conv(c_in, dim_in), "blocks": blocks,
              "conv_norm_out": norm(dim_out),
              "conv_out": conv(dim_out, 8 if is_encoder else c_out)}
    if is_encoder:
        params["quant_conv"] = conv(8, 8, 1)
    else:
        params["post_quant_conv"] = conv(4, 4, 1)
    return params


def _init_tiny_vae(key, dtype):
    enc_plan = (("res", 8, 8), ("downe", 8), ("res", 8, 8), ("downe", 8),
                ("res", 8, 8), ("downe", 8), ("vattn", 8))
    dec_plan = (("vattn", 8), ("res", 8, 8), ("up", 8), ("res", 8, 8),
                ("up", 8), ("res", 8, 8), ("up", 8))
    ks = jax.random.split(key, 2)
    enc = _init_vae(ks[0], enc_plan, 3, 8, 8, 8, True, dtype)
    dec = _init_vae(ks[1], dec_plan, 4, 3, 8, 8, False, dtype)
    return enc, dec, enc_plan, dec_plan


def sd_pipeline_from_civitai(path, tokenize=None,
                             dtype=jnp.float32) -> SDPipeline:
    """Build an SDPipeline from ONE bundled civitai SD-1.5 checkpoint
    (safetensors, pth, or an already-loaded dict: `model.diffusion_model.*`
    UNet + `cond_stage_model.*` CLIP text + `first_stage_model.*` VAE — the
    format the reference's ModelManager splits by hash; here split by prefix)."""
    from goal_force_tpu.io.safetensors_io import load_safetensors, load_torch_pth
    from goal_force_tpu.models.sd_text_encoder import sd_text_params_from_civitai
    from goal_force_tpu.models.sd_unet import sd_unet_params_from_civitai
    from goal_force_tpu.models.sd_vae import (
        sd_vae_decoder_params_from_civitai,
        sd_vae_encoder_params_from_civitai,
    )

    if isinstance(path, dict):
        sd = path
    else:
        sd = (load_safetensors(path) if path.endswith(".safetensors")
              else load_torch_pth(path))
    to_dev = lambda tree: jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, dtype), tree)
    return SDPipeline(
        unet=to_dev(sd_unet_params_from_civitai(sd)),
        text_encoder=to_dev(sd_text_params_from_civitai(sd)),
        vae_encoder=to_dev(sd_vae_encoder_params_from_civitai(sd)),
        vae_decoder=to_dev(sd_vae_decoder_params_from_civitai(sd)),
        tokenize=tokenize, dtype=dtype)
