"""Qwen-Image text-to-image pipeline.

Mirrors /root/reference/diffsynth/pipelines/qwen_image.py: FlowMatch scheduler
with exponential dynamic shift (sigma 0..1, extra_one_step, shift_terminal
0.02, mu from the latent sequence length :57, :399), Qwen2.5-VL prompt
encoding through a chat template whose first drop_idx=34 tokens are discarded
(:528-551), true classifier-free guidance, and the Wan-style Qwen-Image VAE.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.qwen_image_dit import (
    QwenImageDiTConfig,
    init_qwen_image_dit,
    qwen_image_dit_forward,
    qwen_unpatchify,
)
from goal_force_tpu.models.qwen_vl import (
    QwenVLTextConfig,
    get_rope_index,
    qwen_vl_text_forward,
)
from goal_force_tpu.schedulers import flow_match

QWEN_IMAGE_TEMPLATE = (
    "<|im_start|>system\nDescribe the image by detailing the color, shape, "
    "size, texture, quantity, text, spatial relationships of the objects and "
    "background:<|im_end|>\n<|im_start|>user\n{}<|im_end|>\n"
    "<|im_start|>assistant\n")
QWEN_IMAGE_DROP_IDX = 34
# Qwen-Image-Edit template (reference QwenImageUnit_PromptEmbedder :536-537)
QWEN_IMAGE_EDIT_TEMPLATE = (
    "<|im_start|>system\nDescribe the key features of the input image (color, "
    "shape, size, texture, objects, background), then explain how the user's "
    "text instruction should alter or modify the image. Generate a new image "
    "that meets the user's requirements while maintaining consistency with "
    "the original input where appropriate.<|im_end|>\n<|im_start|>user\n"
    "<|vision_start|><|image_pad|><|vision_end|>{}<|im_end|>\n"
    "<|im_start|>assistant\n")
QWEN_IMAGE_EDIT_DROP_IDX = 64
# Qwen2.5-VL special token ids (tokenizer_config vocabulary)
QWEN_VISION_START_ID = 151652
QWEN_IMAGE_PAD_ID = 151655


@dataclasses.dataclass
class QwenImagePipeline:
    dit: Dict
    text_encoder: Dict
    vae_encoder: Optional[Dict]
    vae_decoder: Dict
    dit_cfg: QwenImageDiTConfig
    text_cfg: QwenVLTextConfig
    vae_cfg: object = None
    tokenize: Optional[Callable] = None
    dtype: object = jnp.bfloat16
    vae_factor: int = 8
    vision_encoder: Optional[Dict] = None   # Qwen2.5-VL vision tower (edit)
    vision_cfg: object = None
    image_pad_id: int = QWEN_IMAGE_PAD_ID
    vision_start_id: int = QWEN_VISION_START_ID

    @classmethod
    def from_pretrained(
        cls,
        dit_path,
        text_encoder_path=None,            # Qwen2.5-VL text tower
        vae_path=None,                     # Wan-architecture 16ch VAE
        vae_cfg=None,
        tokenizer_dir=None,                # Qwen fast tokenizer (with ckpt)
        qwen_length: int = 512,
        dtype=jnp.bfloat16,
        text_num_heads=None,
        load_vision: bool = False,         # Qwen-Image-Edit: vision tower too
        vision_cfg=None,
        **infer_kw,                        # axes_dim for tiny DiT files
    ) -> "QwenImagePipeline":
        """Qwen-Image 'load weights, generate' (reference ModelManager rows;
        the prompter tokenizes with the Qwen2.5-VL tokenizer shipped next to
        the text-encoder weights — pass its dir via `tokenizer_dir`)."""
        from goal_force_tpu.io.auto import load_model, load_weights

        to_dev = lambda tree: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), tree)
        dit = load_model(dit_path, **infer_kw)
        if dit["kind"] != "qwen_image_dit":
            raise ValueError(f"{dit_path} detected as {dit['kind']!r}")
        text_cfg, text = None, None
        vision, vcfg_vis = None, None
        if text_encoder_path is not None:
            r = load_model(text_encoder_path, num_heads=text_num_heads)
            text_cfg, text = r["config"], to_dev(r["params"])
            if load_vision:
                from goal_force_tpu.models.qwen_vl import (
                    QwenVLVisionConfig,
                    qwen_vl_vision_params_from_torch,
                )

                sd = load_weights(text_encoder_path)
                vis_keys = [k for k in sd if "visual." in k]
                if not vis_keys:
                    raise ValueError(
                        f"{text_encoder_path} has no visual.* weights; "
                        "Qwen-Image-Edit needs the full Qwen2.5-VL checkpoint")
                vprefix = vis_keys[0].split("visual.")[0] + "visual."
                sd_vis = {"visual." + k[len(vprefix):]: v
                          for k, v in sd.items() if k.startswith(vprefix)}
                vcfg_vis = vision_cfg or QwenVLVisionConfig()
                vision = to_dev(qwen_vl_vision_params_from_torch(sd_vis, vcfg_vis))
        vae, vcfg = None, vae_cfg
        if vae_path is not None:
            from goal_force_tpu.models.qwen_image_vae import (
                QWEN_IMAGE_VAE_CONFIG,
                qwen_image_vae_params_from_torch,
            )

            vcfg = vae_cfg or QWEN_IMAGE_VAE_CONFIG
            vae = to_dev(qwen_image_vae_params_from_torch(
                load_weights(vae_path), vcfg))
        tok = None
        if tokenizer_dir is not None:
            from goal_force_tpu.prompters import load_text_tokenizer

            tok = load_text_tokenizer(tokenizer_dir, qwen_length)
        if text is None:
            raise ValueError("text_encoder_path is required (the DiT consumes "
                             "Qwen2.5-VL hidden states)")
        return cls(dit=to_dev(dit["params"]), text_encoder=text,
                   vae_encoder=vae, vae_decoder=vae,
                   dit_cfg=dit["config"], text_cfg=text_cfg, vae_cfg=vcfg,
                   tokenize=tok, dtype=dtype,
                   vae_factor=2 ** (len(vcfg.dim_mult) - 1) if vcfg else 8,
                   vision_encoder=vision, vision_cfg=vcfg_vis)

    @classmethod
    def init_random(cls, key=None, dtype=jnp.float32) -> "QwenImagePipeline":
        from goal_force_tpu.configs import VAEConfig
        from goal_force_tpu.models.vae import init_vae

        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        dit_cfg = QwenImageDiTConfig(dim=48, num_heads=3, head_dim=16,
                                     num_layers=2, text_dim=24,
                                     axes_dim=(4, 6, 6))
        txt_cfg = QwenVLTextConfig(hidden_size=24, num_layers=2, num_heads=2,
                                   num_kv_heads=2, intermediate_size=32,
                                   vocab=128, mrope_section=(3, 2, 1))
        dit = init_qwen_image_dit(ks[0], dit_cfg, dtype=dtype)
        text = _init_tiny_qwen_text(ks[1], txt_cfg, dtype)
        vae_cfg = VAEConfig(dim=8, z_dim=dit_cfg.in_dim // 4, dim_mult=(1, 2),
                            num_res_blocks=1,
                            temporal_downsample=(False,),
                            upsampling_factor=2)
        vae = init_vae(ks[2], vae_cfg, dtype)
        return cls(dit=dit, text_encoder=text, vae_encoder=vae,
                   vae_decoder=vae, dit_cfg=dit_cfg, text_cfg=txt_cfg,
                   vae_cfg=vae_cfg, dtype=dtype, vae_factor=2)

    @functools.cached_property
    def _denoise(self):
        cfg = self.dit_cfg

        @functools.partial(jax.jit, static_argnames=("rope_interpolate",))
        def fn(dit, latents, t, ctx_p, ctx_n, cfg_scale, cn=None, cn_cond=None,
               extra_latents=None, ent_p=None, ent_n=None, ent_masks=None,
               rope_interpolate=False):
            vp = qwen_image_dit_forward(dit, cfg, latents, t, ctx_p,
                                        controlnet=cn, controlnet_cond=cn_cond,
                                        extra_latents=extra_latents,
                                        entity_prompt_embs=ent_p,
                                        entity_masks=ent_masks if ent_p else None,
                                        rope_interpolate=rope_interpolate)
            vn = qwen_image_dit_forward(dit, cfg, latents, t, ctx_n,
                                        controlnet=cn, controlnet_cond=cn_cond,
                                        extra_latents=extra_latents,
                                        entity_prompt_embs=ent_n,
                                        entity_masks=ent_masks if ent_n else None,
                                        rope_interpolate=rope_interpolate)
            return vn + cfg_scale * (vp - vn)

        return fn

    def _encode_prompt(self, prompt: str, edit_image=None) -> jnp.ndarray:
        """Qwen2.5-VL hidden states for the templated prompt; with edit_image,
        the Qwen-Image-Edit template + vision tokens (reference
        QwenImageUnit_PromptEmbedder :528-566)."""
        from goal_force_tpu.pipelines.flux import _hash_ids

        img_feats, grid = None, []
        if edit_image is None:
            text = QWEN_IMAGE_TEMPLATE.format(prompt)
            drop_idx = QWEN_IMAGE_DROP_IDX
        else:
            if self.vision_encoder is None:
                raise ValueError(
                    "edit_image prompt encoding needs the Qwen2.5-VL vision "
                    "tower: from_pretrained(..., load_vision=True)")
            from goal_force_tpu.models.qwen_vl import (
                preprocess_image_for_vision,
                qwen_vl_vision_forward,
            )

            text = QWEN_IMAGE_EDIT_TEMPLATE.format(prompt)
            drop_idx = QWEN_IMAGE_EDIT_DROP_IDX
            patches, g = preprocess_image_for_vision(
                np.asarray(edit_image, np.float32), self.vision_cfg)
            grid = [g]
            img_feats = qwen_vl_vision_forward(
                self.vision_encoder, self.vision_cfg,
                jnp.asarray(patches, self.dtype), grid)
        if self.tokenize is not None:
            ids = np.asarray(self.tokenize(text), np.int64)
        else:
            ids = _hash_ids(text, self.text_cfg.vocab, 48).astype(np.int64)
        if edit_image is not None:
            # expand the single <|image_pad|> to one token per merged patch
            # (the HF processor's image placeholder expansion)
            where = np.nonzero(ids == self.image_pad_id)[0]
            if len(where) != 1:
                raise ValueError(
                    "tokenizer did not produce exactly one <|image_pad|> id "
                    f"({self.image_pad_id}); found {len(where)} — pass the "
                    "Qwen2.5-VL tokenizer dir shipped with the text encoder")
            m2 = self.vision_cfg.spatial_merge_size ** 2
            n_img = (grid[0][1] * grid[0][2]) // m2
            ids = np.concatenate([ids[:where[0]],
                                  np.full((n_img,), self.image_pad_id, np.int64),
                                  ids[where[0] + 1:]])
        ids2 = jnp.asarray(ids[None], jnp.int32)
        pos = get_rope_index(np.asarray(ids2), grid,
                             image_token_id=self.image_pad_id,
                             vision_start_token_id=self.vision_start_id)
        if img_feats is not None:
            from goal_force_tpu.models.qwen_vl import qwen_vl_embed

            emb = qwen_vl_embed(self.text_encoder, self.text_cfg, ids2,
                                img_feats.astype(self.dtype),
                                self.image_pad_id).astype(self.dtype)
        else:
            emb = jnp.asarray(self.text_encoder["wte"])[ids2].astype(self.dtype)
        hidden = qwen_vl_text_forward(self.text_encoder, self.text_cfg, emb,
                                      jnp.ones_like(ids2), jnp.asarray(pos))
        drop = min(drop_idx, hidden.shape[1] - 1)
        return hidden[:, drop:]

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 4.0,
        height: int = 1328,
        width: int = 1328,
        num_inference_steps: int = 30,
        seed: int = 0,
        input_image: Optional[np.ndarray] = None,    # (H, W, 3) in [0,1]
        denoising_strength: float = 1.0,
        controlnet: Optional[Dict] = None,           # blockwise cn params
        controlnet_image: Optional[np.ndarray] = None,
        edit_image: Optional[np.ndarray] = None,     # Qwen-Image-Edit (H,W,3)
        edit_image_auto_resize: bool = True,
        edit_rope_interpolation: bool = False,
        context_image: Optional[np.ndarray] = None,  # in-context control
        inpaint_mask: Optional[np.ndarray] = None,   # (H, W) float [0,1]
        inpaint_blur_size: Optional[int] = None,
        inpaint_blur_sigma: Optional[float] = None,
        eligen_entity_prompts=None,                  # list[str]
        eligen_entity_masks=None,                    # (M, H, W) float [0,1]
        eligen_enable_on_negative: bool = False,
        exponential_shift_mu: Optional[float] = None,
        tiled: bool = False,
        tile_size: int = 128,
        tile_stride: int = 64,
        return_latents: bool = False,
    ) -> np.ndarray:
        # tiled: spatially tiled VAE encode/decode. The reference pipeline
        # forwards tiled/tile_size/tile_stride (qwen_image.py:392-394,444) to a
        # VAE whose **kwargs silently DROP them (qwen_image_vae.py:707-724);
        # here they are honored via the Wan-VAE tiled coders, with the
        # pixel-unit tile_size mapped to latent units (//vae_factor).
        from goal_force_tpu.models.vae import (
            decode_video,
            decode_video_tiled,
            encode_video,
            encode_video_tiled,
        )

        lt = lambda v: (max(v // self.vae_factor, 1),) * 2

        schedule = flow_match.make_schedule(
            num_inference_steps, sigma_min=0.0, sigma_max=1.0,
            extra_one_step=True, exponential_shift=True,
            shift_terminal=0.02, denoising_strength=denoising_strength,
            exponential_shift_mu=exponential_shift_mu,
            dynamic_shift_len=(height // 16) * (width // 16))

        if edit_image is not None and edit_image_auto_resize:
            edit_image = _edit_auto_resize(edit_image)
        # the edit template (+vision tokens) applies to BOTH CFG branches
        # (reference PromptEmbedder is seperate_cfg with shared edit_image)
        ctx_p = self._encode_prompt(prompt, edit_image=edit_image).astype(self.dtype)
        ctx_n = self._encode_prompt(negative_prompt,
                                    edit_image=edit_image).astype(self.dtype)
        if ctx_p.shape[1] != ctx_n.shape[1]:
            L = max(ctx_p.shape[1], ctx_n.shape[1])
            pad = lambda c: jnp.pad(c, ((0, 0), (0, L - c.shape[1]), (0, 0)))
            ctx_p, ctx_n = pad(ctx_p), pad(ctx_n)

        h, w = height // self.vae_factor, width // self.vae_factor
        latents = jax.random.normal(
            jax.random.PRNGKey(seed),
            (1, h, w, self.dit_cfg.in_dim // 4), jnp.float32).astype(self.dtype)

        def enc(img01):
            x = jnp.asarray(img01, jnp.float32)[None] * 2.0 - 1.0
            if tiled:
                return encode_video_tiled(
                    self.vae_encoder, self.vae_cfg, x[:, None],
                    lt(tile_size), lt(tile_stride))[:, 0].astype(self.dtype)
            return encode_video(self.vae_encoder, self.vae_cfg,
                                x[:, None])[:, 0].astype(self.dtype)

        input_latents = None
        if input_image is not None:
            input_latents = enc(input_image)
            latents = flow_match.add_noise(input_latents, latents,
                                           schedule.sigmas[0])
        if inpaint_mask is not None:
            if input_latents is None:
                raise ValueError("inpaint_mask requires input_image")
            im = _inpaint_mask_latent(inpaint_mask, h, w, inpaint_blur_size,
                                      inpaint_blur_sigma)
            im = jnp.asarray(im, jnp.float32)[None, ..., None]  # (1, h, w, 1)

        # context/edit conditioning images ride as extra image tokens
        # (reference model_fn_qwen_image :768-776; context first, then edit)
        extra_latents = []
        if context_image is not None:
            extra_latents.append(enc(context_image))
        if edit_image is not None:
            extra_latents.append(enc(edit_image))
        extra_latents = extra_latents or None

        ent_p = ent_n = ent_masks = None
        if eligen_entity_prompts:
            # per-entity true-length embeddings (reference EntityControl unit)
            ent_p = [self._encode_prompt(p_).astype(self.dtype)
                     for p_ in eligen_entity_prompts]
            masks = np.asarray(eligen_entity_masks, np.float32)
            yi = np.minimum((np.floor((np.arange(h) + 0.5) * masks.shape[1] / h))
                            .astype(int), masks.shape[1] - 1)
            xi = np.minimum((np.floor((np.arange(w) + 0.5) * masks.shape[2] / w))
                            .astype(int), masks.shape[2] - 1)
            ent_masks = jnp.asarray(
                (masks[:, yi][:, :, xi] > 0.5).astype(np.float32)[None])
            if eligen_enable_on_negative and cfg_scale != 1.0:
                ent_n = [ctx_n] * len(ent_p)

        cn_cond = None
        if controlnet is not None and controlnet_image is not None:
            cz = enc(controlnet_image)
            gh, gw = h // 2, w // 2
            cn_cond = cz.reshape(1, gh, 2, gw, 2, cz.shape[-1]) \
                .transpose(0, 1, 3, 5, 2, 4).reshape(1, gh * gw, -1) \
                .astype(self.dtype)

        for i in range(len(schedule)):
            t = jnp.full((1,), schedule.sigmas[i], self.dtype)
            tok = self._denoise(self.dit, latents, t, ctx_p, ctx_n,
                                float(cfg_scale), controlnet, cn_cond,
                                extra_latents, ent_p, ent_n, ent_masks,
                                rope_interpolate=edit_rope_interpolation)
            c = latents.shape[-1]
            gh, gw = h // 2, w // 2
            v = tok.reshape(1, gh, gw, c, 2, 2).transpose(0, 1, 4, 2, 5, 3) \
                .reshape(1, h, w, c)
            v = v.astype(latents.dtype)
            if inpaint_mask is not None:
                # blend toward the "expected" velocity on protected pixels
                # (reference BasePipeline.step :148-154 + return_to_timestep)
                v_keep = (latents - input_latents) / schedule.sigmas[i]
                v = v_keep * (1 - im) + v * im
            latents = flow_match.euler_step(latents, v.astype(latents.dtype),
                                            schedule.sigmas[i],
                                            schedule.sigma_next(i))
        if return_latents:
            return np.asarray(latents, np.float32)
        if tiled:
            img = decode_video_tiled(self.vae_decoder, self.vae_cfg,
                                     latents.astype(jnp.float32)[:, None],
                                     lt(tile_size), lt(tile_stride))[:, 0]
        else:
            img = decode_video(self.vae_decoder, self.vae_cfg,
                               latents.astype(jnp.float32)[:, None])[:, 0]
        return np.asarray((img[0] + 1.0) / 2.0, np.float32).clip(0.0, 1.0)


def _edit_auto_resize(image01: np.ndarray) -> np.ndarray:
    """Resize to ~1024^2 pixels at the same aspect, multiples of 32
    (reference QwenImageUnit_EditImageEmbedder :698-710)."""
    import math

    from PIL import Image

    h0, w0 = image01.shape[:2]
    ratio = w0 / h0
    w = math.sqrt(1024 * 1024 * ratio)
    h = w / ratio
    w, h = round(w / 32) * 32, round(h / 32) * 32
    pil = Image.fromarray((np.clip(image01, 0, 1) * 255).astype(np.uint8))
    return np.asarray(pil.resize((w, h)), np.float32) / 255.0


def _inpaint_mask_latent(mask01: np.ndarray, h: int, w: int,
                         blur_size: Optional[int],
                         blur_sigma: Optional[float]) -> np.ndarray:
    """(H, W) pixel mask -> (h, w) latent mask with optional Gaussian blur
    (reference QwenImageUnit_Inpaint :499-508)."""
    from PIL import Image

    m = np.asarray(mask01, np.float32)
    if m.ndim == 3:
        m = m.mean(axis=-1)
    pil = Image.fromarray((np.clip(m, 0, 1) * 255).astype(np.uint8))
    m = np.asarray(pil.resize((w, h)), np.float32) / 255.0
    if blur_size is not None and blur_sigma is not None:
        try:
            import cv2

            k = blur_size * 2 + 1
            m = cv2.GaussianBlur(m, (k, k), blur_sigma)
        except ImportError:
            from scipy.ndimage import gaussian_filter

            m = gaussian_filter(m, blur_sigma, truncate=blur_size / blur_sigma)
    return m


def _init_tiny_qwen_text(key, cfg: QwenVLTextConfig, dtype):
    d, hd = cfg.hidden_size, cfg.head_dim
    ks = jax.random.split(key, cfg.num_layers + 2)
    lin = lambda k, di, do, b=True: (
        {"w": jax.random.normal(k, (di, do), dtype) * 0.02,
         "b": jnp.zeros((do,), dtype)} if b else
        {"w": jax.random.normal(k, (di, do), dtype) * 0.02})

    def block(k):
        kk = jax.random.split(k, 7)
        return {
            "norm1": {"w": jnp.ones((d,), dtype)},
            "norm2": {"w": jnp.ones((d,), dtype)},
            "q": lin(kk[0], d, cfg.num_heads * hd),
            "k": lin(kk[1], d, cfg.num_kv_heads * hd),
            "v": lin(kk[2], d, cfg.num_kv_heads * hd),
            "o": lin(kk[3], cfg.num_heads * hd, d, b=False),
            "gate": lin(kk[4], d, cfg.intermediate_size, b=False),
            "up": lin(kk[5], d, cfg.intermediate_size, b=False),
            "down": lin(kk[6], cfg.intermediate_size, d, b=False),
        }

    blocks = [block(k) for k in ks[:cfg.num_layers]]
    return {
        "wte": jax.random.normal(ks[-1], (cfg.vocab, d), dtype) * 0.02,
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        "final_norm": {"w": jnp.ones((d,), dtype)},
    }
