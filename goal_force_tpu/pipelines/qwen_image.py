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
        if text_encoder_path is not None:
            r = load_model(text_encoder_path, num_heads=text_num_heads)
            text_cfg, text = r["config"], to_dev(r["params"])
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
                   vae_factor=2 ** (len(vcfg.dim_mult) - 1) if vcfg else 8)

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
                            temporal_downsample=(False,))
        vae = init_vae(ks[2], vae_cfg, dtype)
        return cls(dit=dit, text_encoder=text, vae_encoder=vae,
                   vae_decoder=vae, dit_cfg=dit_cfg, text_cfg=txt_cfg,
                   vae_cfg=vae_cfg, dtype=dtype, vae_factor=2)

    @functools.cached_property
    def _denoise(self):
        cfg = self.dit_cfg

        @jax.jit
        def fn(dit, latents, t, ctx_p, ctx_n, cfg_scale, cn=None, cn_cond=None):
            vp = qwen_image_dit_forward(dit, cfg, latents, t, ctx_p,
                                        controlnet=cn, controlnet_cond=cn_cond)
            vn = qwen_image_dit_forward(dit, cfg, latents, t, ctx_n,
                                        controlnet=cn, controlnet_cond=cn_cond)
            return vn + cfg_scale * (vp - vn)

        return fn

    def _encode_prompt(self, prompt: str) -> jnp.ndarray:
        from goal_force_tpu.pipelines.flux import _hash_ids

        text = QWEN_IMAGE_TEMPLATE.format(prompt)
        if self.tokenize is not None:
            ids = np.asarray(self.tokenize(text))[None]
        else:
            ids = _hash_ids(text, self.text_cfg.vocab, 48)[None]
        ids = jnp.asarray(ids, jnp.int32)
        pos = get_rope_index(np.asarray(ids), [], image_token_id=-1,
                             vision_start_token_id=-2)
        emb = jnp.asarray(self.text_encoder["wte"])[ids].astype(self.dtype)
        hidden = qwen_vl_text_forward(self.text_encoder, self.text_cfg, emb,
                                      jnp.ones_like(ids), jnp.asarray(pos))
        drop = min(QWEN_IMAGE_DROP_IDX, hidden.shape[1] - 1)
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
        return_latents: bool = False,
    ) -> np.ndarray:
        from goal_force_tpu.models.vae import decode_video, encode_video

        schedule = flow_match.make_schedule(
            num_inference_steps, sigma_min=0.0, sigma_max=1.0,
            extra_one_step=True, exponential_shift=True,
            shift_terminal=0.02, denoising_strength=denoising_strength,
            dynamic_shift_len=(height // 16) * (width // 16))
        ctx_p = self._encode_prompt(prompt).astype(self.dtype)
        ctx_n = self._encode_prompt(negative_prompt).astype(self.dtype)
        if ctx_p.shape[1] != ctx_n.shape[1]:
            L = max(ctx_p.shape[1], ctx_n.shape[1])
            pad = lambda c: jnp.pad(c, ((0, 0), (0, L - c.shape[1]), (0, 0)))
            ctx_p, ctx_n = pad(ctx_p), pad(ctx_n)

        h, w = height // self.vae_factor, width // self.vae_factor
        latents = jax.random.normal(
            jax.random.PRNGKey(seed),
            (1, h, w, self.dit_cfg.in_dim // 4), jnp.float32).astype(self.dtype)
        if input_image is not None:
            img = jnp.asarray(input_image, jnp.float32)[None] * 2.0 - 1.0
            z = encode_video(self.vae_encoder, self.vae_cfg,
                             img[:, None])[:, 0].astype(self.dtype)
            latents = flow_match.add_noise(z, latents, schedule.sigmas[0])

        cn_cond = None
        if controlnet is not None and controlnet_image is not None:
            cimg = jnp.asarray(controlnet_image, jnp.float32)[None] * 2.0 - 1.0
            cz = encode_video(self.vae_encoder, self.vae_cfg,
                              cimg[:, None])[:, 0]
            gh, gw = h // 2, w // 2
            cn_cond = cz.reshape(1, gh, 2, gw, 2, cz.shape[-1]) \
                .transpose(0, 1, 3, 5, 2, 4).reshape(1, gh * gw, -1) \
                .astype(self.dtype)

        for i in range(len(schedule)):
            t = jnp.full((1,), schedule.sigmas[i], self.dtype)
            tok = self._denoise(self.dit, latents, t, ctx_p, ctx_n,
                                float(cfg_scale), controlnet, cn_cond)
            c = latents.shape[-1]
            gh, gw = h // 2, w // 2
            v = tok.reshape(1, gh, gw, c, 2, 2).transpose(0, 1, 4, 2, 5, 3) \
                .reshape(1, h, w, c)
            latents = flow_match.euler_step(latents, v.astype(latents.dtype),
                                            schedule.sigmas[i],
                                            schedule.sigma_next(i))
        if return_latents:
            return np.asarray(latents, np.float32)
        img = decode_video(self.vae_decoder, self.vae_cfg,
                           latents.astype(jnp.float32)[:, None])[:, 0]
        return np.asarray((img[0] + 1.0) / 2.0, np.float32).clip(0.0, 1.0)


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
