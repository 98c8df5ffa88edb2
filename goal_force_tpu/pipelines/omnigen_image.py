"""OmniGen unified image-generation pipeline.

Mirrors /root/reference/diffsynth/pipelines/omnigen_image.py: FlowMatch with
inverted timesteps (shift 1, train steps 1, :124), sequence = [text (+ spliced
reference-image latents), time token, output image], attention = causal over
text, bidirectional within input-image spans and for the output image block
(omnigen_prompter.py:187-231), three-way CFG
cond = uncond + img_cfg*(img_cond - uncond) + cfg*(cond - img_cond)
(omnigen.py:565-576), SDXL VAE (scaling 0.13025).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.omnigen import (
    OmniGenConfig,
    init_omnigen,
    omnigen_forward,
)
from goal_force_tpu.schedulers import flow_match


def omnigen_attention_mask(text_len: int, num_img_tokens: int,
                           image_spans: Sequence[Tuple[int, int]] = ()
                           ) -> np.ndarray:
    """(1, S, S) 0/1 mask: causal text+time prefix, full-attention output image
    block, bidirectional input-image spans (reference create_mask
    :187-231, adjust_attention_for_input_images :226-231)."""
    l = text_len + 1            # + time token
    s = l + num_img_tokens
    m = np.zeros((s, s), np.float32)
    m[:l, :l] = np.tril(np.ones((l, l), np.float32))
    m[l:, :] = 1.0
    for (s0, s1) in image_spans:
        m[s0:s1, s0:s1] = 1.0
    return m[None]


@dataclasses.dataclass
class OmniGenImagePipeline:
    transformer: Dict
    vae_encoder: Optional[Dict]
    vae_decoder: Dict
    cfg: OmniGenConfig
    vae_enc_plan: Tuple = ()
    vae_dec_plan: Tuple = ()
    vae_groups: int = 32
    vae_scaling: float = 0.13025       # SDXL VAE
    vae_factor: int = 8
    tokenize: Optional[Callable] = None
    dtype: object = jnp.bfloat16

    @classmethod
    def from_pretrained(
        cls,
        transformer_path,
        vae_encoder_path=None,             # SD-1.5 VAE halves (plan format)
        vae_decoder_path=None,
        tokenizer_dir=None,                # Phi-3 tokenizer (ships with ckpt)
        vae_plans=None,
        dtype=jnp.bfloat16,
        **infer_kw,                        # num_heads + rope factors for tiny
    ) -> "OmniGenImagePipeline":
        """OmniGen 'load weights, generate' (reference ModelManager OmniGen
        row; the Phi-3 tokenizer ships with the checkpoint — pass its dir)."""
        from goal_force_tpu.io.auto import load_model
        from goal_force_tpu.models.sd_vae import (
            SD_VAE_DECODER_PLAN,
            SD_VAE_ENCODER_PLAN,
        )

        to_dev = lambda tree: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), tree)
        tf = load_model(transformer_path, **infer_kw)
        if tf["kind"] != "omnigen":
            raise ValueError(f"{transformer_path} detected as {tf['kind']!r}")
        enc_plan, dec_plan, vgroups = vae_plans or \
            (SD_VAE_ENCODER_PLAN, SD_VAE_DECODER_PLAN, 32)
        vae_enc = vae_dec = None
        if vae_encoder_path is not None:
            vae_enc = to_dev(load_model(vae_encoder_path, plan=enc_plan)["params"])
        if vae_decoder_path is not None:
            vae_dec = to_dev(load_model(vae_decoder_path, plan=dec_plan)["params"])
        tok = None
        if tokenizer_dir is not None:
            from goal_force_tpu.prompters import load_text_tokenizer

            tt = load_text_tokenizer(tokenizer_dir, 128)
            tok = tt.encode            # OmniGen consumes unpadded id lists
        return cls(transformer=to_dev(tf["params"]), vae_encoder=vae_enc,
                   vae_decoder=vae_dec, cfg=tf["config"],
                   vae_enc_plan=enc_plan, vae_dec_plan=dec_plan,
                   vae_groups=vgroups, tokenize=tok, dtype=dtype)

    @classmethod
    def init_random(cls, key=None, dtype=jnp.float32) -> "OmniGenImagePipeline":
        from goal_force_tpu.pipelines.sd import _init_tiny_vae

        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, 2)
        cfg = OmniGenConfig(hidden_size=32, num_layers=2, num_heads=4,
                            num_kv_heads=4, intermediate_size=48, vocab=96,
                            original_max_positions=64, max_positions=64,
                            pos_embed_max_size=16)
        tf = init_omnigen(ks[0], cfg, dtype=dtype)
        vae_e, vae_d, enc_plan, dec_plan = _init_tiny_vae(ks[1], dtype)
        return cls(transformer=tf, vae_encoder=vae_e, vae_decoder=vae_d,
                   cfg=cfg, vae_enc_plan=enc_plan, vae_dec_plan=dec_plan,
                   vae_groups=4, dtype=dtype)

    def _ids(self, text: str, length: int = 24) -> List[int]:
        if self.tokenize is not None:
            return list(self.tokenize(text))
        from goal_force_tpu.pipelines.flux import _hash_ids

        return list(np.asarray(_hash_ids(text, self.cfg.vocab, length)))

    def __call__(
        self,
        prompt: str,
        reference_images: Sequence[np.ndarray] = (),
        cfg_scale: float = 2.5,
        image_cfg_scale: float = 1.6,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 20,
        seed: int = 0,
        input_image: Optional[np.ndarray] = None,    # (H, W, 3) in [-1, 1]
        denoising_strength: float = 1.0,
        use_kv_cache: bool = True,                   # cache condition K/V
        tiled: bool = False,
        tile_size: int = 64,
        tile_stride: int = 32,
        return_latents: bool = False,
    ) -> np.ndarray:
        # input_image + denoising_strength: i2i (reference omnigen_image.py
        # :226-233); tiled: spatial VAE tiling (:221 tiler_kwargs)
        from goal_force_tpu.models.sd_vae import sd_vae_decode, sd_vae_encode

        # reference ctor (omnigen_image.py:126) leaves extra_one_step at the
        # scheduler default FALSE: sigmas = flip(linspace(1, 0, N)) = 0..1
        schedule = flow_match.make_schedule(
            num_inference_steps, shift=1.0, sigma_min=0.0, sigma_max=1.0,
            extra_one_step=False, inverse_timesteps=True,
            num_train_timesteps=1,
            denoising_strength=denoising_strength
            if input_image is not None else 1.0)
        h, w = height // self.vae_factor, width // self.vae_factor
        n_img = (h // 2) * (w // 2)
        noise = jax.random.normal(jax.random.PRNGKey(seed), (1, h, w, 4),
                                  jnp.float32).astype(self.dtype)
        if input_image is not None:
            enc = lambda c: sd_vae_encode(self.vae_encoder, c,
                                          self.vae_enc_plan,
                                          groups=self.vae_groups,
                                          scaling=self.vae_scaling)
            img = jnp.asarray(np.asarray(input_image, np.float32))[None]
            if tiled:
                from goal_force_tpu.models.tiler import tiled_forward_2d

                z = tiled_forward_2d(jax.jit(enc), img,
                                     tile_size * self.vae_factor,
                                     tile_stride * self.vae_factor)
            else:
                z = enc(img)
            latents = flow_match.add_noise(z.astype(self.dtype), noise,
                                           schedule.sigmas[0]) \
                .astype(self.dtype)
        else:
            latents = noise

        # --- build the conditioning branches (prompter __call__ semantics) ---
        ref_latents, spans, cond_ids = [], [], self._ids(prompt)
        for img in reference_images:
            lat = sd_vae_encode(self.vae_encoder, jnp.asarray(img)[None],
                                self.vae_enc_plan, groups=self.vae_groups,
                                scaling=self.vae_scaling)
            size = (lat.shape[1] // 2) * (lat.shape[2] // 2)
            spans.append((len(cond_ids), len(cond_ids) + size))
            cond_ids = cond_ids + [0] * size
            ref_latents.append(lat.astype(self.dtype))
        uncond_ids = self._ids("")

        branches = [
            (cond_ids, ref_latents, spans),
            (uncond_ids, [], []),
        ]
        if ref_latents:
            # img-cond branch: references only, no text instruction
            ic_ids = self._ids("")
            ic_spans = []
            for lat in ref_latents:
                size = (lat.shape[1] // 2) * (lat.shape[2] // 2)
                ic_spans.append((len(ic_ids), len(ic_ids) + size))
                ic_ids = ic_ids + [0] * size
            branches.append((ic_ids, ref_latents, ic_spans))

        branch_fns = []
        for ids, refs, sp in branches:
            mask_np = omnigen_attention_mask(len(ids), n_img, sp)
            mask = jnp.asarray(mask_np)
            # cache replay: only [time_token, image] rows query; columns stay
            # full (reference crop_attention_mask_for_cache :191-194)
            mask_crop = jnp.asarray(mask_np[:, -(n_img + 1):, :])
            id_arr = jnp.asarray(np.asarray(ids)[None], jnp.int32)
            pos = jnp.asarray(np.arange(len(ids) + 1 + n_img)[None])
            pos_crop = pos[:, -(n_img + 1):]
            slices = [(0, s0, s1) for (s0, s1) in sp]

            def fn(tf, lat, t, _ids=id_arr, _m=mask, _p=pos, _r=tuple(refs),
                   _s=tuple(slices)):
                return omnigen_forward(tf, self.cfg, lat, t, _ids, _m,
                                       input_img_latents=list(_r),
                                       image_slices=list(_s), position_ids=_p,
                                       return_past_kv=use_kv_cache)

            def cached_fn(tf, lat, t, kv, _m=mask_crop, _p=pos_crop):
                return omnigen_forward(tf, self.cfg, lat, t, None, _m,
                                       position_ids=_p, past_kv=kv)

            branch_fns.append((jax.jit(fn), jax.jit(cached_fn)))
        caches = [None] * len(branch_fns)

        for i in range(len(schedule)):
            t = jnp.full((1,), schedule.timesteps[i], self.dtype)
            outs = []
            for j, (full_fn, cached_fn) in enumerate(branch_fns):
                if use_kv_cache and caches[j] is not None:
                    outs.append(cached_fn(self.transformer, latents, t,
                                          caches[j]))
                elif use_kv_cache:
                    o, caches[j] = full_fn(self.transformer, latents, t)
                    outs.append(o)
                else:
                    outs.append(full_fn(self.transformer, latents, t))
            if len(outs) == 3:
                cond, uncond, img_cond = outs
                v = uncond + image_cfg_scale * (img_cond - uncond) \
                    + cfg_scale * (cond - img_cond)
            else:
                cond, uncond = outs
                v = uncond + cfg_scale * (cond - uncond)
            latents = flow_match.euler_step(latents, v.astype(latents.dtype),
                                            schedule.sigmas[i],
                                            schedule.sigma_next(i))
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
