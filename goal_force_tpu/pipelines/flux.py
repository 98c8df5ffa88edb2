"""Flux.1 text-to-image / image-to-image pipeline.

Mirrors the reference FluxImagePipeline core path
(/root/reference/diffsynth/pipelines/flux_image_new.py:434-560): CLIP-L pooled +
T5-XXL sequence embeddings, flow-match Euler schedule (shift 3.0, sigma_min
0.003/1.002 — the scheduler's defaults at
/root/reference/diffsynth/schedulers/flow_match.py:7-31), embedded guidance
(Flux-dev), optional true CFG as a merged batch, 16-channel SD3-architecture VAE.

TPU-native shape: ONE jitted denoise step reused across all steps; scanned MMDiT
blocks; NHWC; bf16 by default on TPU. The reference's extra units (Kontext,
IP-Adapter, EliGen, InfiniteYou, ...) are adapters on this same denoise loop and
are tracked separately.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu import configs
from goal_force_tpu.configs import FluxDiTConfig, T5Config
from goal_force_tpu.models import t5 as t5m
from goal_force_tpu.models.clip import CLIPConfig
from goal_force_tpu.models.flux_dit import flux_dit_forward, init_flux_dit
from goal_force_tpu.models.sd_text_encoder import SD_TEXT_CONFIG, sd3_text1_encode
from goal_force_tpu.models.sd_vae import (
    FLUX_SCALING,
    SD_VAE_DECODER_PLAN,
    SD_VAE_ENCODER_PLAN,
    sd3_vae_decode,
    sd3_vae_encode,
)
from goal_force_tpu.schedulers import flow_match as fm

FLUX_SIGMA_MIN = 0.003 / 1.002
FLUX_SHIFT = 3.0


def tiny_flux_configs():
    """Mutually consistent tiny configs for Flux tests (axes_dim sums to head_dim)."""
    dit_cfg = FluxDiTConfig(
        dim=64, num_heads=4, num_joint_blocks=2, num_single_blocks=2,
        text_dim=32, pooled_dim=48, freq_dim=32, axes_dim=(4, 6, 6),
    )
    t5_cfg = T5Config(vocab=128, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
                      num_layers=2, shared_pos=True, text_len=16)
    clip_cfg = dataclasses.replace(SD_TEXT_CONFIG, text_dim=48, text_heads=4,
                                   text_layers=2)
    return dit_cfg, t5_cfg, clip_cfg


@dataclasses.dataclass
class FluxPipeline:
    dit: Dict
    clip: Dict
    t5: Dict
    vae_encoder: Optional[Dict]
    vae_decoder: Dict
    dit_cfg: FluxDiTConfig
    t5_cfg: T5Config
    clip_cfg: CLIPConfig = SD_TEXT_CONFIG
    vae_scaling: Tuple[float, float] = FLUX_SCALING
    vae_enc_plan: Tuple = SD_VAE_ENCODER_PLAN
    vae_dec_plan: Tuple = SD_VAE_DECODER_PLAN
    vae_groups: int = 32
    vae_factor: int = 8                        # spatial down/up factor of the plans
    tokenize_clip: Optional[Callable] = None   # str -> (77,) ids
    tokenize_t5: Optional[Callable] = None     # str -> (L,) ids
    dtype: object = jnp.bfloat16
    attn_impl: str = "auto"

    # ------------------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        dit_path,
        text_encoder_path=None,            # CLIP-L (diffsynth naming)
        text_encoder_2_path=None,          # T5-XXL (diffsynth or HF naming)
        vae_encoder_path=None,
        vae_decoder_path=None,
        tokenizer_1="vendored",            # None -> hash fallback (warned)
        tokenizer_2="vendored",
        t5_length: int = 512,
        vae_plans=None,                    # (enc_plan, dec_plan, groups)
        dtype=jnp.bfloat16,
        clip_num_heads=None,               # tiny-file overrides (real files
        t5_num_heads=None,                 # infer everything from shapes)
        **infer_kw,                        # e.g. num_heads/axes_dim for the DiT
    ) -> "FluxPipeline":
        """Build a runnable Flux pipeline from reference-format weight files.

        Replaces the reference's ModelManager hash-detect path for the Flux
        family (reference: diffsynth/models/model_manager.py:395-461 +
        diffsynth/configs/model_config.py Flux rows; file formats are the
        reference FluxDiT / SDXLTextEncoder / T5 / SD3-VAE state dicts).
        Tokenizers default to the vendored flux assets (reference
        flux_prompter.py:61-69); pass None to fall back to hashing (loudly)."""
        from goal_force_tpu.io.auto import load_model

        to_dev = lambda tree: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), tree)

        dit = load_model(dit_path, **infer_kw)
        if dit["kind"] != "flux_dit":
            raise ValueError(f"{dit_path} detected as {dit['kind']!r}, not flux_dit")
        key = jax.random.PRNGKey(0)
        enc_plan, dec_plan, groups = vae_plans or \
            (SD_VAE_ENCODER_PLAN, SD_VAE_DECODER_PLAN, 32)

        clip_cfg, clip = SD_TEXT_CONFIG, None
        if text_encoder_path is not None:
            r = load_model(text_encoder_path, num_heads=clip_num_heads)
            clip_cfg, clip = r["config"], to_dev(r["params"])
        t5_cfg, t5 = None, None
        if text_encoder_2_path is not None:
            r = load_model(text_encoder_2_path, num_heads=t5_num_heads)
            t5_cfg = dataclasses.replace(r["config"], text_len=t5_length)
            t5 = to_dev(r["params"])
        vae_enc = vae_dec = None
        if vae_encoder_path is not None:
            vae_enc = to_dev(load_model(vae_encoder_path, plan=enc_plan)["params"])
        if vae_decoder_path is not None:
            vae_dec = to_dev(load_model(vae_decoder_path, plan=dec_plan)["params"])

        tok_clip = tok_t5 = None
        if tokenizer_1 == "vendored" or tokenizer_2 == "vendored":
            from goal_force_tpu.prompters import flux_tokenizers

            v1, v2 = flux_tokenizers(t5_length=t5_length)
            tok_clip = v1 if tokenizer_1 == "vendored" else tokenizer_1
            tok_t5 = v2 if tokenizer_2 == "vendored" else tokenizer_2
        else:
            tok_clip, tok_t5 = tokenizer_1, tokenizer_2
        if tok_clip is None or tok_t5 is None:
            import warnings

            warnings.warn(
                "FluxPipeline.from_pretrained without real tokenizers: prompts "
                "will be HASHED into ids (garbage embeddings). Pass "
                "tokenizer_1/tokenizer_2='vendored' or callables.",
                stacklevel=2)

        return cls(
            dit=to_dev(dit["params"]),
            clip=clip if clip is not None else
            init_clip_text(key, clip_cfg, dtype),
            t5=t5 if t5 is not None else
            t5m.init_t5(key, t5_cfg or T5Config(), dtype),
            vae_encoder=vae_enc, vae_decoder=vae_dec,
            dit_cfg=dit["config"],
            t5_cfg=t5_cfg or T5Config(),
            clip_cfg=clip_cfg,
            vae_enc_plan=enc_plan, vae_dec_plan=dec_plan, vae_groups=groups,
            vae_factor=2 ** sum(1 for b in enc_plan if b[0] == "downe"),
            tokenize_clip=tok_clip, tokenize_t5=tok_t5,
            dtype=dtype,
        )

    @classmethod
    def init_random(cls, key=None, dit_cfg=None, t5_cfg=None, clip_cfg=None,
                    vae_plans=None, dtype=jnp.float32) -> "FluxPipeline":
        key = key if key is not None else jax.random.PRNGKey(0)
        if dit_cfg is None:
            dit_cfg, t5_cfg, clip_cfg = tiny_flux_configs()
        ks = jax.random.split(key, 4)
        enc_plan, dec_plan, groups = vae_plans or tiny_sd3_vae_plans()
        enc, dec = _init_sd3_vae(ks[3], enc_plan, dec_plan, dtype)
        return cls(
            dit=init_flux_dit(ks[0], dit_cfg, dtype),
            clip=init_clip_text(ks[1], clip_cfg, dtype),
            t5=t5m.init_t5(ks[2], t5_cfg, dtype),
            vae_encoder=enc,
            vae_decoder=dec,
            dit_cfg=dit_cfg, t5_cfg=t5_cfg, clip_cfg=clip_cfg,
            vae_enc_plan=enc_plan, vae_dec_plan=dec_plan, vae_groups=groups,
            vae_factor=2 ** sum(1 for b in enc_plan if b[0] == "downe"),
            dtype=dtype,
        )

    # ------------------------------------------------------------------
    # Jitted stages
    # ------------------------------------------------------------------

    @functools.cached_property
    def _encode_text(self):
        t5_cfg, clip_cfg = self.t5_cfg, self.clip_cfg

        @jax.jit
        def fn(t5_params, clip_params, t5_ids, clip_ids):
            emb = t5m.t5_encode(t5_params, t5_cfg, t5_ids,
                                jnp.ones_like(t5_ids))
            pooled, _ = sd3_text1_encode(clip_params, clip_ids, clip_cfg)
            return emb, pooled

        return fn

    @functools.cached_property
    def _denoise_step(self):
        cfg = self.dit_cfg
        attn_impl = self.attn_impl

        @functools.partial(jax.jit, static_argnames=("use_cfg", "tile_ctx"),
                           donate_argnums=(1,))
        def fn(dit, latents, timestep, sigma, sigma_next, prompt_emb, pooled,
               guidance, cfg_scale, use_cfg, cn_res=None, cn_single_res=None,
               kontext=None, flex=None, ip=None, rope_override=None,
               tile_ctx=None):
            b = latents.shape[0]
            model_in = latents if flex is None else \
                jnp.concatenate([latents, flex.astype(latents.dtype)], axis=-1)
            if tile_ctx is not None:
                # reference flux_dit.py:324-341: whole-DiT per latent tile
                # (global RoPE prevents layer-wise tiling); extras are dropped
                # on the tiled path there — the pipeline guards them off here.
                from goal_force_tpu.models.tiler import tiled_forward_2d

                x = jnp.concatenate([model_in, model_in], axis=0) if use_cfg \
                    else model_in
                t = jnp.concatenate([timestep, timestep], axis=0) if use_cfg \
                    else timestep
                g = jnp.concatenate([guidance, guidance], axis=0) if use_cfg \
                    else guidance
                pe = prompt_emb if use_cfg else prompt_emb[:b]
                po = pooled if use_cfg else pooled[:b]
                v = tiled_forward_2d(
                    lambda xt: flux_dit_forward(dit, cfg, xt, t, pe, po, g,
                                                attn_impl=attn_impl),
                    x, tile_ctx[0], tile_ctx[1]).astype(x.dtype)
                if use_cfg:
                    v = v[b:] + cfg_scale * (v[:b] - v[b:])
                return fm.euler_step(latents, v.astype(latents.dtype), sigma,
                                     sigma_next)
            if use_cfg:
                x = jnp.concatenate([model_in, model_in], axis=0)
                t = jnp.concatenate([timestep, timestep], axis=0)
                g = jnp.concatenate([guidance, guidance], axis=0)
                tile = lambda r: None if r is None else \
                    jnp.concatenate([r, r], axis=1)
                k2 = None if kontext is None else \
                    jnp.concatenate([kontext, kontext], axis=0)
                v = flux_dit_forward(dit, cfg, x, t, prompt_emb, pooled, g,
                                     attn_impl=attn_impl,
                                     controlnet_res=tile(cn_res),
                                     controlnet_single_res=tile(cn_single_res),
                                     kontext_latents=k2, ipadapter=ip,
                                     rope_tables_override=rope_override)
                v = v[b:] + cfg_scale * (v[:b] - v[b:])
            else:
                v = flux_dit_forward(dit, cfg, model_in, timestep,
                                     prompt_emb[:b], pooled[:b], guidance,
                                     attn_impl=attn_impl,
                                     controlnet_res=cn_res,
                                     controlnet_single_res=cn_single_res,
                                     kontext_latents=kontext, ipadapter=ip,
                                     rope_tables_override=rope_override)
            return fm.euler_step(latents, v.astype(latents.dtype), sigma, sigma_next)

        return fn

    @functools.cached_property
    def _denoise_step_eligen(self):
        """EliGen step (reference FluxImageUnit_EliGen): entity prompts extend
        the text tokens, so posi/nega run as separate forwards — the negative
        branch only carries entities when eligen_enable_on_negative."""
        cfg = self.dit_cfg
        attn_impl = self.attn_impl

        @functools.partial(jax.jit, static_argnames=("use_cfg",), donate_argnums=(1,))
        def fn(dit, latents, timestep, sigma, sigma_next, prompt_emb, pooled,
               guidance, cfg_scale, use_cfg, ent_emb, ent_masks,
               ent_emb_nega=None):
            v = flux_dit_forward(dit, cfg, latents, timestep, prompt_emb[:1],
                                 pooled[:1], guidance, attn_impl=attn_impl,
                                 entity_prompt_emb=ent_emb,
                                 entity_masks=ent_masks)
            if use_cfg:
                nega_ent = ent_emb_nega is not None
                v_n = flux_dit_forward(
                    dit, cfg, latents, timestep, prompt_emb[1:2], pooled[1:2],
                    guidance, attn_impl=attn_impl,
                    entity_prompt_emb=ent_emb_nega if nega_ent else None,
                    entity_masks=ent_masks if nega_ent else None)
                v = v_n + cfg_scale * (v - v_n)
            return fm.euler_step(latents, v.astype(latents.dtype), sigma,
                                 sigma_next)

        return fn

    @functools.cached_property
    def _decode(self):
        return jax.jit(lambda p, z: sd3_vae_decode(
            p, z, self.vae_scaling, self.vae_dec_plan, self.vae_groups))

    @functools.cached_property
    def _encode(self):
        return jax.jit(lambda p, x: sd3_vae_encode(
            p, x, self.vae_scaling, self.vae_enc_plan, self.vae_groups))

    # ------------------------------------------------------------------

    def _ids(self, prompts):
        clip_ids = np.stack([
            np.asarray(self.tokenize_clip(p)) if self.tokenize_clip
            else _hash_ids(p, self.clip_cfg.vocab_size, 77) for p in prompts])
        t5_ids = np.stack([
            np.asarray(self.tokenize_t5(p)) if self.tokenize_t5
            else _hash_ids(p, self.t5_cfg.vocab, self.t5_cfg.text_len)
            for p in prompts])
        return jnp.asarray(clip_ids, jnp.int32), jnp.asarray(t5_ids, jnp.int32)

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 1.0,
        embedded_guidance: float = 3.5,
        input_image: Optional[np.ndarray] = None,   # (H, W, 3) float [0,1]
        denoising_strength: float = 1.0,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 30,
        sigma_shift: Optional[float] = None,
        seed: int = 0,
        progress: bool = False,
        controlnet: Optional[Dict] = None,         # flux_controlnet params+cfg
        controlnet_image: Optional[np.ndarray] = None,   # (H, W, 3) in [0,1]
        controlnet_mode: Optional[int] = None,
        kontext_image: Optional[np.ndarray] = None,      # (H, W, 3) in [0,1]
        id_embeds: Optional[np.ndarray] = None,    # (B, N, 512) ArcFace tokens
        infiniteyou: Optional[Dict] = None,        # projector params
        infiniteyou_guidance: float = 1.0,
        step1x: Optional[Dict] = None,             # {"params", "cfg"} connector
        step1x_llm_embedding: Optional[np.ndarray] = None,  # (B, S, 3584)
        step1x_mask: Optional[np.ndarray] = None,           # (B, S)
        flex_condition=None,                       # (1, h, w, C) extra channels
        flex_uncondition=None,
        flex_control_stop_timestep: float = 0.0,
        eligen_entity_prompts=None,                # list[str] (EliGen)
        eligen_entity_masks=None,                  # (M, H, W) float [0,1]
        eligen_enable_on_negative: bool = False,
        prompt_emb_override=None,                  # (B, S, text_dim), e.g.
        # NexusGen adapter/merger outputs (flux_image_new.py:791-812)
        tea_cache_thresh: float = 0.0,             # >0 enables Flux TeaCache
        ipadapter: Optional[Dict] = None,          # FluxIpAdapter params
        ipadapter_image_emb: Optional[np.ndarray] = None,  # (B, siglip_dim)
        ipadapter_scale: float = 1.0,
        rope_tables_override=None,                 # (cos, sin), e.g. NexusGen
        # editing spatial text ids (flux_image_new.py:815-835)
        tiled: bool = False,                       # reference flux_image_new
        tile_size: int = 128,                      # :492-494 defaults; DiT runs
        tile_stride: int = 64,                     # whole-model-per-latent-tile
        value_controller=None,                     # list of value-encoder params
        value_controller_inputs=None,              # list of floats (or None)
        lora_encoder=None,                         # FluxLoRAEncoder params
        lora_encoder_inputs=None,                  # list of converted LoRA dicts
        lora_encoder_scale: float = 1.0,
    ) -> np.ndarray:
        """Returns (H, W, 3) float32 in [0, 1] (reference __call__ :434-560).

        controlnet: {"params": ..., "cfg": FluxControlNetConfig}; the control
        image is VAE-encoded and the per-block residual stacks are recomputed
        each step and fed into the DiT scans (reference flux_dit.py:728,792,808).
        """
        schedule = fm.make_schedule(
            num_steps=num_inference_steps,
            shift=FLUX_SHIFT if sigma_shift is None else sigma_shift,
            sigma_min=FLUX_SIGMA_MIN, extra_one_step=False,
            denoising_strength=denoising_strength,
        )
        use_cfg = cfg_scale != 1.0
        prompts = [prompt, negative_prompt] if use_cfg else [prompt]
        clip_ids, t5_ids = self._ids(prompts)
        prompt_emb, pooled = self._encode_text(self.t5, self.clip, t5_ids, clip_ids)
        prompt_emb = prompt_emb.astype(self.dtype)
        pooled = pooled.astype(self.dtype)
        if prompt_emb_override is not None:
            ov = jnp.asarray(prompt_emb_override).astype(self.dtype)
            prompt_emb = jnp.broadcast_to(ov, (prompt_emb.shape[0],)
                                          + ov.shape[1:])

        # extra conditioning tokens appended to the POSITIVE prompt only
        # (reference appends with zero text ids: value controller
        # flux_image_new.py:941-950, LoRA encoder :1005-1062)
        extra_tokens = []
        if value_controller is not None and value_controller_inputs is not None:
            from goal_force_tpu.models.flux_adapters import (
                multi_value_embedding,
            )

            vals = value_controller_inputs
            vals = vals if isinstance(vals, (list, tuple)) else [vals]
            extra_tokens.append(
                multi_value_embedding(value_controller, vals)[None])
        if lora_encoder is not None and lora_encoder_inputs is not None:
            from goal_force_tpu.models.flux_adapters import flux_lora_encode

            le_params, le_kw = lora_encoder, {}
            if isinstance(lora_encoder, dict) and "params" in lora_encoder:
                le_params = lora_encoder["params"]
                le_kw = {k: v for k, v in lora_encoder.items()
                         if k in ("patterns", "heads", "head_dim",
                                  "num_special")}
            loras = lora_encoder_inputs
            loras = loras if isinstance(loras, (list, tuple)) else [loras]
            le = jnp.concatenate(
                [flux_lora_encode(le_params, l, **le_kw) for l in loras],
                axis=1)
            extra_tokens.append(le * lora_encoder_scale)
        if extra_tokens:
            if use_cfg:
                # the reference appends to the positive branch only; the
                # merged-CFG batch here needs equal lengths per row
                raise NotImplementedError(
                    "value_controller/lora_encoder tokens compose with the "
                    "embedded-guidance path (cfg_scale == 1) only")
            prompt_emb = jnp.concatenate(
                [prompt_emb]
                + [jnp.asarray(t, prompt_emb.dtype) for t in extra_tokens],
                axis=1)

        if tiled and (controlnet is not None or kontext_image is not None
                      or step1x is not None or ipadapter is not None
                      or flex_condition is not None
                      or eligen_entity_prompts is not None
                      or rope_tables_override is not None
                      or tea_cache_thresh > 0):
            # the reference's tiled_forward silently drops these residual/token
            # injections (flux_dit.py:324-341); refuse instead
            raise NotImplementedError(
                "tiled=True composes with the base/CFG path only")

        h, w = height // self.vae_factor, width // self.vae_factor
        latents = jax.random.normal(jax.random.PRNGKey(seed), (1, h, w, 16),
                                    jnp.float32).astype(self.dtype)
        if input_image is not None:
            img = jnp.asarray(input_image, jnp.float32)[None] * 2.0 - 1.0
            if tiled:
                from goal_force_tpu.models.tiler import tiled_forward_2d

                z = tiled_forward_2d(
                    lambda c: self._encode(self.vae_encoder, c),
                    img, tile_size, tile_stride).astype(self.dtype)
            else:
                z = self._encode(self.vae_encoder, img).astype(self.dtype)
            latents = fm.add_noise(z, latents, schedule.sigmas[0])

        guidance = jnp.full((1,), embedded_guidance, self.dtype)

        cn_fn = None
        if controlnet is not None and controlnet_image is not None:
            from goal_force_tpu.models.flux_controlnet import (
                flux_controlnet_forward,
            )

            cimg = jnp.asarray(controlnet_image, jnp.float32)[None] * 2.0 - 1.0
            cond_lat = self._encode(self.vae_encoder, cimg).astype(self.dtype)
            cn_params, cn_cfg = controlnet["params"], controlnet["cfg"]

            # InfiniteYou: the ControlNet consumes the projected identity
            # tokens as its prompt, with its own guidance scale (reference
            # flux_image_new.py:1190-1192)
            cn_prompt, cn_guidance = prompt_emb[:1], guidance
            if id_embeds is not None and infiniteyou is not None:
                from goal_force_tpu.models.flux_adapters import (
                    infiniteyou_projector,
                )

                cn_prompt = infiniteyou_projector(
                    infiniteyou, jnp.asarray(id_embeds)).astype(self.dtype)
                cn_guidance = jnp.full((1,), infiniteyou_guidance, self.dtype)

            @jax.jit
            def cn_fn(lat, t):
                return flux_controlnet_forward(
                    cn_params, cn_cfg, lat, cond_lat, t,
                    cn_prompt, pooled[:1], cn_guidance,
                    mode_id=controlnet_mode)

        step1x_fn = None
        if step1x is not None and step1x_llm_embedding is not None:
            from goal_force_tpu.models.step1x_connector import (
                step1x_connector_forward,
            )

            s1_emb = jnp.asarray(step1x_llm_embedding)
            s1_mask = jnp.asarray(step1x_mask) if step1x_mask is not None \
                else jnp.ones(s1_emb.shape[:2], jnp.int32)

            @jax.jit
            def step1x_fn(t):
                # reference feeds timestep/1000 (flux_image_new.py:1206-1208)
                return step1x_connector_forward(
                    step1x["params"], step1x["cfg"], s1_emb, t / 1000.0,
                    s1_mask)

        ip = None
        if ipadapter is not None and ipadapter_image_emb is not None:
            from goal_force_tpu.models.flux_adapters import flux_ip_kwargs

            ip = flux_ip_kwargs(
                ipadapter, jnp.asarray(ipadapter_image_emb, self.dtype),
                num_heads=self.dit_cfg.num_heads,
                head_dim=self.dit_cfg.dim // self.dit_cfg.num_heads,
                scale=ipadapter_scale,
                num_joint=self.dit_cfg.num_joint_blocks,
                num_single=self.dit_cfg.num_single_blocks)

        kontext = None
        if kontext_image is not None:
            kimg = jnp.asarray(kontext_image, jnp.float32)[None] * 2.0 - 1.0
            kontext = self._encode(self.vae_encoder, kimg).astype(self.dtype)

        eligen = None
        if eligen_entity_prompts is not None and eligen_entity_masks is not None:
            if (cn_fn is not None or kontext is not None or step1x is not None
                    or ip is not None or rope_tables_override is not None
                    or flex_condition is not None or tea_cache_thresh > 0):
                raise NotImplementedError(
                    "EliGen composes with the base/CFG path only here")
            e_clip, e_t5 = self._ids(list(eligen_entity_prompts))
            ent_emb, _ = self._encode_text(self.t5, self.clip, e_t5, e_clip)
            ent_emb = ent_emb.astype(self.dtype)[None]        # (1, M, L, D)
            # PIL-NEAREST resize to latent res + binarize (reference
            # FluxImageUnit_EliGen.preprocess_masks :741-751)
            masks = np.asarray(eligen_entity_masks, np.float32)
            mh, mw = height // self.vae_factor, width // self.vae_factor
            yi = np.minimum((np.floor((np.arange(mh) + 0.5)
                                      * masks.shape[1] / mh)).astype(int),
                            masks.shape[1] - 1)
            xi = np.minimum((np.floor((np.arange(mw) + 0.5)
                                      * masks.shape[2] / mw)).astype(int),
                            masks.shape[2] - 1)
            masks_lat = (masks[:, yi][:, :, xi] > 0.5).astype(np.float32)[None]
            ent_emb_nega = None
            if eligen_enable_on_negative and use_cfg:
                # nega branch reuses the negative prompt for every entity
                # (reference prepare_eligen :760-762)
                m = ent_emb.shape[1]
                ent_emb_nega = jnp.repeat(prompt_emb[1:2][:, None], m, axis=1)
            eligen = (ent_emb, jnp.asarray(masks_lat), ent_emb_nega)

        tc = None
        if tea_cache_thresh > 0:
            from goal_force_tpu.models.flux_dit import (
                flux_dit_head,
                flux_dit_mod_input,
            )
            from goal_force_tpu.pipelines.teacache import TeaCache

            if cn_fn is not None or kontext is not None or step1x is not None \
                    or ipadapter is not None or rope_tables_override is not None:
                raise ValueError("TeaCache composes only with the base path")
            tc = TeaCache(num_inference_steps, tea_cache_thresh, "FLUX.1-dev")
            dcfg = self.dit_cfg

            @jax.jit
            def _tc_mod(dit, lat, t):
                return flux_dit_mod_input(dit, dcfg, lat, t, pooled[:1],
                                          guidance)

            @functools.partial(jax.jit, static_argnames=("use_cfg_",))
            def _tc_full(dit, lat, t, sigma, sigma_next, use_cfg_):
                b = lat.shape[0]
                if use_cfg_:
                    x2 = jnp.concatenate([lat, lat], axis=0)
                    t2 = jnp.concatenate([t, t], axis=0)
                    g2 = jnp.concatenate([guidance, guidance], axis=0)
                    v, x_in, x_out = flux_dit_forward(
                        dit, dcfg, x2, t2, prompt_emb, pooled, g2,
                        attn_impl=self.attn_impl, return_tokens=True)
                    v = v[b:] + cfg_scale * (v[:b] - v[b:])
                else:
                    v, x_in, x_out = flux_dit_forward(
                        dit, dcfg, lat, t, prompt_emb[:b], pooled[:b],
                        guidance, attn_impl=self.attn_impl, return_tokens=True)
                new = fm.euler_step(lat, v.astype(lat.dtype), sigma, sigma_next)
                return new, x_in, x_out

            @functools.partial(jax.jit, static_argnames=("use_cfg_",))
            def _tc_skip(dit, lat, t, sigma, sigma_next, residual, use_cfg_):
                from goal_force_tpu.models.flux_dit import (linear, patchify2d,
                                                            time_cond)

                b = lat.shape[0]
                gh, gw = lat.shape[1] // 2, lat.shape[2] // 2
                if use_cfg_:
                    x2 = jnp.concatenate([lat, lat], axis=0)
                    t2 = jnp.concatenate([t, t], axis=0)
                    g2 = jnp.concatenate([guidance, guidance], axis=0)
                else:
                    x2, t2, g2 = lat, t, guidance
                temb = time_cond(dit, dcfg, t2, pooled[:x2.shape[0]], g2)
                x_in = linear(dit["x_embedder"], patchify2d(x2))
                v = flux_dit_head(dit, dcfg, x_in + residual.astype(x_in.dtype),
                                  temb, gh, gw)
                if use_cfg_:
                    v = v[b:] + cfg_scale * (v[:b] - v[b:])
                return fm.euler_step(lat, v.astype(lat.dtype), sigma,
                                     sigma_next)

        it = range(len(schedule))
        if progress:
            import tqdm

            it = tqdm.tqdm(it)
        for i in it:
            tstep = jnp.full((1,), float(schedule.timesteps[i]), self.dtype)
            if tc is not None:
                t_mod = _tc_mod(self.dit, latents, tstep)
                if tc.should_skip(t_mod) and tc.residual is not None:
                    latents = _tc_skip(self.dit, latents, tstep,
                                       schedule.sigmas[i],
                                       schedule.sigma_next(i), tc.residual,
                                       use_cfg_=use_cfg)
                else:
                    latents, x_in, x_out = _tc_full(self.dit, latents, tstep,
                                                    schedule.sigmas[i],
                                                    schedule.sigma_next(i),
                                                    use_cfg_=use_cfg)
                    tc.store(x_in, x_out)
                continue
            if eligen is not None:
                ent_emb, ent_masks, ent_emb_nega = eligen
                latents = self._denoise_step_eligen(
                    self.dit, latents, tstep, schedule.sigmas[i],
                    schedule.sigma_next(i), prompt_emb, pooled, guidance,
                    cfg_scale, use_cfg, ent_emb, ent_masks, ent_emb_nega)
                continue
            cn_res = cn_single_res = None
            if cn_fn is not None:
                cn_res, cn_single_res = cn_fn(latents, tstep)
            step_prompt, step_pooled = prompt_emb, pooled
            if step1x_fn is not None:
                s1_tokens, s1_glob = step1x_fn(tstep)
                reps = prompt_emb.shape[0] // s1_tokens.shape[0]
                step_prompt = jnp.tile(s1_tokens.astype(self.dtype),
                                       (reps, 1, 1))
                step_pooled = jnp.tile(s1_glob.astype(self.dtype), (reps, 1))
            flex = None
            if flex_condition is not None:
                # reference switches to the uncondition branch below the stop
                # timestep (flux_image_new.py:1198-1203)
                use_cond = float(schedule.timesteps[i]) >= flex_control_stop_timestep
                flex = jnp.asarray(flex_condition if use_cond
                                   else flex_uncondition)
            latents = self._denoise_step(
                self.dit, latents, tstep, schedule.sigmas[i], schedule.sigma_next(i),
                step_prompt, step_pooled, guidance, cfg_scale, use_cfg,
                cn_res, cn_single_res, kontext, flex, ip,
                None if rope_tables_override is None else
                tuple(jnp.asarray(t) for t in rope_tables_override),
                tile_ctx=(tile_size, tile_stride) if tiled else None,
            )
        if tiled:
            from goal_force_tpu.models.tiler import tiled_forward_2d

            img = tiled_forward_2d(
                lambda z: self._decode(self.vae_decoder, z),
                latents.astype(jnp.float32), tile_size, tile_stride)
        else:
            img = self._decode(self.vae_decoder, latents.astype(jnp.float32))
        return np.asarray((img[0] + 1.0) / 2.0, np.float32).clip(0.0, 1.0)


def _hash_ids(text: str, vocab: int, length: int) -> np.ndarray:
    """Deterministic fallback ids (zero-egress test environments)."""
    import hashlib

    h = hashlib.sha256(text.encode()).digest()
    rng = np.random.default_rng(np.frombuffer(h[:8], np.uint64)[0])
    n = min(length, max(1, len(text.split())))
    ids = np.zeros((length,), np.int64)
    ids[:n] = rng.integers(2, vocab, (n,))
    return ids


def init_clip_text(key, cfg: CLIPConfig, dtype):
    from goal_force_tpu.models.clip import init_clip

    return {"text": init_clip(key, cfg, dtype)["text"]}


def tiny_sd3_vae_plans():
    """Small SD3-architecture VAE plans for tests (structure preserved)."""
    enc = (("res", 8, 8), ("downe", 8), ("res", 8, 16),
           ("res", 16, 16), ("vattn", 16), ("res", 16, 16))
    dec = (("res", 16, 16), ("vattn", 16), ("res", 16, 16),
           ("res", 16, 8), ("up", 8), ("res", 8, 8))
    return enc, dec, 4


def _init_sd3_vae(key, enc_plan, dec_plan, dtype):
    """Random SD3/Flux-head VAE params: no quant convs, encoder emits 32 moment
    channels, 16-channel decoder input."""
    from goal_force_tpu.pipelines.sd import _init_vae

    ks = jax.random.split(key, 3)
    enc = _init_vae(ks[0], enc_plan, 3, 8, enc_plan[0][1], enc_plan[-1][-1],
                    True, dtype)
    enc.pop("quant_conv")
    last = enc_plan[-1][-1]
    enc["conv_out"] = {
        "w": jax.random.normal(ks[2], (3, 3, last, 32), dtype) * 0.02,
        "b": jnp.zeros((32,), dtype),
    }
    dec = _init_vae(ks[1], dec_plan, 16, 3, dec_plan[0][1], dec_plan[-1][-1],
                    False, dtype)
    dec.pop("post_quant_conv")
    return enc, dec
