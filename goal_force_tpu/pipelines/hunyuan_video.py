"""HunyuanVideo text-to-video pipeline.

Mirrors the reference HunyuanVideoPipeline denoise loop
(/root/reference/diffsynth/pipelines/hunyuan_video.py): flow-match Euler schedule
with shift 7.0 / sigma_min 0 / extra_one_step (:19), embedded guidance (Flux-dev
style), optional true CFG as a second pass.

The reference's text branch is a LLaVA-llama3 encoder plus CLIP-L pooled; both are
host-side HF models, so the pipeline takes a pluggable `encode_prompt` callable
returning (prompt_emb (B, 256, text_dim), text_mask (B, 256), pooled (B, 768)).
The VAE is pluggable the same way (decode: latents (B,T,h,w,16) -> frames).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.hunyuan_video_dit import (
    HunyuanVideoDiTConfig,
    hunyuan_video_dit_forward,
    init_hunyuan_video_dit,
)
from goal_force_tpu.schedulers import flow_match as fm


def _accepts_images(encode_prompt) -> bool:
    """Whether an injected encode_prompt callable takes (prompt, images)."""
    import inspect

    try:
        return len(inspect.signature(encode_prompt).parameters) >= 2
    except (TypeError, ValueError):
        return False


def tiny_hunyuan_config():
    return HunyuanVideoDiTConfig(dim=144, num_double_blocks=2,
                                 num_single_blocks=2, text_dim=32,
                                 rope_dims=(2, 2, 2))


@dataclasses.dataclass
class HunyuanVideoPipeline:
    dit: Dict
    dit_cfg: HunyuanVideoDiTConfig
    encode_prompt: Optional[Callable] = None   # str -> (emb, mask, pooled)
    decode_video: Optional[Callable] = None    # latents -> (T, H, W, 3) [0,1]
    encode_video: Optional[Callable] = None    # (B,T,H,W,3)[-1,1] -> latents
    dtype: object = jnp.bfloat16
    attn_impl: str = "auto"

    @classmethod
    def from_pretrained(
        cls,
        dit_path,
        llama_path=None,                   # llava-llama text tower weights
        clip_path=None,                    # CLIP-L (diffsynth naming)
        vae_decoder_path=None,
        vae_cfg=None,                      # HunyuanVAEConfig
        llama_tokenizer_dir=None,          # ships with the text encoder ckpt
        clip_tokenizer="vendored",         # hunyuan_video/tokenizer_1 assets
        txt_len: int = 256,
        dtype=jnp.bfloat16,
        llama_num_heads=None,
        clip_num_heads=None,
        **infer_kw,                        # num_heads/rope_dims for tiny DiTs
    ) -> "HunyuanVideoPipeline":
        """HunyuanVideo 'load weights, generate' (reference ModelManager rows +
        hunyuan_video_prompter.py: Llama hidden states with skip-2 + CLIP-L
        pooled). The Llama tokenizer is not vendored by the reference either —
        pass the text-encoder checkpoint dir via `llama_tokenizer_dir`."""
        from goal_force_tpu.io.auto import load_model

        to_dev = lambda tree: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), tree)
        dit = load_model(dit_path, **infer_kw)
        if dit["kind"] != "hunyuan_video_dit":
            raise ValueError(f"{dit_path} detected as {dit['kind']!r}")

        encode_prompt = None
        if llama_path is not None:
            r = load_model(llama_path, num_heads=llama_num_heads)
            llama, llama_cfg = to_dev(r["params"]), r["config"]
            clip = clip_cfg = None
            if clip_path is not None:
                rc = load_model(clip_path, num_heads=clip_num_heads)
                clip, clip_cfg = to_dev(rc["params"]), rc["config"]
            tok_llama = None
            if llama_tokenizer_dir is not None:
                from goal_force_tpu.prompters import load_text_tokenizer

                tok_llama = load_text_tokenizer(llama_tokenizer_dir, txt_len)
            tok_clip = clip_tokenizer
            if clip_tokenizer == "vendored":
                from goal_force_tpu.prompters import (
                    hunyuan_video_clip_tokenizer,
                )

                tok_clip = hunyuan_video_clip_tokenizer()
            if r["kind"] == "llava":
                # HunyuanVideo-I2V ships the LLaVA MLLM as text_encoder_2;
                # image-conditioned prompts route through the vision tower
                encode_prompt = make_llava_prompt_encoder(
                    llama, llama_cfg, clip, clip_cfg, txt_len,
                    tokenize_llama=tok_llama, tokenize_clip=tok_clip)
            else:
                encode_prompt = make_llama_prompt_encoder(
                    llama, llama_cfg, clip, clip_cfg, txt_len,
                    tokenize_llama=tok_llama, tokenize_clip=tok_clip)

        decode_video = encode_video = None
        if vae_decoder_path is not None:
            from goal_force_tpu.models import hunyuan_video_vae as hv

            r = load_model(vae_decoder_path, vae_cfg=vae_cfg)
            dec, vcfg = to_dev(r["params"]), r["config"]
            enc = dec.get("encoder")
            if "decoder" in dec:
                dec = dec["decoder"]
            decode_video = lambda z, **tk: (
                hv.hunyuan_vae_decode_tiled(dec, z, vcfg, tk["tile_size"],
                                            tk["tile_stride"])
                if tk.get("tiled") else hv.hunyuan_vae_decode(dec, z, vcfg))
            if enc is not None:
                encode_video = lambda v, **tk: (
                    hv.hunyuan_vae_encode_tiled(enc, v, vcfg, tk["tile_size"],
                                                tk["tile_stride"])
                    if tk.get("tiled") else hv.hunyuan_vae_encode(enc, v, vcfg))

        return cls(dit=to_dev(dit["params"]), dit_cfg=dit["config"],
                   encode_prompt=encode_prompt, decode_video=decode_video,
                   encode_video=encode_video, dtype=dtype)

    @classmethod
    def init_random(cls, key=None, dit_cfg=None, dtype=jnp.float32):
        key = key if key is not None else jax.random.PRNGKey(0)
        dit_cfg = dit_cfg or tiny_hunyuan_config()
        return cls(dit=init_hunyuan_video_dit(key, dit_cfg, dtype),
                   dit_cfg=dit_cfg, dtype=dtype)

    def _embed(self, prompt: str, seed: int = 0, input_images=None):
        if self.encode_prompt is not None:
            if input_images is not None and _accepts_images(self.encode_prompt):
                # the MLLM (LLaVA) encoder weaves the conditioning image into
                # the prompt embedding (reference hunyuan_video.py:105-107);
                # a text-only encoder just ignores the image here
                return self.encode_prompt(prompt, input_images)
            return self.encode_prompt(prompt)
        from goal_force_tpu.pipelines.flux import _hash_ids

        cfg = self.dit_cfg
        ids = _hash_ids(prompt, 1 << 30, cfg.txt_len)
        rng = np.random.default_rng(abs(int(ids[0])) % (1 << 31))
        emb = rng.normal(size=(1, cfg.txt_len, cfg.text_dim)).astype(np.float32)
        mask = np.zeros((1, cfg.txt_len), np.int32)
        mask[:, :max(1, len(prompt.split()))] = 1
        pooled = rng.normal(size=(1, cfg.pooled_dim)).astype(np.float32)
        return jnp.asarray(emb), jnp.asarray(mask), jnp.asarray(pooled)

    @functools.cached_property
    def _denoise_step(self):
        cfg = self.dit_cfg
        attn_impl = self.attn_impl

        @functools.partial(jax.jit,
                           static_argnames=("use_cfg", "token_replace"))
        def vel(dit, latents, timestep, emb, mask, pooled, guidance,
                cfg_scale=1.0, image_latents=None, use_cfg=False,
                token_replace=False):
            # rows of emb/mask/pooled: [posi(, nega)]; merged into one call
            if token_replace:
                # i2v: the first latent frame is the clean conditioning image
                # every step (reference hunyuan_video.py:205-208)
                latents = jnp.concatenate(
                    [image_latents.astype(latents.dtype), latents[:, 1:]],
                    axis=1)
            b = latents.shape[0]
            n = 2 if use_cfg else 1
            x = jnp.concatenate([latents] * n, axis=0)
            t = jnp.concatenate([timestep] * n, axis=0)
            g = jnp.concatenate([guidance] * n, axis=0)
            v = hunyuan_video_dit_forward(
                dit, cfg, x, t, emb, mask, pooled, g,
                attn_impl=attn_impl, token_replace=token_replace)
            if use_cfg:
                v = v[b:] + cfg_scale * (v[:b] - v[b:])
            return latents, v.astype(latents.dtype)

        @functools.partial(jax.jit,
                           static_argnames=("use_cfg", "token_replace"))
        def fn(dit, latents, timestep, sigma, sigma_next, emb, mask, pooled,
               guidance, cfg_scale=1.0, image_latents=None, use_cfg=False,
               token_replace=False):
            latents, v = vel(dit, latents, timestep, emb, mask, pooled,
                             guidance, cfg_scale, image_latents,
                             use_cfg=use_cfg, token_replace=token_replace)
            return fm.euler_step(latents, v, sigma, sigma_next)

        return fn, vel

    @functools.cached_property
    def _teacache_fns(self):
        """Three jitted pieces for the TeaCache path (positive stream only, as
        in the reference where only the posi forward carries tea_cache,
        hunyuan_video.py:317-321): signal, full trunk (returns residual), and
        skip (replay residual through the head)."""
        from goal_force_tpu.models.hunyuan_video_dit import (
            hunyuan_video_head,
            hunyuan_video_prelude,
            hunyuan_video_teacache_signal,
            hunyuan_video_trunk,
        )

        cfg = self.dit_cfg
        attn_impl = self.attn_impl

        @functools.partial(jax.jit, static_argnames=("token_replace",))
        def signal(dit, latents, timestep, emb, mask, pooled, guidance,
                   token_replace=False):
            pre = hunyuan_video_prelude(dit, cfg, latents, timestep, emb,
                                        mask, pooled, guidance,
                                        token_replace=token_replace)
            return hunyuan_video_teacache_signal(dit, cfg, pre["img"],
                                                 pre["vec"])

        @functools.partial(jax.jit, static_argnames=("token_replace",))
        def full(dit, latents, timestep, sigma, sigma_next, emb, mask, pooled,
                 guidance, token_replace=False):
            pre = hunyuan_video_prelude(dit, cfg, latents, timestep, emb,
                                        mask, pooled, guidance,
                                        token_replace=token_replace)
            img = hunyuan_video_trunk(dit, cfg, pre, attn_impl=attn_impl)
            residual = img - pre["img"]
            v = hunyuan_video_head(dit, cfg, img, pre["vec"], latents.shape)
            return fm.euler_step(latents, v.astype(latents.dtype), sigma,
                                 sigma_next), residual

        @functools.partial(jax.jit, static_argnames=("token_replace",))
        def skip(dit, latents, timestep, sigma, sigma_next, emb, mask, pooled,
                 guidance, residual, token_replace=False):
            pre = hunyuan_video_prelude(dit, cfg, latents, timestep, emb,
                                        mask, pooled, guidance,
                                        token_replace=token_replace)
            v = hunyuan_video_head(dit, cfg, pre["img"] + residual,
                                   pre["vec"], latents.shape)
            return fm.euler_step(latents, v.astype(latents.dtype), sigma,
                                 sigma_next)

        return signal, full, skip

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 1.0,
        input_video: Optional[np.ndarray] = None,    # (T, H, W, 3) [0, 1]
        input_images: Optional[np.ndarray] = None,   # (H, W, 3) [0, 1] (i2v)
        i2v_stability: bool = True,
        denoising_strength: float = 1.0,
        height: int = 720,
        width: int = 1280,
        num_frames: int = 129,
        num_inference_steps: int = 30,
        embedded_guidance: float = 6.0,
        sigma_shift: Optional[float] = None,
        seed: int = 0,
        tea_cache_l1_thresh: Optional[float] = None,
        tiled: bool = False,
        tile_size=(17, 30, 30),
        tile_stride=(12, 20, 20),
        step_processor: Optional[Callable] = None,
        progress: bool = False,
    ) -> np.ndarray:
        """Returns latents (1, T, h, w, 16) (or decoded frames when
        decode_video is supplied). Reference __call__ :133-230.

        cfg_scale != 1 runs true CFG with negative_prompt as one merged batch.
        input_video + denoising_strength: v2v (encode, add noise, shortened
        schedule, :173-178). input_images: HunyuanVideo-I2V — i2v_stability
        blends image latents into the init noise (:179-184) and each step
        clamps the first latent frame to the image and runs the token-replace
        forward (:205-208 + lets_dance_hunyuan_video_i2v). When encode_prompt
        is a two-arg (LLaVA MLLM) encoder, the conditioning image is also
        woven into the prompt embedding (reference :105-107 +
        make_llava_prompt_encoder). step_processor:
        frames -> frames applied to the rendered x0 every step (:214-224).
        tea_cache_l1_thresh: TeaCache on the positive stream."""
        cfg = self.dit_cfg
        schedule = fm.make_schedule(
            num_steps=num_inference_steps,
            shift=7.0 if sigma_shift is None else sigma_shift,
            sigma_min=0.0, extra_one_step=True,
            denoising_strength=denoising_strength
            if input_video is not None else 1.0,
        )
        use_cfg = cfg_scale != 1.0
        emb, mask, pooled = self._embed(prompt, seed,
                                        input_images=input_images)
        if use_cfg:
            emb_n, mask_n, pooled_n = self._embed(negative_prompt, seed)
            # i2v rows carry 144 extra image tokens; the reference runs
            # posi/nega as two calls — the merged batch pads to one length
            # (masked positions are inert)
            L = max(emb.shape[1], emb_n.shape[1])
            pad = lambda e, m: (
                jnp.pad(e, ((0, 0), (0, L - e.shape[1]), (0, 0))),
                jnp.pad(m, ((0, 0), (0, L - m.shape[1]))))
            emb, mask = pad(emb, mask)
            emb_n, mask_n = pad(emb_n, mask_n)
            emb = jnp.concatenate([emb, emb_n], axis=0)
            mask = jnp.concatenate([mask, mask_n], axis=0)
            pooled = jnp.concatenate([pooled, pooled_n], axis=0)
        emb = emb.astype(self.dtype)
        pooled = pooled.astype(self.dtype)
        tk = dict(tiled=tiled, tile_size=tuple(tile_size),
                  tile_stride=tuple(tile_stride)) if tiled else {}

        lt = (num_frames - 1) // 4 + 1
        noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (1, lt, height // 8, width // 8, cfg.in_channels),
            jnp.float32).astype(self.dtype)
        image_latents = None
        if input_images is not None:
            if self.encode_video is None:
                raise ValueError("input_images requires encode_video")
            img = jnp.asarray(np.asarray(input_images, np.float32)
                              * 2.0 - 1.0)[None, None]
            image_latents = self.encode_video(img).astype(self.dtype)
        if input_video is not None:
            if self.encode_video is None:
                raise ValueError("input_video requires encode_video")
            vid = jnp.asarray(np.asarray(input_video, np.float32)
                              * 2.0 - 1.0)[None]
            z = self.encode_video(vid, **tk).astype(self.dtype)
            latents = fm.add_noise(z, noise, schedule.sigmas[0])
        elif image_latents is not None and i2v_stability:
            # reference :179-184: latents = noise*0.999 + image*0.001 tiled
            t999 = 0.999
            latents = noise * t999 + jnp.broadcast_to(
                image_latents, noise.shape).astype(noise.dtype) * (1 - t999)
        else:
            latents = noise
        guidance = jnp.full((1,), embedded_guidance, self.dtype)
        token_replace = image_latents is not None

        tea = None
        if tea_cache_l1_thresh is not None:
            from goal_force_tpu.pipelines.teacache import TeaCache

            tea = TeaCache(num_inference_steps, tea_cache_l1_thresh,
                           "HunyuanVideo")
            tc_signal, tc_full, tc_skip = self._teacache_fns

        it = range(len(schedule))
        if progress:
            import tqdm

            it = tqdm.tqdm(it)
        step_fn, vel_fn = self._denoise_step
        for i in it:
            ts = jnp.full((1,), float(schedule.timesteps[i]), self.dtype)
            if step_processor is not None:
                # reference :214-224: render x0 (to_final), post-process the
                # frames on host, and step toward the processed video via
                # return_to_timestep's velocity
                if self.decode_video is None or self.encode_video is None:
                    raise ValueError("step_processor requires encode_video "
                                     "and decode_video")
                lat_in, v = vel_fn(self.dit, latents, ts, emb, mask, pooled,
                                   guidance, float(cfg_scale), image_latents,
                                   use_cfg=use_cfg,
                                   token_replace=token_replace)
                sigma = float(schedule.sigmas[i])
                x0 = lat_in - sigma * v                       # to_final
                frames = self.decode_video(x0.astype(jnp.float32), **tk)
                frames01 = np.asarray(
                    (np.asarray(frames[0], np.float32) + 1.0) / 2.0
                ).clip(0.0, 1.0)
                processed = step_processor(frames01)
                target = self.encode_video(
                    jnp.asarray(np.asarray(processed, np.float32)
                                * 2.0 - 1.0)[None], **tk).astype(lat_in.dtype)
                v2 = (lat_in - target) / sigma                # return_to_ts
                latents = fm.euler_step(lat_in, v2, schedule.sigmas[i],
                                        schedule.sigma_next(i))
            elif tea is not None and not use_cfg:
                lat_in = latents
                if token_replace:
                    lat_in = jnp.concatenate(
                        [image_latents.astype(latents.dtype),
                         latents[:, 1:]], axis=1)
                sig = tc_signal(self.dit, lat_in, ts, emb, mask, pooled,
                                guidance, token_replace=token_replace)
                if tea.should_skip(sig):
                    latents = tc_skip(self.dit, lat_in, ts,
                                      schedule.sigmas[i],
                                      schedule.sigma_next(i), emb, mask,
                                      pooled, guidance, tea.residual,
                                      token_replace=token_replace)
                else:
                    latents, residual = tc_full(
                        self.dit, lat_in, ts, schedule.sigmas[i],
                        schedule.sigma_next(i), emb, mask, pooled, guidance,
                        token_replace=token_replace)
                    tea.residual = residual
            else:
                latents = step_fn(
                    self.dit, latents, ts, schedule.sigmas[i],
                    schedule.sigma_next(i), emb, mask, pooled, guidance,
                    float(cfg_scale), image_latents, use_cfg=use_cfg,
                    token_replace=token_replace)
        if self.decode_video is not None:
            return self.decode_video(latents, **tk)
        return np.asarray(latents, np.float32)


# Conditioning templates wrapped around the user prompt before the LLM runs,
# and the token bookkeeping to crop the scaffold back out of the hidden states
# (reference diffsynth/prompters/hunyuan_video_prompter.py:8-66 — the strings
# and offsets are checkpoint-defined data, required for parity).
_TPL_IMAGE = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the image by "
    "detailing the color, shape, size, texture, quantity, text, spatial "
    "relationships of the objects and background:<|eot_id|>"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>")
_TPL_VIDEO = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the video by "
    "detailing the following aspects: "
    "1. The main content and theme of the video."
    "2. The color, shape, size, texture, quantity, text, and spatial "
    "relationships of the objects."
    "3. Actions, events, behaviors temporal relationships, physical movement "
    "changes of the objects."
    "4. background environment, light, style and atmosphere."
    "5. camera angles, movements, and transitions used in the video:<|eot_id|>"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>")
_TPL_IMAGE_I2V = (
    "<|start_header_id|>system<|end_header_id|>\n\n<image>\nDescribe the "
    "image by detailing the color, shape, size, texture, quantity, text, "
    "spatial relationships of the objects and background:<|eot_id|>"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
    "<|start_header_id|>assistant<|end_header_id|>\n\n")
_TPL_VIDEO_I2V = (
    "<|start_header_id|>system<|end_header_id|>\n\n<image>\nDescribe the "
    "video by detailing the following aspects according to the reference "
    "image: "
    "1. The main content and theme of the video."
    "2. The color, shape, size, texture, quantity, text, and spatial "
    "relationships of the objects."
    "3. Actions, events, behaviors temporal relationships, physical movement "
    "changes of the objects."
    "4. background environment, light, style and atmosphere."
    "5. camera angles, movements, and transitions used in the video:"
    "<|eot_id|>\n\n"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
    "<|start_header_id|>assistant<|end_header_id|>\n\n")

HUNYUAN_PROMPT_TEMPLATES = {
    "image": {"template": _TPL_IMAGE, "crop_start": 36},
    "video": {"template": _TPL_VIDEO, "crop_start": 95},
    "image-i2v": {"template": _TPL_IMAGE_I2V, "crop_start": 36,
                  "image_emb_start": 5, "image_emb_end": 581,
                  "image_emb_len": 576, "double_return_token_id": 271},
    "video-i2v": {"template": _TPL_VIDEO_I2V, "crop_start": 103,
                  "image_emb_start": 5, "image_emb_end": 581,
                  "image_emb_len": 576, "double_return_token_id": 271},
}


def crop_mllm_hidden_states(hidden, input_ids, attention_mask, tpl,
                            image_embed_interleave: int = 4):
    """Reassemble the MLLM output into [image tokens ; prompt tokens]
    (reference encode_prompt_using_mllm, hunyuan_video_prompter.py:156-236).

    `hidden` is the LLaVA decoder output where the one ``<image>`` placeholder
    has already expanded into `image_emb_len` positions; `input_ids`/`mask`
    are the UNEXPANDED (B, S) token arrays. Crops: (a) the projected image
    features at [image_emb_start, image_emb_end), subsampled by
    ``::image_embed_interleave``; (b) the user text after the template
    scaffold, minus the 4-token assistant header that follows the LAST
    double-return token (id 271) in each row. Truncated (over-long) prompts
    lose the trailing assistant "\\n\\n" but keep the scaffold double-returns
    (which all sit BEFORE the user text at crop_start), so a row whose last
    hit is <= crop_start anchors the assistant crop at the sequence end —
    the reference's 3-of-4-hits fallback (:184-192)."""
    ids = np.asarray(input_ids)
    mask = np.asarray(attention_mask)
    b, s = ids.shape
    crop = tpl["crop_start"]
    img_len = tpl["image_emb_len"]
    text_start = crop - 1 + img_len
    drt = tpl["double_return_token_id"]
    img_h = hidden[:, tpl["image_emb_start"]:tpl["image_emb_end"]]
    img_h = img_h[:, ::image_embed_interleave]
    rows_h, rows_m = [], []
    for i in range(b):
        hits = np.nonzero(ids[i] == drt)[0]
        last = int(hits[-1]) if len(hits) else s
        if last <= crop:
            # truncation cut the assistant turn: only scaffold double-returns
            # (all before the user text) survive — anchor at sequence end
            last = s
        a_start, a_end = last - 1 + img_len - 4, last - 1 + img_len
        rows_h.append(jnp.concatenate(
            [hidden[i, text_start:a_start], hidden[i, a_end:]], axis=0))
        rows_m.append(np.concatenate(
            [mask[i, crop:last - 4], mask[i, last:]], axis=0))
    text_h = jnp.stack(rows_h)
    text_m = jnp.asarray(np.stack(rows_m))
    emb = jnp.concatenate([img_h, text_h], axis=1)
    m = jnp.concatenate(
        [jnp.ones((b, img_h.shape[1]), text_m.dtype), text_m], axis=1)
    return emb, m


def make_llava_prompt_encoder(llava_params, llava_cfg, clip_params, clip_cfg,
                              txt_len: int, tokenize_llama=None,
                              tokenize_clip=None, hidden_state_skip_layer=2,
                              data_type: str = "video",
                              image_embed_interleave: int = 4,
                              template: Optional[dict] = None,
                              text_template: Optional[dict] = None):
    """encode(prompt, images=None) over the HunyuanVideo-I2V LLaVA tower
    (reference HunyuanVideoMLLMEncoder + encode_prompt_using_mllm). With
    `images`, the i2v template (``<image>`` in the system turn) runs through
    models/llava.llava_encode and the scaffold is cropped out by
    crop_mllm_hidden_states; without, the plain text template runs through the
    tower's own llama core. (The reference crashes on that text-only branch —
    its MLLM forward binds attention_mask to pixel_values,
    hunyuan_video_prompter.py:147 — so the sane text fallback here is a
    deliberate fix, reachable only with cfg_scale != 1.)"""
    from goal_force_tpu.models.llava import clip_preprocess_image, llava_encode
    from goal_force_tpu.models.text_encoders import llama_encode

    text_enc = make_llama_prompt_encoder(
        llava_params["llama"], llava_cfg.text, clip_params, clip_cfg, txt_len,
        tokenize_llama=tokenize_llama, tokenize_clip=tokenize_clip,
        hidden_state_skip_layer=hidden_state_skip_layer, data_type=data_type,
        template=text_template)
    pooled_fn = make_clip_pooled_encoder(clip_params, clip_cfg, tokenize_clip)
    tpl = template or HUNYUAN_PROMPT_TEMPLATES[data_type + "-i2v"]

    def encode(prompt: str, images=None):
        if images is None:
            return text_enc(prompt)
        if tokenize_llama is None:
            raise ValueError("image-conditioned prompts need a real llama "
                             "tokenizer (pass llama_tokenizer_dir)")
        text = tpl["template"].format(prompt)
        length = txt_len + tpl["crop_start"]
        raw = tokenize_llama.with_length(length)
        ids = raw(text)[None]
        n_real = min(len(raw.encode(text)), length)
        mask = np.zeros((1, length), np.int32)
        mask[:, :n_real] = 1
        if not isinstance(images, (list, tuple)):
            images = [images]
        pixels = jnp.asarray(np.stack(
            [clip_preprocess_image(im, llava_cfg.vision.image_size)
             for im in images]))
        hidden = llava_encode(llava_params, llava_cfg, ids, pixels,
                              jnp.asarray(mask),
                              hidden_state_skip_layer=hidden_state_skip_layer)
        emb, m = crop_mllm_hidden_states(hidden, ids, mask, tpl,
                                         image_embed_interleave)
        pooled = pooled_fn(prompt)
        if pooled is None:
            pooled = jnp.zeros((1, emb.shape[-1]), emb.dtype)
        return emb, m, pooled

    return encode


def make_llama_prompt_encoder(llama_params, llama_cfg, clip_params, clip_cfg,
                              txt_len: int, tokenize_llama=None,
                              tokenize_clip=None, hidden_state_skip_layer=2,
                              data_type: str = "video",
                              template: Optional[dict] = None):
    """Build an encode_prompt callable from the HunyuanVideo text towers: the
    Llama LLM hidden states (skip-2 layers, models/text_encoders.llama_encode)
    and the CLIP pooled embedding (reference hunyuan_video_text_encoder.py:6-49
    + the CLIP conditioner).

    With a real tokenizer, the prompt is wrapped in the reference's
    conditioning template and the scaffold prefix is cropped back out of the
    hidden states (encode_prompt_using_llm, hunyuan_video_prompter.py:131-154);
    the hash-id fallback skips the template (crop offsets are tokenizer
    semantics the hash path doesn't have)."""
    import numpy as _np

    from goal_force_tpu.models.text_encoders import llama_encode
    from goal_force_tpu.pipelines.flux import _hash_ids

    pooled_fn = make_clip_pooled_encoder(clip_params, clip_cfg, tokenize_clip)
    tpl = template or HUNYUAN_PROMPT_TEMPLATES[data_type]

    def encode(prompt: str):
        if tokenize_llama is not None:
            text = tpl["template"].format(prompt)
            crop = tpl["crop_start"]
            length = txt_len + crop
            raw = tokenize_llama.with_length(length)
            ids = _np.asarray(raw(text))[None]
            n_real = min(len(raw.encode(text)), length)
            mask = _np.zeros((1, length), _np.int32)
            mask[:, :n_real] = 1
        else:
            ids = _hash_ids(prompt, llama_cfg.vocab, txt_len)[None]
            crop = 0
            mask = _np.asarray(ids > 0, _np.int32)
        ids = jnp.asarray(ids, jnp.int32)
        mask = jnp.asarray(mask)
        emb = llama_encode(llama_params, llama_cfg, ids, mask,
                           hidden_state_skip_layer=hidden_state_skip_layer)
        emb, mask = emb[:, crop:], mask[:, crop:]
        pooled = pooled_fn(prompt)
        if pooled is None:
            pooled = jnp.zeros((1, emb.shape[-1]), emb.dtype)
        return emb, mask, pooled

    return encode


def make_clip_pooled_encoder(clip_params, clip_cfg, tokenize_clip=None):
    """prompt -> pooled CLIP-L embedding (or None without clip weights) — the
    reference's encode_prompt_using_clip over the RAW (untemplated) prompt
    (hunyuan_video_prompter.py:119-130,264)."""
    import numpy as _np

    from goal_force_tpu.pipelines.flux import _hash_ids

    def pooled_fn(prompt: str):
        if clip_params is None:
            return None
        cids = _np.asarray(tokenize_clip(prompt))[None] \
            if tokenize_clip is not None else \
            _hash_ids(prompt, clip_cfg.vocab_size, clip_cfg.max_positions)[None]
        cids = jnp.asarray(cids, jnp.int32)
        if "text_proj" in clip_params:
            from goal_force_tpu.models.clip import clip_encode_text

            return clip_encode_text(clip_params, clip_cfg, cids)
        # plain CLIPTextModel pooled output (final-LN + argmax-eos), the
        # tower HunyuanVideo conditions on (reference
        # hunyuan_video_text_encoder.py CLIP branch)
        from goal_force_tpu.models.sd_text_encoder import sd3_text1_encode

        pooled, _ = sd3_text1_encode(clip_params, cids, clip_cfg)
        return pooled

    return pooled_fn
