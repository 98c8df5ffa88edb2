"""Auto-loading: weight file -> detected kind -> inferred config -> params.

This is the TPU-native replacement for the reference's ModelManager load path
(reference: diffsynth/models/model_manager.py:395-461 — MD5 key-hash lookup
into diffsynth/configs/model_config.py:141-178, then per-class converters).
Here the family is detected structurally (io/detect.py) and the config is
recovered from the shapes actually present; only quantities weights cannot
reveal (head counts, rope axis splits) take keyword defaults sized for the
real released checkpoints, overridable for tiny test files.

`load_model(path_or_sd)` returns {"kind", "config", "params"} for every
detectable family; the per-pipeline `from_pretrained` constructors assemble
these into runnable pipelines.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Optional, Union

import numpy as np

from goal_force_tpu.io.detect import detect_model_kind


def load_weights(path: Union[str, Mapping]) -> Dict[str, np.ndarray]:
    """Load safetensors (file/glob/list) or torch pickle into a numpy dict."""
    if isinstance(path, dict):
        return path                  # preserves dict subclasses (key audits)
    if isinstance(path, Mapping):
        return dict(path)
    from goal_force_tpu.io.safetensors_io import load_safetensors, load_torch_pth

    if str(path).endswith((".pth", ".pt", ".bin", ".ckpt")):
        return load_torch_pth(path)
    return load_safetensors(path)


def _max_index(sd, prefix: str) -> int:
    idx = [int(k[len(prefix):].split(".")[0]) for k in sd
           if k.startswith(prefix) and k[len(prefix):].split(".")[0].isdigit()]
    return max(idx) + 1 if idx else 0


def _shape(sd, k):
    return tuple(np.asarray(sd[k]).shape)


def _default_axes(head_dim: int):
    """RoPE axis split: the released Flux/Qwen/HunyuanVideo models all use
    (16, 56, 56) at head_dim 128; any other head size (tiny tests) falls back
    to the (d/4, 3d/8, 3d/8) proportion rounded to even."""
    if head_dim == 128:
        return (16, 56, 56)
    a = max(2, (head_dim // 4) & ~1)
    rest = head_dim - a
    return (a, rest // 2, rest - rest // 2)


# ---------------------------------------------------------------------------
# Per-family config inference
# ---------------------------------------------------------------------------

def infer_flux_config(sd, num_heads: Optional[int] = None, axes_dim=None):
    from goal_force_tpu.configs import FluxDiTConfig

    dim = _shape(sd, "x_embedder.weight")[0]
    heads = num_heads or max(1, dim // 128)
    return FluxDiTConfig(
        dim=dim,
        num_heads=heads,
        num_joint_blocks=_max_index(sd, "blocks."),
        num_single_blocks=_max_index(sd, "single_blocks."),
        in_dim=_shape(sd, "x_embedder.weight")[1],
        out_dim=_shape(sd, "final_proj_out.weight")[0],
        text_dim=_shape(sd, "context_embedder.weight")[1],
        pooled_dim=_shape(sd, "pooled_text_embedder.0.weight")[1],
        freq_dim=_shape(sd, "time_embedder.timestep_embedder.0.weight")[1],
        axes_dim=tuple(axes_dim) if axes_dim else _default_axes(dim // heads),
        guidance_embed="guidance_embedder.timestep_embedder.0.weight" in sd,
    )


def infer_sd3_config(sd):
    from goal_force_tpu.models.sd3_dit import SD3DiTConfig

    w = _shape(sd, "pos_embedder.proj.weight")
    n = _max_index(sd, "blocks.")
    return SD3DiTConfig(
        dim=w[0], in_channels=w[1], patch=w[2],
        num_layers=n,
        num_dual_blocks=sum(1 for i in range(n)
                            if f"blocks.{i}.attn2.a_to_qkv.weight" in sd),
        use_rms_norm="blocks.0.attn.norm_q_a.weight" in sd,
        pos_embed_max_size=_shape(sd, "pos_embedder.pos_embed")[1],
        text_dim=_shape(sd, "context_embedder.weight")[1],
        pooled_dim=_shape(sd, "pooled_text_embedder.0.weight")[1],
        freq_dim=_shape(sd, "time_embedder.timestep_embedder.0.weight")[1],
    )


def infer_hunyuan_video_config(sd, num_heads: Optional[int] = None,
                               rope_dims=None):
    from goal_force_tpu.models.hunyuan_video_dit import HunyuanVideoDiTConfig

    w = _shape(sd, "img_in.proj.weight")
    dim = w[0]
    heads = num_heads or max(1, dim // 128)
    return HunyuanVideoDiTConfig(
        dim=dim, in_channels=w[1], patch=w[2:],
        num_heads=heads,
        num_double_blocks=_max_index(sd, "double_blocks."),
        num_single_blocks=_max_index(sd, "single_blocks."),
        text_dim=_shape(sd, "txt_in.input_embedder.weight")[1],
        pooled_dim=_shape(sd, "vector_in.0.weight")[1],
        guidance_embed="guidance_in.timestep_embedder.0.weight" in sd,
        freq_dim=_shape(sd, "txt_in.t_embedder.timestep_embedder.0.weight")[1],
        rope_dims=tuple(rope_dims) if rope_dims else _default_axes(dim // heads),
    )


def infer_qwen_image_config(sd, axes_dim=None):
    from goal_force_tpu.models.qwen_image_dit import QwenImageDiTConfig

    dim = _shape(sd, "img_in.weight")[0]
    head_dim = _shape(sd, "transformer_blocks.0.attn.norm_added_q.weight")[0]
    return QwenImageDiTConfig(
        dim=dim, head_dim=head_dim,
        num_heads=_shape(sd, "transformer_blocks.0.attn.to_q.weight")[0] // head_dim,
        num_layers=_max_index(sd, "transformer_blocks."),
        in_dim=_shape(sd, "img_in.weight")[1],
        text_dim=_shape(sd, "txt_in.weight")[1],
        freq_dim=_shape(sd, "time_text_embed.timestep_embedder.linear_1.weight")[1],
        axes_dim=tuple(axes_dim) if axes_dim else _default_axes(head_dim),
    )


def infer_cog_config(sd, rope_dim: Optional[int] = None):
    from goal_force_tpu.models.cog_dit import CogDiTConfig

    w = _shape(sd, "patchify.proj.weight")
    dim = w[0]
    head_dim = rope_dim if rope_dim else (64 if dim % 48 == 0 else 16)
    return CogDiTConfig(
        dim=dim,
        cond_dim=_shape(sd, "time_embedder.timestep_embedder.0.weight")[0],
        num_blocks=_max_index(sd, "blocks."),
        text_dim=_shape(sd, "context_embedder.weight")[1],
        freq_dim=_shape(sd, "time_embedder.timestep_embedder.0.weight")[1],
        rope_dim=head_dim,
    )


def infer_stepvideo_config(sd):
    from goal_force_tpu.models.stepvideo_dit import StepVideoConfig

    w = _shape(sd, "pos_embed.proj.weight")
    dim = w[0]
    head_dim = _shape(sd, "transformer_blocks.0.attn1.q_norm.weight")[0]
    return StepVideoConfig(
        num_heads=dim // head_dim, head_dim=head_dim,
        num_layers=_max_index(sd, "transformer_blocks."),
        in_channels=w[1],
        caption_dim=_shape(sd, "caption_projection.linear_1.weight")[1],
        clip_dim=_shape(sd, "clip_projection.weight")[1],
        rope_split=(head_dim // 2, head_dim // 4, head_dim // 4),
    )


def infer_hunyuan_dit_config(sd, num_heads: Optional[int] = None):
    from goal_force_tpu.models.hunyuan_dit import HunyuanDiTConfig

    w = _shape(sd, "patch_embedder.proj.weight")
    dim = w[0]
    t5_len = _shape(sd, "t5_pooler.positional_embedding")[0] - 1
    pad = _shape(sd, "text_emb_padding")
    n = _max_index(sd, "blocks.")
    n_up = sum(1 for i in range(n) if f"blocks.{i}.skip_linear.weight" in sd)
    return HunyuanDiTConfig(
        dim=dim, num_heads=num_heads or max(1, dim // 88),
        num_layers_down=n - n_up, num_layers_up=n_up,
        text_dim=pad[1], t5_dim=_shape(sd, "t5_embedder.0.weight")[1],
        text_len=pad[0] - t5_len, t5_len=t5_len,
        mlp_ratio=_shape(sd, "blocks.0.mlp.0.weight")[0] / dim,
    )


def infer_omnigen_config(sd, num_heads: Optional[int] = None, **kw):
    from goal_force_tpu.models.omnigen import OmniGenConfig

    vocab, hidden = _shape(sd, "llm.embed_tokens.weight")
    heads = num_heads or max(1, hidden // 96)    # released Phi-3: 3072/32
    head_dim = hidden // heads
    qkv_out = _shape(sd, "llm.layers.0.self_attn.qkv_proj.weight")[0]
    xw = _shape(sd, "x_embedder.proj.weight")
    return OmniGenConfig(
        hidden_size=hidden, vocab=vocab,
        num_layers=_max_index(sd, "llm.layers."),
        num_heads=heads,
        num_kv_heads=(qkv_out - hidden) // (2 * head_dim),
        intermediate_size=_shape(sd, "llm.layers.0.mlp.gate_up_proj.weight")[0] // 2,
        in_channels=xw[1], patch_size=xw[2],
        **kw,
    )


def infer_chatglm_config(sd, num_heads: Optional[int] = None):
    from goal_force_tpu.models.kolors_text_encoder import ChatGLMConfig

    vocab, hidden = _shape(sd, "embedding.word_embeddings.weight")
    heads = num_heads or max(1, hidden // 128)
    kv_ch = hidden // heads
    qkv_out = _shape(
        sd, "encoder.layers.0.self_attention.query_key_value.weight")[0]
    return ChatGLMConfig(
        hidden_size=hidden, vocab=vocab,
        num_layers=_max_index(sd, "encoder.layers."),
        num_heads=heads, kv_channels=kv_ch,
        kv_groups=(qkv_out - hidden) // (2 * kv_ch),
        ffn_hidden_size=_shape(
            sd, "encoder.layers.0.mlp.dense_h_to_4h.weight")[0] // 2,
    )


def infer_clip_config(sd, num_heads: Optional[int] = None):
    from goal_force_tpu.models.clip import CLIPConfig

    vocab, dim = _shape(sd, "token_embedding.weight")
    with_projection = "text_projection.weight" in sd
    return CLIPConfig(
        vocab_size=vocab, text_dim=dim,
        text_heads=num_heads or max(1, dim // 64),
        text_layers=_max_index(sd, "encoders."),
        max_positions=_shape(sd, "position_embeds")[1],
        hidden_act="gelu" if with_projection else "quick_gelu",
        **({"text_pooling": "argmax"} if with_projection else {}),
    ), with_projection


def infer_t5_v11_config(sd, num_heads: Optional[int] = None):
    from goal_force_tpu.configs import T5Config

    vocab, dim = _shape(sd, "token_embedding.weight")
    dim_attn = _shape(sd, "blocks.0.attn.q.weight")[0]
    gate = "blocks.0.ffn.gate.0.weight"
    return T5Config(
        vocab=vocab, dim=dim, dim_attn=dim_attn,
        dim_ffn=_shape(sd, gate)[0] if gate in sd
        else _shape(sd, "blocks.0.ffn.fc1.weight")[0],
        num_heads=num_heads or max(1, dim_attn // 64),
        num_layers=_max_index(sd, "blocks."),
        num_buckets=_shape(sd, "pos_embedding.embedding.weight")[0],
        shared_pos=True,
    )


# ---------------------------------------------------------------------------
# Unified entry
# ---------------------------------------------------------------------------

def infer_llama_config(sd, num_heads: Optional[int] = None, prefix: str = ""):
    from goal_force_tpu.models.text_encoders import LlamaConfig

    vocab, hidden = _shape(sd, prefix + "embed_tokens.weight")
    heads = num_heads or max(1, hidden // 128)
    head_dim = hidden // heads
    return LlamaConfig(
        hidden_size=hidden, vocab=vocab, num_heads=heads,
        num_layers=_max_index(sd, prefix + "layers."),
        num_kv_heads=_shape(sd, prefix + "layers.0.self_attn.k_proj.weight")[0]
        // head_dim,
        intermediate_size=_shape(sd, prefix + "layers.0.mlp.gate_proj.weight")[0],
    )


def infer_llava_config(sd, num_heads: Optional[int] = None,
                       image_token_id: Optional[int] = None):
    """LlavaForConditionalGeneration checkpoint -> LlavaConfig, shapes only
    (vision tower geometry from the embeddings, llama core via
    infer_llama_config)."""
    from goal_force_tpu.models.clip import CLIPConfig
    from goal_force_tpu.models.llava import LlavaConfig

    if any(k.startswith("language_model.model.") for k in sd):
        lm, vt = "language_model.model.", "vision_tower."
    else:
        lm, vt = "model.language_model.", "model.vision_tower."
    patch = _shape(sd, vt + "vision_model.embeddings.patch_embedding.weight")
    vision_dim, _, patch_size, _ = patch
    n_pos = _shape(sd, vt + "vision_model.embeddings.position_embedding.weight")[0]
    image_size = int(round((n_pos - 1) ** 0.5)) * patch_size
    vision = CLIPConfig(
        image_size=image_size, patch_size=patch_size, vision_dim=vision_dim,
        vision_heads=max(1, vision_dim // 64),
        vision_layers=_max_index(sd, vt + "vision_model.encoder.layers."),
        hidden_act="quick_gelu")
    extra = {} if image_token_id is None else \
        {"image_token_id": image_token_id}
    return LlavaConfig(
        text=infer_llama_config(sd, num_heads=num_heads, prefix=lm),
        vision=vision, **extra)


def infer_qwen_vl_text_config(sd, num_heads: Optional[int] = None,
                              prefix: str = "model."):
    from goal_force_tpu.models.qwen_vl import QwenVLTextConfig

    vocab, hidden = _shape(sd, prefix + "embed_tokens.weight")
    heads = num_heads or max(1, hidden // 128)
    head_dim = hidden // heads
    # mrope axis split scales with head_dim: (16, 24, 24) at the released 128
    a = max(1, head_dim // 8)
    b = (head_dim // 2 - a) // 2
    return QwenVLTextConfig(
        hidden_size=hidden, vocab=vocab, num_heads=heads,
        num_layers=_max_index(sd, prefix + "layers."),
        num_kv_heads=_shape(sd, prefix + "layers.0.self_attn.k_proj.weight")[0]
        // head_dim,
        intermediate_size=_shape(sd, prefix + "layers.0.mlp.gate_proj.weight")[0],
        mrope_section=(a, b, head_dim // 2 - a - b),
    )


def infer_bert_config(sd, num_heads: Optional[int] = None, prefix: str = ""):
    from goal_force_tpu.models.text_encoders import BertConfig

    vocab, hidden = _shape(sd, prefix + "embeddings.word_embeddings.weight")
    return BertConfig(
        hidden_size=hidden, vocab=vocab,
        num_heads=num_heads or max(1, hidden // 64),
        num_layers=_max_index(sd, prefix + "encoder.layer."),
        intermediate_size=_shape(
            sd, prefix + "encoder.layer.0.intermediate.dense.weight")[0],
        max_positions=_shape(
            sd, prefix + "embeddings.position_embeddings.weight")[0],
        type_vocab=_shape(
            sd, prefix + "embeddings.token_type_embeddings.weight")[0],
    )


def load_model(path_or_sd, kind: Optional[str] = None, config=None,
               **infer_kw) -> Dict:
    """Detect + infer + convert one weight file. Returns
    {"kind", "config", "params"} (params as numpy pytrees; cast on device
    placement). `infer_kw` forwards to the family's config inference
    (e.g. num_heads/axes_dim for tiny test checkpoints)."""
    sd = load_weights(path_or_sd)
    kind = kind or detect_model_kind(sd)

    def out(cfg, params):
        return {"kind": kind, "config": cfg, "params": params}

    if kind == "flux_dit":
        from goal_force_tpu.models.flux_dit import flux_dit_params_from_torch

        cfg = config or infer_flux_config(sd, **infer_kw)
        return out(cfg, flux_dit_params_from_torch(sd, cfg))
    if kind == "flux_controlnet":
        from goal_force_tpu.models.flux_controlnet import (
            FluxControlNetConfig,
            flux_controlnet_params_from_torch,
        )

        dit_cfg = infer_kw.get("dit_cfg")
        if dit_cfg is None:
            from goal_force_tpu.configs import FluxDiTConfig

            dim = _shape(sd, "x_embedder.weight")[0]
            heads = infer_kw.get("num_heads") or max(1, dim // 128)
            dit_cfg = FluxDiTConfig(
                dim=dim, num_heads=heads,
                in_dim=_shape(sd, "x_embedder.weight")[1],
                text_dim=_shape(sd, "context_embedder.weight")[1],
                pooled_dim=_shape(sd, "pooled_text_embedder.0.weight")[1],
                freq_dim=_shape(sd, "time_embedder.timestep_embedder.0.weight")[1],
                axes_dim=tuple(infer_kw.get("axes_dim")
                               or _default_axes(dim // heads)),
                guidance_embed="guidance_embedder.timestep_embedder.0.weight" in sd)
        extra = 0
        if "controlnet_x_embedder.weight" in sd:
            # extra conditioning channels beyond the patchified latents
            extra = max(0, _shape(sd, "controlnet_x_embedder.weight")[1]
                        - dit_cfg.in_dim)
        cfg = config or FluxControlNetConfig(
            dit=dit_cfg,
            num_joint_blocks=_max_index(sd, "blocks."),
            num_single_blocks=_max_index(sd, "single_blocks."),
            num_mode=_shape(sd, "controlnet_mode_embedder.weight")[0]
            if "controlnet_mode_embedder.weight" in sd else 0,
            additional_input_dim=extra)
        return out(cfg, flux_controlnet_params_from_torch(sd, cfg))
    if kind == "sd3_dit":
        from goal_force_tpu.models.sd3_dit import sd3_dit_params_from_torch

        cfg = config or infer_sd3_config(sd)
        return out(cfg, sd3_dit_params_from_torch(sd, cfg))
    if kind == "hunyuan_video_dit":
        from goal_force_tpu.models.hunyuan_video_dit import (
            hunyuan_video_dit_params_from_torch,
        )

        cfg = config or infer_hunyuan_video_config(sd, **infer_kw)
        return out(cfg, hunyuan_video_dit_params_from_torch(sd, cfg))
    if kind == "qwen_image_dit":
        from goal_force_tpu.models.qwen_image_dit import (
            qwen_image_dit_params_from_torch,
        )

        cfg = config or infer_qwen_image_config(sd, **infer_kw)
        return out(cfg, qwen_image_dit_params_from_torch(sd, cfg))
    if kind == "cog_dit":
        from goal_force_tpu.models.cog_dit import cog_dit_params_from_torch

        cfg = config or infer_cog_config(sd, **infer_kw)
        return out(cfg, cog_dit_params_from_torch(sd, cfg))
    if kind == "stepvideo_dit":
        from goal_force_tpu.models.stepvideo_dit import (
            stepvideo_dit_params_from_torch,
        )

        cfg = config or infer_stepvideo_config(sd)
        return out(cfg, stepvideo_dit_params_from_torch(sd, cfg))
    if kind == "hunyuan_dit":
        from goal_force_tpu.models.hunyuan_dit import (
            hunyuan_dit_params_from_torch,
        )

        cfg = config or infer_hunyuan_dit_config(sd, **infer_kw)
        return out(cfg, hunyuan_dit_params_from_torch(sd, cfg))
    if kind == "omnigen":
        from goal_force_tpu.models.omnigen import omnigen_params_from_torch

        cfg = config or infer_omnigen_config(sd, **infer_kw)
        return out(cfg, omnigen_params_from_torch(sd, cfg))
    if kind == "chatglm":
        from goal_force_tpu.models.kolors_text_encoder import (
            chatglm_params_from_torch,
        )

        cfg = config or infer_chatglm_config(sd, **infer_kw)
        return out(cfg, chatglm_params_from_torch(sd, cfg))
    if kind == "clip_text":
        cfg_wp = infer_clip_config(sd, **infer_kw) if config is None \
            else (config, "text_projection.weight" in sd)
        cfg, with_projection = cfg_wp
        if with_projection or "final_layer_norm.weight" not in sd:
            from goal_force_tpu.models.sd_text_encoder import (
                sdxl_text_params_from_torch,
            )

            return out(cfg, sdxl_text_params_from_torch(
                sd, cfg, with_projection=with_projection))
        from goal_force_tpu.models.sd_text_encoder import sd_text_params_from_torch

        return out(cfg, sd_text_params_from_torch(sd, cfg))
    if kind == "t5_encoder":
        from goal_force_tpu.io.torch_convert import t5_params_from_torch

        cfg = config or infer_t5_v11_config(sd, **infer_kw)
        return out(cfg, t5_params_from_torch(sd, cfg))
    if kind in ("sd_vae_encoder", "sd_vae_decoder", "sd3_vae_encoder",
                "sd3_vae_decoder"):
        from goal_force_tpu.models import sd_vae as V

        plan = infer_kw.get("plan") or (
            V.SD_VAE_ENCODER_PLAN if kind.endswith("encoder")
            else V.SD_VAE_DECODER_PLAN)
        fn = {"sd_vae_encoder": V.sd_vae_encoder_params_from_torch,
              "sd_vae_decoder": V.sd_vae_decoder_params_from_torch,
              "sd3_vae_encoder": V.sd3_vae_encoder_params_from_torch,
              "sd3_vae_decoder": V.sd3_vae_decoder_params_from_torch}[kind]
        return out({"plan": plan}, fn(sd, plan))
    if kind == "sdxl_unet":
        from goal_force_tpu.models.sdxl_unet import (
            SDXL_PLAN,
            sdxl_unet_params_from_torch,
        )

        plan = infer_kw.get("plan") or SDXL_PLAN
        return out({"plan": plan}, sdxl_unet_params_from_torch(sd, plan))
    if kind == "sd_unet":
        from goal_force_tpu.models.sd_unet import (
            SD15_PLAN,
            sd_unet_params_from_torch,
        )

        plan = infer_kw.get("plan") or SD15_PLAN
        return out({"plan": plan}, sd_unet_params_from_torch(sd, plan))
    if kind == "llama":
        from goal_force_tpu.models.text_encoders import llama_params_from_torch

        prefix = "model." if "model.embed_tokens.weight" in sd else ""
        cfg = config or infer_llama_config(sd, prefix=prefix, **infer_kw)
        return out(cfg, llama_params_from_torch(sd, cfg, prefix=prefix))
    if kind == "llava":
        from goal_force_tpu.models.llava import llava_params_from_torch

        cfg = config or infer_llava_config(sd, **infer_kw)
        return out(cfg, llava_params_from_torch(sd, cfg))
    if kind == "qwen_vl_text":
        from goal_force_tpu.models.qwen_vl import qwen_vl_text_params_from_torch

        prefix = "model." if "model.embed_tokens.weight" in sd else ""
        cfg = config or infer_qwen_vl_text_config(sd, prefix=prefix, **infer_kw)
        return out(cfg, qwen_vl_text_params_from_torch(sd, cfg, prefix=prefix))
    if kind == "bloom":
        from goal_force_tpu.models.bloom import (
            bloom_params_from_torch,
            infer_bloom_config,
        )

        cfg = config or infer_bloom_config(sd)
        if infer_kw.get("num_heads"):
            import dataclasses

            cfg = dataclasses.replace(cfg, num_heads=infer_kw["num_heads"])
        return out(cfg, bloom_params_from_torch(sd, cfg))
    if kind == "marian":
        from goal_force_tpu.models.marian import (
            infer_marian_config,
            marian_params_from_torch,
        )

        cfg = config or infer_marian_config(sd, infer_kw.get("hf"))
        return out(cfg, marian_params_from_torch(sd, cfg))
    if kind == "step1_llm":
        from goal_force_tpu.models.text_encoders import (
            Step1Config,
            step1_params_from_torch,
        )

        vocab, hidden = _shape(sd, "tok_embeddings.word_embeddings.weight")
        heads = infer_kw.get("num_heads") or max(1, hidden // 128)
        head_dim = hidden // heads
        qkv_out = _shape(sd, "transformer.layers.0.attention.wqkv.weight")[0]
        cfg = config or Step1Config(
            hidden_size=hidden, vocab=vocab, num_heads=heads,
            num_groups=(qkv_out - hidden) // (2 * head_dim),
            num_layers=_max_index(sd, "transformer.layers."),
            ffn_hidden_size=_shape(
                sd, "transformer.layers.0.feed_forward.w1.weight")[0],
            multiple_of=1,
        )
        return out(cfg, step1_params_from_torch(sd, cfg))
    if kind == "bert":
        from goal_force_tpu.models.text_encoders import bert_params_from_torch

        cfg = config or infer_bert_config(sd, **infer_kw)
        return out(cfg, bert_params_from_torch(sd, cfg))
    if kind == "hunyuan_video_vae":
        from goal_force_tpu.models import hunyuan_video_vae as hv

        cfg = config or infer_kw.get("vae_cfg") or hv.HunyuanVAEConfig()
        enc_side = any(k.startswith("encoder.") for k in sd)
        fn = hv.hunyuan_vae_encoder_params_from_torch if enc_side \
            else hv.hunyuan_vae_decoder_params_from_torch
        if enc_side and any(k.startswith("decoder.") for k in sd):
            return out(cfg, {
                "encoder": hv.hunyuan_vae_encoder_params_from_torch(sd, cfg),
                "decoder": hv.hunyuan_vae_decoder_params_from_torch(sd, cfg)})
        return out(cfg, fn(sd, cfg))
    if kind == "stepvideo_vae":
        from goal_force_tpu.models import stepvideo_vae as sv

        cfg = config or infer_kw.get("vae_cfg") or sv.StepVideoVAEConfig()
        return out(cfg, sv.stepvideo_vae_params_from_torch(sd, cfg))
    if kind == "qwen_image_vae":
        from goal_force_tpu.models import qwen_image_vae as qv

        cfg = config or infer_kw.get("vae_cfg")
        return out(cfg, qv.qwen_image_vae_params_from_torch(
            sd, **({"cfg": cfg} if cfg else {})))
    if kind in ("sd_controlnet", "sdxl_controlnet"):
        from goal_force_tpu.models import sd_controlnet as scn

        if kind == "sd_controlnet":
            plan = infer_kw.get("plan") or scn.SD_CONTROLNET_PLAN
            return out({"plan": plan},
                       scn.sd_controlnet_params_from_torch(sd, plan))
        plan = infer_kw.get("plan") or scn.SDXL_CONTROLNET_PLAN
        return out({"plan": plan},
                   scn.sdxl_controlnet_params_from_torch(sd, plan))
    if kind == "qwen_image_controlnet":
        from goal_force_tpu.models.qwen_image_controlnet import (
            QwenImageControlNetConfig,
            qwen_image_controlnet_params_from_torch,
        )

        dim = _shape(sd, "controlnet_blocks.0.input_proj.weight")[1]
        cfg = config or QwenImageControlNetConfig(
            dim=dim, num_layers=_max_index(sd, "controlnet_blocks."))
        return out(cfg, qwen_image_controlnet_params_from_torch(sd, cfg))
    if kind == "ipadapter":
        from goal_force_tpu.models.ipadapter import ip_adapter_params_from_torch

        return out(None, ip_adapter_params_from_torch(sd))
    if kind == "step1x_connector":
        from goal_force_tpu.models.step1x_connector import (
            Step1xConnectorConfig,
            step1x_connector_params_from_torch,
        )

        cfg = config or Step1xConnectorConfig()
        return out(cfg, step1x_connector_params_from_torch(sd, cfg))
    if kind == "sd_motion":
        from goal_force_tpu.models.sd_motion import (
            SD_MOTION_CALL,
            SDXL_MOTION_CALL,
            motion_params_from_torch,
        )

        call_map = infer_kw.get("call_map")
        if call_map is None:
            n = _max_index(sd, "motion_modules.")
            by_count = {len(set(SD_MOTION_CALL.values())): SD_MOTION_CALL,
                        len(set(SDXL_MOTION_CALL.values())): SDXL_MOTION_CALL}
            call_map = by_count.get(n, SD_MOTION_CALL)
        return out({"call_map": call_map},
                   motion_params_from_torch(sd, call_map))
    if kind == "svd_unet":
        from goal_force_tpu.models.svd_unet import (
            SVD_PLAN,
            svd_unet_params_from_torch,
        )

        plan = infer_kw.get("plan") or SVD_PLAN
        return out({"plan": plan}, svd_unet_params_from_torch(sd, plan))
    if kind == "svd_vae":
        from goal_force_tpu.models.svd_vae import (
            SVD_VAE_DECODER_PLAN,
            svd_vae_decoder_params_from_torch,
        )

        plan = infer_kw.get("plan") or SVD_VAE_DECODER_PLAN
        return out({"plan": plan}, svd_vae_decoder_params_from_torch(sd, plan))
    if kind == "esrgan":
        from goal_force_tpu.extensions.esrgan import rrdbnet_params_from_torch

        return out(None, rrdbnet_params_from_torch(sd))
    if kind == "rife":
        from goal_force_tpu.extensions.rife import ifnet_params_from_torch

        return out(None, ifnet_params_from_torch(sd))
    # fall through to the goal-force/Wan family dispatcher
    from goal_force_tpu.io.detect import convert_detected

    return convert_detected(sd, kind=kind,
                            **({"config": config} if config else {}))
