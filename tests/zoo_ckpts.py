"""Shared tiny reference-format checkpoint builders for zoo loading tests.

Each `build_*` constructs a REFERENCE torch module at tiny geometry (via the
reference's own classes, like the per-family golden tests do), seeds its
weights, and returns `(state_dict numpy, our_config)` — the exact file format
a user of the reference would hand to `ModelManager.load_model`
(reference: diffsynth/models/model_manager.py:395-461). Text encoders keep
REAL vocab sizes (tiny dims) so real-tokenized ids stay in range.

Used by tests/test_zoo_loading.py (detect + from_pretrained) and
tests/test_converter_coverage.py.
"""

from __future__ import annotations

import importlib
import importlib.machinery
import sys

import numpy as np

REF_MODELS = "/root/reference/diffsynth/models"


def refmodels(name: str):
    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refmodels", None, is_package=True))
    pkg.__path__ = [REF_MODELS]
    sys.modules.setdefault("refmodels", pkg)
    return importlib.import_module("refmodels." + name)


def sd_of(m) -> dict:
    return {k: v.detach().cpu().float().numpy() for k, v in m.state_dict().items()}


def _seed(m, scale=0.05, seed=0):
    import torch

    torch.manual_seed(seed)
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * scale
    return m.eval().float()


# ---------------------------------------------------------------------------
# DiTs / denoisers
# ---------------------------------------------------------------------------

def build_flux_dit():
    from goal_force_tpu.pipelines.flux import tiny_flux_configs
    from test_flux import _torch_tiny_flux

    cfg, _, _ = tiny_flux_configs()
    return sd_of(_torch_tiny_flux(cfg)), cfg


def build_flux_controlnet():
    """Tiny reference-format FluxControlNet via __new__ over the reference's
    own block classes (the class hardcodes the 12B geometry)."""
    import torch

    from goal_force_tpu.pipelines.flux import tiny_flux_configs

    ref_cn = refmodels("flux_controlnet")
    ref_flux = refmodels("flux_dit")
    ref_sd3 = refmodels("sd3_dit")
    cfg, _, _ = tiny_flux_configs()
    nj, ns, d = 2, 2, cfg.dim
    m = ref_cn.FluxControlNet.__new__(ref_cn.FluxControlNet)
    torch.nn.Module.__init__(m)
    m.pos_embedder = ref_flux.RoPEEmbedding(d, cfg.rope_theta, list(cfg.axes_dim))
    m.time_embedder = ref_sd3.TimestepEmbeddings(cfg.freq_dim, d)
    m.guidance_embedder = ref_sd3.TimestepEmbeddings(cfg.freq_dim, d)
    m.pooled_text_embedder = torch.nn.Sequential(
        torch.nn.Linear(cfg.pooled_dim, d), torch.nn.SiLU(),
        torch.nn.Linear(d, d))
    m.context_embedder = torch.nn.Linear(cfg.text_dim, d)
    m.x_embedder = torch.nn.Linear(cfg.in_dim, d)
    m.blocks = torch.nn.ModuleList(
        [ref_flux.FluxJointTransformerBlock(d, cfg.num_heads)
         for _ in range(nj)])
    m.single_blocks = torch.nn.ModuleList(
        [ref_flux.FluxSingleTransformerBlock(d, cfg.num_heads)
         for _ in range(ns)])
    m.controlnet_blocks = torch.nn.ModuleList(
        [torch.nn.Linear(d, d) for _ in range(nj)])
    m.controlnet_single_blocks = torch.nn.ModuleList(
        [torch.nn.Linear(d, d) for _ in range(ns)])
    m.controlnet_x_embedder = torch.nn.Linear(cfg.in_dim, d)
    return sd_of(_seed(m, 0.05)), cfg


def build_sd3_dit():
    from goal_force_tpu.models.sd3_dit import SD3DiTConfig

    ref = refmodels("sd3_dit")
    cfg = SD3DiTConfig(dim=64, num_layers=3, pos_embed_max_size=16)
    m = _seed(ref.SD3DiT(embed_dim=cfg.dim, num_layers=cfg.num_layers,
                         use_rms_norm=cfg.use_rms_norm,
                         num_dual_blocks=cfg.num_dual_blocks,
                         pos_embed_max_size=cfg.pos_embed_max_size), 0.1)
    return sd_of(m), cfg


def build_hunyuan_video_dit():
    from goal_force_tpu.models.hunyuan_video_dit import HunyuanVideoDiTConfig
    from test_hunyuan_video import _cpu_linear

    import torch

    ref = refmodels("hunyuan_video_dit")
    cfg = HunyuanVideoDiTConfig(dim=144, num_double_blocks=2,
                                num_single_blocks=2, text_dim=32,
                                rope_dims=(2, 2, 2), guidance_embed=True)
    orig, patched = _cpu_linear()
    torch.nn.Linear = patched
    try:
        m = ref.HunyuanVideoDiT(
            in_channels=16, hidden_size=cfg.dim, text_dim=cfg.text_dim,
            num_double_blocks=cfg.num_double_blocks,
            num_single_blocks=cfg.num_single_blocks, guidance_embed=True)
    finally:
        torch.nn.Linear = orig
    return sd_of(_seed(m, 0.1)), cfg


def build_qwen_image_dit():
    import torch

    from goal_force_tpu.models.qwen_image_dit import QwenImageDiTConfig

    ref_qwen = refmodels("qwen_image_dit")
    ref_sd3 = refmodels("sd3_dit")
    ref_flux = refmodels("flux_dit")
    cfg = QwenImageDiTConfig(dim=48, num_heads=3, head_dim=16, num_layers=2,
                             text_dim=40, axes_dim=(4, 6, 6))
    m = ref_qwen.QwenImageDiT.__new__(ref_qwen.QwenImageDiT)
    torch.nn.Module.__init__(m)
    m.pos_embed = ref_qwen.QwenEmbedRope(theta=10000,
                                         axes_dim=list(cfg.axes_dim),
                                         scale_rope=True)
    m.time_text_embed = ref_sd3.TimestepEmbeddings(
        cfg.freq_dim, cfg.dim, diffusers_compatible_format=True, scale=1000,
        align_dtype_to_timestep=True)
    m.txt_norm = ref_sd3.RMSNorm(cfg.text_dim, eps=1e-6)
    m.img_in = torch.nn.Linear(64, cfg.dim)
    m.txt_in = torch.nn.Linear(cfg.text_dim, cfg.dim)
    m.transformer_blocks = torch.nn.ModuleList([
        ref_qwen.QwenImageTransformerBlock(
            dim=cfg.dim, num_attention_heads=cfg.num_heads,
            attention_head_dim=cfg.head_dim)
        for _ in range(cfg.num_layers)])
    m.norm_out = ref_flux.AdaLayerNorm(cfg.dim, single=True)
    m.proj_out = torch.nn.Linear(cfg.dim, 64)
    return sd_of(_seed(m, 0.1)), cfg


def build_cog_dit():
    import torch

    from goal_force_tpu.models.cog_dit import CogDiTConfig

    ref_cog = refmodels("cog_dit")
    ref_sd3 = refmodels("sd3_dit")
    cfg = CogDiTConfig(dim=768, cond_dim=64, num_blocks=2, text_dim=32,
                       freq_dim=64, rope_dim=16)
    m = ref_cog.CogDiT.__new__(ref_cog.CogDiT)
    torch.nn.Module.__init__(m)
    m.patchify = ref_cog.CogPatchify(16, cfg.dim, 2)
    m.time_embedder = ref_sd3.TimestepEmbeddings(cfg.freq_dim, cfg.cond_dim)
    m.context_embedder = torch.nn.Linear(cfg.text_dim, cfg.dim)
    m.blocks = torch.nn.ModuleList([
        ref_cog.CogDiTBlock(cfg.dim, cfg.cond_dim, cfg.num_heads)
        for _ in range(cfg.num_blocks)])
    m.norm_final = torch.nn.LayerNorm((cfg.dim,), eps=1e-5)
    m.norm_out = ref_cog.CogAdaLayerNorm(cfg.dim, cfg.cond_dim, single=True)
    m.proj_out = torch.nn.Linear(cfg.dim, 16 * 4, bias=True)
    return sd_of(_seed(m)), cfg


def build_stepvideo_dit():
    from goal_force_tpu.models.stepvideo_dit import StepVideoConfig

    ref = refmodels("stepvideo_dit")
    cfg = StepVideoConfig(num_heads=4, head_dim=16, num_layers=2,
                          in_channels=8, caption_dim=24, clip_dim=12,
                          rope_split=(8, 4, 4))
    m = _seed(ref.StepVideoModel(
        num_attention_heads=cfg.num_heads, attention_head_dim=cfg.head_dim,
        in_channels=cfg.in_channels, out_channels=cfg.in_channels,
        num_layers=cfg.num_layers,
        caption_channels=[cfg.caption_dim, cfg.clip_dim],
        attention_type="torch"), 0.1)
    return sd_of(m), cfg


def build_hunyuan_dit():
    import torch

    from goal_force_tpu.models.hunyuan_dit import HunyuanDiTConfig

    ref_hy = refmodels("hunyuan_dit")
    cfg = HunyuanDiTConfig(dim=64, num_heads=4, num_layers_down=4,
                           num_layers_up=2, text_dim=24, t5_dim=16,
                           text_len=5, t5_len=7, mlp_ratio=4.0)
    m = ref_hy.HunyuanDiT.__new__(ref_hy.HunyuanDiT)
    torch.nn.Module.__init__(m)
    m.text_emb_padding = torch.nn.Parameter(
        torch.randn(cfg.text_len + cfg.t5_len, cfg.text_dim))
    m.t5_embedder = torch.nn.Sequential(
        torch.nn.Linear(cfg.t5_dim, cfg.t5_dim * 4), ref_hy.FP32_SiLU(),
        torch.nn.Linear(cfg.t5_dim * 4, cfg.text_dim))
    m.t5_pooler = ref_hy.AttentionPool(cfg.t5_len, cfg.t5_dim, num_heads=8,
                                       output_dim=1024)
    m.style_embedder = torch.nn.Parameter(torch.randn(cfg.dim))
    m.patch_embedder = ref_hy.PatchEmbed(in_chans=4, embed_dim=cfg.dim)
    m.timestep_embedder = ref_hy.TimestepEmbedder(hidden_size=cfg.dim)
    m.extra_embedder = torch.nn.Sequential(
        torch.nn.Linear(256 * 6 + 1024 + cfg.dim, cfg.dim * 4),
        ref_hy.FP32_SiLU(), torch.nn.Linear(cfg.dim * 4, cfg.dim))
    m.blocks = torch.nn.ModuleList(
        [ref_hy.HunyuanDiTBlock(cfg.dim, cfg.dim, cfg.num_heads,
                                cfg.mlp_ratio, cfg.text_dim,
                                skip_connection=False)
         for _ in range(cfg.num_layers_down)] +
        [ref_hy.HunyuanDiTBlock(cfg.dim, cfg.dim, cfg.num_heads,
                                cfg.mlp_ratio, cfg.text_dim,
                                skip_connection=True)
         for _ in range(cfg.num_layers_up)])
    m.final_layer = ref_hy.HunyuanDiTFinalLayer(cfg.dim, cfg.dim, 2, 8)
    return sd_of(_seed(m, 0.1)), cfg


def build_omnigen():
    from test_omnigen import _ref_model, _tiny_cfg

    cfg = _tiny_cfg()
    return sd_of(_ref_model(cfg)), cfg


def build_sdxl_unet(pooled: int = 8):
    """Tiny SDXL UNet over the plan classes (test_sdxl_unet.TINY_PLAN)."""
    import torch

    from test_sdxl_unet import TINY_PLAN

    ref_sdxl = refmodels("sdxl_unet")
    time_dim, model_dim = 16, 8
    torch.manual_seed(0)
    blocks = []
    for spec in TINY_PLAN:
        kind = spec[0]
        if kind == "res":
            blocks.append(ref_sdxl.ResnetBlock(spec[1], spec[2], time_dim,
                                               groups=4))
        elif kind == "attn":
            blocks.append(ref_sdxl.AttentionBlock(
                spec[1], spec[2], spec[3], spec[5], spec[4],
                norm_num_groups=4, eps=1e-6))
        elif kind == "push":
            blocks.append(ref_sdxl.PushBlock())
        elif kind == "pop":
            blocks.append(ref_sdxl.PopBlock())
        elif kind == "down":
            blocks.append(ref_sdxl.DownSampler(spec[1]))
        elif kind == "up":
            blocks.append(ref_sdxl.UpSampler(spec[1]))
    m = torch.nn.Module()
    m.time_embedding = torch.nn.Sequential(
        torch.nn.Linear(model_dim, time_dim), torch.nn.SiLU(),
        torch.nn.Linear(time_dim, time_dim))
    m.add_time_embedding = torch.nn.Sequential(
        torch.nn.Linear(pooled + 6 * 256, time_dim), torch.nn.SiLU(),
        torch.nn.Linear(time_dim, time_dim))
    m.conv_in = torch.nn.Conv2d(4, model_dim, 3, padding=1)
    m.blocks = torch.nn.ModuleList(blocks)
    m.conv_norm_out = torch.nn.GroupNorm(4, model_dim, eps=1e-5)
    m.conv_out = torch.nn.Conv2d(model_dim, 4, 3, padding=1)
    return sd_of(_seed(m, 0.1)), {"plan": TINY_PLAN, "time_dim": time_dim,
                                  "model_dim": model_dim, "pooled": pooled}


def build_chatglm():
    import torch

    from goal_force_tpu.models.kolors_text_encoder import ChatGLMConfig

    ref_glm = refmodels("kolors_text_encoder")
    # REAL vocab so real ChatGLM token ids stay in range (incl. specials)
    cfg = ChatGLMConfig(hidden_size=32, ffn_hidden_size=48, num_layers=3,
                        num_heads=4, kv_channels=8, kv_groups=2, vocab=64800)
    ref_cfg = ref_glm.ChatGLMConfig(
        num_layers=cfg.num_layers, padded_vocab_size=cfg.vocab,
        hidden_size=cfg.hidden_size, ffn_hidden_size=cfg.ffn_hidden_size,
        kv_channels=cfg.kv_channels, num_attention_heads=cfg.num_heads,
        seq_length=256, hidden_dropout=0.0, attention_dropout=0.0,
        layernorm_epsilon=cfg.eps, rmsnorm=True,
        apply_residual_connection_post_layernorm=False, post_layer_norm=True,
        add_bias_linear=False, add_qkv_bias=True, multi_query_attention=True,
        multi_query_group_num=cfg.kv_groups, original_rope=True,
        torch_dtype=torch.float32, use_cache=False,
        output_hidden_states=True, return_dict=True)
    m = _seed(ref_glm.ChatGLMModel(ref_cfg, empty_init=False))
    return sd_of(m), cfg


# ---------------------------------------------------------------------------
# Text encoders (real vocab, tiny dims)
# ---------------------------------------------------------------------------

def build_clip_text_encoder(variant="sd", vocab=49408, dim=48, layers=2,
                            positions=77, seed=0):
    """variant: 'sd' (SD-1.5 CLIP-L with final LN), 'sdxl1' (CLIP-L, no final
    LN), 'sdxl2' (CLIP-G with projection)."""
    import torch

    from goal_force_tpu.models.clip import CLIPConfig

    torch.manual_seed(seed)
    if variant == "sd":
        ref_te = refmodels("sd_text_encoder")
        m = ref_te.SDTextEncoder(
            embed_dim=dim, vocab_size=vocab, max_position_embeddings=positions,
            num_encoder_layers=layers, encoder_intermediate_size=dim * 2)
        quick_gelu, pooling = True, None
    else:
        ref_te = refmodels("sdxl_text_encoder")
        klass = ref_te.SDXLTextEncoder2 if variant == "sdxl2" \
            else ref_te.SDXLTextEncoder
        m = klass(embed_dim=dim, vocab_size=vocab,
                  max_position_embeddings=positions, num_encoder_layers=layers,
                  encoder_intermediate_size=dim * 2)
        quick_gelu = variant != "sdxl2"
        pooling = "argmax" if variant == "sdxl2" else None
    m.encoders = torch.nn.ModuleList(
        [type(m.encoders[0])(dim, dim * 2, num_heads=4, head_dim=dim // 4,
                             **({} if variant == "sd"
                                else {"use_quick_gelu": quick_gelu}))
         for _ in range(layers)])
    cfg = CLIPConfig(vocab_size=vocab, text_dim=dim, text_heads=4,
                     text_layers=layers, max_positions=positions,
                     hidden_act="quick_gelu" if quick_gelu else "gelu",
                     **({"text_pooling": pooling} if pooling else {}))
    return sd_of(_seed(m, 0.05, seed)), cfg


def build_t5(vocab=32128, dim=32, layers=2, seed=0):
    """T5-v1.1 encoder in the reference's WanTextEncoder-compatible naming —
    built via the goal-force umt5 golden-test path's torch module."""
    import torch

    from goal_force_tpu.configs import T5Config

    ref_t5 = refmodels("wan_video_text_encoder")
    cfg = T5Config(vocab=vocab, dim=dim, dim_attn=dim, dim_ffn=dim * 2,
                   num_heads=4, num_layers=layers, shared_pos=True,
                   text_len=64)
    torch.manual_seed(seed)
    m = ref_t5.WanTextEncoder(
        vocab=vocab, dim=dim, dim_attn=dim, dim_ffn=dim * 2, num_heads=4,
        num_layers=layers, num_buckets=cfg.num_buckets, shared_pos=True,
        dropout=0.0)
    return sd_of(_seed(m, 0.05, seed)), cfg


# ---------------------------------------------------------------------------
# VAEs
# ---------------------------------------------------------------------------

TINY_VAE_ENC_PLAN = (("res", 8, 8), ("downe", 8), ("res", 8, 16),
                     ("res", 16, 16), ("vattn", 16), ("res", 16, 16))
TINY_VAE_DEC_PLAN = (("res", 16, 16), ("vattn", 16), ("res", 16, 16),
                     ("res", 16, 8), ("up", 8), ("res", 8, 8))


def synth_sd_vae(plan, in_ch, out_ch, first_ch, last_ch, encoder, seed=0,
                 quant=True, groups=4):
    """Synthesize a diffsynth-format SD/SD3-style VAE state dict at an
    arbitrary plan (keys per models/sd_vae.py::_blocks_from_torch)."""
    rng = np.random.default_rng(seed)
    sd = {}

    def conv(pre, cin, cout, k=3):
        sd[pre + ".weight"] = rng.normal(0, 0.05, (cout, cin, k, k)).astype(np.float32)
        sd[pre + ".bias"] = rng.normal(0, 0.01, (cout,)).astype(np.float32)

    def norm(pre, ch):
        sd[pre + ".weight"] = np.ones((ch,), np.float32)
        sd[pre + ".bias"] = np.zeros((ch,), np.float32)

    def lin(pre, cin, cout):
        sd[pre + ".weight"] = rng.normal(0, 0.05, (cout, cin)).astype(np.float32)
        sd[pre + ".bias"] = np.zeros((cout,), np.float32)

    conv("conv_in", in_ch, first_ch)
    for i, spec in enumerate(plan):
        pre = f"blocks.{i}"
        if spec[0] == "res":
            _, cin, cout = spec
            norm(pre + ".norm1", cin)
            conv(pre + ".conv1", cin, cout)
            norm(pre + ".norm2", cout)
            conv(pre + ".conv2", cout, cout)
            if cin != cout:
                conv(pre + ".conv_shortcut", cin, cout, k=1)
        elif spec[0] == "vattn":
            ch = spec[1]
            norm(pre + ".norm", ch)
            for name in ("to_q", "to_k", "to_v", "to_out"):
                lin(f"{pre}.transformer_blocks.0.{name}", ch, ch)
        elif spec[0] in ("downe", "up"):
            conv(pre + ".conv", spec[1], spec[1])
    norm("conv_norm_out", last_ch)
    if encoder:
        conv("conv_out", last_ch, out_ch)
        if quant:
            conv("quant_conv", out_ch, out_ch, k=1)
    else:
        conv("conv_out", last_ch, out_ch)
        if quant:
            conv("post_quant_conv", in_ch, in_ch, k=1)
    return sd


def build_sd3_vae_pair(seed=0):
    """Tiny SD3/Flux-head VAE pair (16ch latents, 32 moment channels, no
    quant convs) matching pipelines.flux.tiny_sd3_vae_plans."""
    enc = synth_sd_vae(TINY_VAE_ENC_PLAN, 3, 32, 8, 16, True, seed, quant=False)
    dec = synth_sd_vae(TINY_VAE_DEC_PLAN, 16, 3, 16, 8, False, seed + 1,
                       quant=False)
    return enc, dec, (TINY_VAE_ENC_PLAN, TINY_VAE_DEC_PLAN, 4)


def build_cog_vae():
    """Real-geometry CogVAE encoder/decoder state dicts (the reference class
    is not parameterized; weights are seeded small)."""
    ref_vae = refmodels("cog_vae")
    enc = _seed(ref_vae.CogVAEEncoder(), 0.03)
    dec = _seed(ref_vae.CogVAEDecoder(), 0.03)
    return sd_of(enc), sd_of(dec)


def build_hunyuan_video_vae():
    from goal_force_tpu.models.hunyuan_video_vae import tiny_hunyuan_vae_config

    cfg = tiny_hunyuan_vae_config()
    ref_enc = refmodels("hunyuan_video_vae_encoder")
    ref_dec = refmodels("hunyuan_video_vae_decoder")
    enc = _seed(ref_enc.HunyuanVideoVAEEncoder(
        block_out_channels=list(cfg.block_out_channels),
        layers_per_block=cfg.layers_per_block, num_groups=cfg.num_groups), 0.1)
    dec = _seed(ref_dec.HunyuanVideoVAEDecoder(
        block_out_channels=list(cfg.block_out_channels),
        layers_per_block=cfg.layers_per_block, num_groups=cfg.num_groups), 0.1)
    return sd_of(enc), sd_of(dec), cfg


def build_stepvideo_vae():
    from goal_force_tpu.models.stepvideo_vae import StepVideoVAEConfig

    cfg = StepVideoVAEConfig(enc_ch=32, enc_mult=(4, 8, 16, 16), dec_ch=32,
                             dec_mult=(1, 2, 4, 4), num_res_blocks=2, z_dim=16,
                             groups=32)
    ref_sv = refmodels("stepvideo_vae")
    ref_sv.base_group_norm.spatial = True
    enc = _seed(ref_sv.VideoEncoder(ch=cfg.enc_ch, z_channels=cfg.z_dim,
                                    num_res_blocks=cfg.num_res_blocks,
                                    version=2), 0.03)
    dec = _seed(ref_sv.VideoDecoder(ch=cfg.dec_ch, z_channels=cfg.z_dim,
                                    num_res_blocks=cfg.num_res_blocks,
                                    version=2), 0.03)
    sd = {"encoder." + k: v for k, v in sd_of(enc).items()}
    sd.update({"decoder." + k: v for k, v in sd_of(dec).items()})
    return sd, cfg


def build_llama(dim=32, layers=2, vocab=128320, seed=0):
    import torch
    from transformers import LlamaConfig as HFLlamaConfig, LlamaModel

    torch.manual_seed(seed)
    hf = HFLlamaConfig(hidden_size=dim, intermediate_size=dim * 2,
                       num_hidden_layers=layers, num_attention_heads=4,
                       num_key_value_heads=2, vocab_size=vocab,
                       use_cache=False)
    m = _seed(LlamaModel(hf), 0.05, seed)
    return sd_of(m), hf


def build_qwen_vl_text(dim=32, layers=2, vocab=151936, seed=0):
    import torch
    from transformers import Qwen2Config, Qwen2Model

    torch.manual_seed(seed)
    hf = Qwen2Config(hidden_size=dim, intermediate_size=dim * 2,
                     num_hidden_layers=layers, num_attention_heads=4,
                     num_key_value_heads=2, vocab_size=vocab, use_cache=False)
    m = _seed(Qwen2Model(hf), 0.05, seed)
    # the reference distributes the VL checkpoint with the text tower under
    # `model.` (Qwen2_5_VLModel.model)
    return {"model." + k: v for k, v in sd_of(m).items()}, hf


def build_bert(dim=32, layers=2, vocab=47020, seed=0):
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel

    torch.manual_seed(seed)
    hf = HFBertConfig(hidden_size=dim, intermediate_size=dim * 2,
                      num_hidden_layers=layers, num_attention_heads=4,
                      vocab_size=vocab, max_position_embeddings=77)
    m = _seed(BertModel(hf, add_pooling_layer=False), 0.05, seed)
    return sd_of(m), hf


def build_svd_unet():
    from test_svd_unet import _torch_tiny_svd, tiny_svd_plan

    plan = tiny_svd_plan()
    m = _torch_tiny_svd(plan)
    return sd_of(m), plan


def build_qwen_image_vae():
    """Real-geometry QwenImageVAE (Wan2.1 architecture, not parameterized)."""
    ref_vae = refmodels("qwen_image_vae")
    m = _seed(ref_vae.QwenImageVAE(), 0.03)
    return sd_of(m)


def build_sd_vae_pair(seed=0):
    """Tiny SD-1.5-head VAE pair (4ch latents, 8 moments, quant convs)."""
    enc = synth_sd_vae(TINY_VAE_ENC_PLAN, 3, 8, 8, 16, True, seed, quant=True)
    dec = synth_sd_vae(TINY_VAE_DEC_PLAN, 4, 3, 16, 8, False, seed + 1,
                       quant=True)
    return enc, dec, (TINY_VAE_ENC_PLAN, TINY_VAE_DEC_PLAN, 4)
