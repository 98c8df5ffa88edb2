"""Structural model detection (io/detect.py) vs real reference state dicts."""

import numpy as np
import pytest

from goal_force_tpu import configs
from goal_force_tpu.io.detect import (
    convert_detected,
    detect_model_kind,
    infer_dit_config,
)

from conftest import reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")

if reference_available():
    import importlib
    import importlib.machinery
    import sys

    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refmodels", None, is_package=True))
    pkg.__path__ = ["/root/reference/diffsynth/models"]
    sys.modules.setdefault("refmodels", pkg)
    ref_dit = importlib.import_module("refmodels.wan_video_dit")


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def dit_sd():
    import torch

    torch.manual_seed(0)
    cfg = configs.tiny_dit(num_layers=2)
    model = ref_dit.WanModel(
        dim=cfg.dim, in_dim=cfg.in_dim, ffn_dim=cfg.ffn_dim, out_dim=cfg.out_dim,
        text_dim=cfg.text_dim, freq_dim=cfg.freq_dim, eps=cfg.eps,
        patch_size=cfg.patch_size, num_heads=cfg.num_heads,
        num_layers=cfg.num_layers, has_image_input=False).eval().float()
    return cfg, _sd(model)


def test_detects_wan_dit_and_infers_config(dit_sd):
    cfg, sd = dit_sd
    assert detect_model_kind(sd) == "wan_dit"
    head_dim = cfg.dim // cfg.num_heads
    got = infer_dit_config(sd, head_dim=head_dim)
    assert (got.dim, got.in_dim, got.ffn_dim, got.out_dim) == \
        (cfg.dim, cfg.in_dim, cfg.ffn_dim, cfg.out_dim)
    assert (got.text_dim, got.freq_dim, got.num_heads, got.num_layers) == \
        (cfg.text_dim, cfg.freq_dim, cfg.num_heads, cfg.num_layers)
    assert not got.has_image_input


def test_convert_detected_dit_runs(dit_sd):
    cfg, sd = dit_sd
    head_dim = cfg.dim // cfg.num_heads
    out = convert_detected(sd, config=infer_dit_config(sd, head_dim=head_dim))
    assert out["kind"] == "wan_dit"
    assert out["params"]["blocks"]["modulation"].shape[0] == cfg.num_layers


def test_detects_t5_and_vae():
    import torch

    ref_t5 = importlib.import_module("refmodels.wan_video_text_encoder")
    torch.manual_seed(0)
    t5cfg = configs.tiny_t5()
    t5 = ref_t5.WanTextEncoder(
        vocab=t5cfg.vocab, dim=t5cfg.dim, dim_attn=t5cfg.dim_attn,
        dim_ffn=t5cfg.dim_ffn, num_heads=t5cfg.num_heads,
        num_layers=t5cfg.num_layers, num_buckets=t5cfg.num_buckets,
        shared_pos=False, dropout=0.0).eval().float()
    sd = _sd(t5)
    assert detect_model_kind(sd) == "umt5_xxl"
    out = convert_detected(sd, config=t5cfg)
    assert out["kind"] == "umt5_xxl"

    ref_vae = importlib.import_module("refmodels.wan_video_vae")
    vcfg = configs.tiny_vae()
    vae = ref_vae.VideoVAE_(dim=vcfg.dim, z_dim=vcfg.z_dim,
                            dim_mult=list(vcfg.dim_mult),
                            num_res_blocks=vcfg.num_res_blocks,
                            temperal_downsample=list(vcfg.temporal_downsample),
                            ).eval().float()
    sd = _sd(vae)
    assert detect_model_kind(sd) == "wan_vae"
    out = convert_detected(sd, config=vcfg)
    assert out["kind"] == "wan_vae"
    # reference export adds a 'model.' prefix — still detected
    assert detect_model_kind({"model." + k: v for k, v in sd.items()}) == "wan_vae"


def test_detects_misc_families():
    assert detect_model_kind(
        {"pipe.controlnet.blocks.0.x": 0}) == "goal_force_controlnet"
    assert detect_model_kind(
        {"blocks.0.self_attn.q.lora_A.default.weight": 0}) == "lora"
    assert detect_model_kind(
        {"casual_audio_encoder.weights": 0, "cond_encoder.weight": 0}) == "wan_s2v"
    assert detect_model_kind(
        {"vace_blocks.0.before_proj.weight": 0,
         "vace_patch_embedding.weight": 0}) == "vace"
    assert detect_model_kind(
        {"text_model.embeddings.token_embedding.weight": 0}) == "hf_clip"
    assert detect_model_kind(
        {"visual.conv1.weight": 0, "token_embedding.weight": 0}) == "open_clip"
    assert detect_model_kind({"blip.visual_encoder.cls_token": 0}) == "image_reward"
    assert detect_model_kind({"body.0.rdb1.conv1.weight": 0}) == "esrgan"
    assert detect_model_kind(
        {"transformer.word_embeddings_layernorm.weight": 0,
         "transformer.word_embeddings.weight": 0}) == "bloom"
    assert detect_model_kind(
        {"word_embeddings_layernorm.weight": 0,
         "word_embeddings.weight": 0}) == "bloom"
    assert detect_model_kind(
        {"model.shared.weight": 0,
         "model.encoder.layers.0.self_attn.k_proj.weight": 0,
         "model.decoder.layers.0.self_attn.k_proj.weight": 0}) == "marian"
    assert detect_model_kind({"block0.conv0.0.0.weight": 0}) == "rife"
    assert detect_model_kind(
        {"linear.0.weight": 0, "linear.0.bias": 0, "linear.2.weight": 0,
         "linear.2.bias": 0, "linear.4.weight": 0,
         "linear.4.bias": 0}) == "motion_controller"
    with pytest.raises(ValueError, match="unrecognized"):
        detect_model_kind({"mystery.weight": 0})
    with pytest.raises(ValueError, match="dedicated loader"):
        convert_detected({"pipe.controlnet.blocks.0.x": 0})
