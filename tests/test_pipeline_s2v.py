"""S2VPipeline end-to-end on a tiny config: the reference's speech-to-video path
(WanVideoUnit_S2V + model_fn_wans2v) as a standalone pipeline.

The S2V model itself has golden parity vs the reference torch module
(test_s2v.py); here we drive the public pipeline: audio embeds -> ref-latent
pinning -> denoise loop -> decode, plus pose and motion conditioning.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu import configs
from goal_force_tpu.configs import PipelineConfig
from goal_force_tpu.models import s2v as js2v
from goal_force_tpu.models import t5 as t5m
from goal_force_tpu.models import vae as vaem
from goal_force_tpu.models.tokenizer import load_tokenizer
from goal_force_tpu.pipelines.s2v import S2VPipeline

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
    ref_s2v = importlib.import_module("refmodels.wan_video_dit_s2v")

H = W = 32
F = 9  # -> 3 latent frames (ref + 2 video)


@pytest.fixture(scope="module")
def pipe():
    import torch

    torch.manual_seed(0)
    cfg = js2v.tiny_s2v(num_layers=2)
    model = ref_s2v.WanS2VModel(
        dim=cfg.dim, in_dim=cfg.in_dim, ffn_dim=cfg.ffn_dim, out_dim=cfg.out_dim,
        text_dim=cfg.text_dim, freq_dim=cfg.freq_dim, eps=cfg.eps,
        patch_size=cfg.patch_size, num_heads=cfg.num_heads, num_layers=cfg.num_layers,
        cond_dim=cfg.cond_dim, audio_dim=cfg.audio_dim,
        num_audio_token=cfg.num_audio_token,
        audio_inject_layers=list(cfg.audio_inject_layers),
    ).float().eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    t5_cfg, vae_cfg = configs.tiny_t5(), configs.tiny_vae()
    # from_pretrained accepts an in-memory state dict for the S2V tower
    pipe = S2VPipeline.from_pretrained(
        sd, cfg=cfg, t5_cfg=t5_cfg, vae_cfg=vae_cfg,
        pipe_cfg=PipelineConfig(), dtype=jnp.float32)
    pipe.params["t5"] = t5m.init_t5(jax.random.PRNGKey(1), t5_cfg, jnp.float32)
    pipe.params["vae"] = vaem.init_vae(jax.random.PRNGKey(2), vae_cfg, jnp.float32)
    pipe.tokenizer = load_tokenizer(None, t5_cfg.vocab, t5_cfg.text_len, quiet=True)
    return pipe


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    image = rng.uniform(size=(H, W, 3)).astype(np.float32)
    audio = rng.normal(size=(1, 25, 16, F - 1)).astype(np.float32)
    return image, audio


def test_s2v_generation(pipe, inputs):
    image, audio = inputs
    out = pipe("a person speaks", image, audio_embeds=audio,
               seed=0, num_frames=F, num_inference_steps=2)
    assert out.shape == (F, H, W, 3)
    assert np.isfinite(out).all()


def test_s2v_audio_conditions_output(pipe, inputs):
    image, audio = inputs
    a = pipe("a person speaks", image, audio_embeds=audio,
             seed=0, num_frames=F, num_inference_steps=2)
    b = pipe("a person speaks", image, audio_embeds=audio * 3.0 + 1.0,
             seed=0, num_frames=F, num_inference_steps=2)
    assert np.abs(a - b).max() > 1e-6


def test_s2v_pose(pipe, inputs):
    image, audio = inputs
    rng = np.random.default_rng(1)
    pose = rng.uniform(size=(F - 1, H, W, 3)).astype(np.float32)
    base = pipe("a person speaks", image, audio_embeds=audio,
                seed=0, num_frames=F, num_inference_steps=1)
    with_pose = pipe("a person speaks", image, audio_embeds=audio,
                     s2v_pose_video=pose, seed=0, num_frames=F,
                     num_inference_steps=1)
    assert with_pose.shape == (F, H, W, 3)
    assert np.isfinite(with_pose).all()
    assert np.abs(with_pose - base).max() > 1e-6


def test_s2v_motion():
    """Motion FramePack: the reference hardcodes 16-channel motion latents
    (FramePackMotioner Conv3d(16, ...)) and the 4x projection needs latent h,w
    divisible by 8 -> a z=16 tiny VAE at 64px."""
    import dataclasses as dc

    import torch

    torch.manual_seed(1)
    cfg = dc.replace(js2v.tiny_s2v(num_layers=2), in_dim=16, out_dim=16,
                     cond_dim=16)
    model = ref_s2v.WanS2VModel(
        dim=cfg.dim, in_dim=cfg.in_dim, ffn_dim=cfg.ffn_dim, out_dim=cfg.out_dim,
        text_dim=cfg.text_dim, freq_dim=cfg.freq_dim, eps=cfg.eps,
        patch_size=cfg.patch_size, num_heads=cfg.num_heads, num_layers=cfg.num_layers,
        cond_dim=cfg.cond_dim, audio_dim=cfg.audio_dim,
        num_audio_token=cfg.num_audio_token,
        audio_inject_layers=list(cfg.audio_inject_layers),
    ).float().eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    t5_cfg = configs.tiny_t5()
    vae_cfg = dc.replace(configs.tiny_vae(), z_dim=16)
    p = S2VPipeline.from_pretrained(sd, cfg=cfg, t5_cfg=t5_cfg, vae_cfg=vae_cfg,
                                    pipe_cfg=PipelineConfig(), dtype=jnp.float32)
    p.params["t5"] = t5m.init_t5(jax.random.PRNGKey(1), t5_cfg, jnp.float32)
    p.params["vae"] = vaem.init_vae(jax.random.PRNGKey(2), vae_cfg, jnp.float32)
    p.tokenizer = load_tokenizer(None, t5_cfg.vocab, t5_cfg.text_len, quiet=True)

    rng = np.random.default_rng(1)
    h2 = w2 = 64
    image = rng.uniform(size=(h2, w2, 3)).astype(np.float32)
    audio = rng.normal(size=(1, 25, 16, F - 1)).astype(np.float32)
    motion = rng.uniform(size=(73, h2, w2, 3)).astype(np.float32)
    base = p("a person speaks", image, audio_embeds=audio,
             seed=0, num_frames=F, num_inference_steps=1)
    with_motion = p("a person speaks", image, audio_embeds=audio,
                    motion_video=motion, seed=0, num_frames=F,
                    num_inference_steps=1)
    # WanVideoPostUnit_S2V: the 73 motion frames lead the output and the ref
    # latent frame is dropped -> 73 + (F-1) frames
    assert with_motion.shape == (73 + F - 1, h2, w2, 3)
    assert np.isfinite(with_motion).all()
    assert np.abs(with_motion[-(F - 1):] - base[1:]).max() > 1e-6


def test_s2v_motion_frame_count_enforced(pipe, inputs):
    image, audio = inputs
    with pytest.raises(ValueError):
        pipe("a person speaks", image, audio_embeds=audio,
             motion_video=np.zeros((10, H, W, 3), np.float32),
             num_frames=F, num_inference_steps=1)
