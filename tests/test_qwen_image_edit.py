"""Qwen-Image extended surfaces: context/edit conditioning images, EliGen
entity control, inpaint blending, and the vision-tower edit prompt path
(reference diffsynth/pipelines/qwen_image.py units :493-756 and
model_fn_qwen_image :768-822).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.pipelines.qwen_image import QwenImagePipeline

from conftest import reference_available

H = W = 32
KW = dict(height=H, width=W, num_inference_steps=2, seed=0, cfg_scale=1.0)


@pytest.fixture(scope="module")
def pipe():
    return QwenImagePipeline.init_random(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    return {k: rng.uniform(size=(H, W, 3)).astype(np.float32)
            for k in ("input", "context", "edit")}


def test_context_image_changes_output(pipe, imgs):
    base = pipe("a cat", **KW)
    out = pipe("a cat", context_image=imgs["context"], **KW)
    assert out.shape == (H, W, 3)
    assert np.isfinite(out).all()
    assert np.abs(out - base).max() > 1e-6


def test_edit_image_requires_vision_tower(pipe, imgs):
    with pytest.raises(ValueError, match="vision"):
        pipe("make it red", edit_image=imgs["edit"],
             edit_image_auto_resize=False, **KW)


def test_eligen_entities_change_output(pipe, imgs):
    masks = np.zeros((2, H, W), np.float32)
    masks[0, :, : W // 2] = 1.0
    masks[1, :, W // 2:] = 1.0
    base = pipe("a cat and a dog", **KW)
    out = pipe("a cat and a dog", eligen_entity_prompts=["a cat", "a dog"],
               eligen_entity_masks=masks, **KW)
    assert out.shape == (H, W, 3)
    assert np.isfinite(out).all()
    assert np.abs(out - base).max() > 1e-6
    # negative-branch entities (needs cfg)
    out2 = pipe("a cat and a dog", negative_prompt="blurry", cfg_scale=2.0,
                eligen_entity_prompts=["a cat", "a dog"],
                eligen_entity_masks=masks, eligen_enable_on_negative=True,
                height=H, width=W, num_inference_steps=2, seed=0)
    assert np.isfinite(out2).all()


def test_inpaint_zero_mask_preserves_input(pipe, imgs):
    """mask=0 everywhere -> the expected-velocity blend drives the latents back
    to the input image (reference BasePipeline.step :148-154)."""
    from goal_force_tpu.models.vae import decode_video, encode_video

    inp = imgs["input"]
    out = pipe("a cat", input_image=inp, inpaint_mask=np.zeros((H, W), np.float32),
               **KW)
    x = jnp.asarray(inp, jnp.float32)[None] * 2.0 - 1.0
    z = encode_video(pipe.vae_encoder, pipe.vae_cfg, x[:, None])[:, 0]
    roundtrip = decode_video(pipe.vae_decoder, pipe.vae_cfg,
                             z.astype(jnp.float32)[:, None])[:, 0]
    roundtrip = np.asarray((roundtrip[0] + 1) / 2).clip(0, 1)
    np.testing.assert_allclose(out, roundtrip, atol=5e-3)
    # and a blurred partial mask still runs
    m = np.zeros((H, W), np.float32)
    m[8:24, 8:24] = 1.0
    out2 = pipe("a cat", input_image=inp, inpaint_mask=m, inpaint_blur_size=2,
                inpaint_blur_sigma=1.0, **KW)
    assert np.isfinite(out2).all()


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_edit_image_vision_prompt_path(imgs):
    """Full Qwen-Image-Edit prompt path on a tiny converted Qwen2.5-VL
    (text + vision towers): template with expanded <|image_pad|> tokens,
    vision features spliced into the text embeddings, extra edit latents in
    the DiT."""
    from test_qwen_vl import TXT_CFG, VIS_CFG, IMAGE_TOKEN, VISION_START, _tiny_model

    from goal_force_tpu.configs import VAEConfig
    from goal_force_tpu.models.qwen_image_dit import (
        QwenImageDiTConfig,
        init_qwen_image_dit,
    )
    from goal_force_tpu.models.qwen_vl import (
        qwen_vl_text_params_from_torch,
        qwen_vl_vision_params_from_torch,
    )
    from goal_force_tpu.models.vae import init_vae

    m = _tiny_model()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    tprefix = "model.language_model." \
        if "model.language_model.embed_tokens.weight" in sd else "model."
    text = qwen_vl_text_params_from_torch(
        {k[len(tprefix):]: v for k, v in sd.items() if k.startswith(tprefix)},
        TXT_CFG, prefix="")
    vprefix = "model.visual." if "model.visual.patch_embed.proj.weight" in sd \
        else "visual."
    vision = qwen_vl_vision_params_from_torch(
        {"visual." + k[len(vprefix):]: v for k, v in sd.items()
         if k.startswith(vprefix)}, VIS_CFG)

    dit_cfg = QwenImageDiTConfig(dim=48, num_heads=3, head_dim=16,
                                 num_layers=2, text_dim=TXT_CFG.hidden_size,
                                 axes_dim=(4, 6, 6))
    vae_cfg = VAEConfig(dim=8, z_dim=dit_cfg.in_dim // 4, dim_mult=(1, 2),
                        num_res_blocks=1, temporal_downsample=(False,))
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    vae = init_vae(ks[1], vae_cfg, jnp.float32)

    calls = []

    def fake_tokenize(text_in):
        calls.append(text_in)
        ids = [3, 5]
        if "<|image_pad|>" in text_in:
            ids += [VISION_START, IMAGE_TOKEN, 148]
        ids += [(hash(text_in) % 64) + 2, 7]
        return ids

    p = QwenImagePipeline(
        dit=init_qwen_image_dit(ks[0], dit_cfg, dtype=jnp.float32),
        text_encoder=text, vae_encoder=vae, vae_decoder=vae,
        dit_cfg=dit_cfg, text_cfg=TXT_CFG, vae_cfg=vae_cfg,
        tokenize=fake_tokenize, dtype=jnp.float32, vae_factor=2,
        vision_encoder=vision, vision_cfg=VIS_CFG,
        image_pad_id=IMAGE_TOKEN, vision_start_id=VISION_START)

    out = p("make the cat red", edit_image=imgs["edit"],
            edit_image_auto_resize=False, **KW)
    assert out.shape == (H, W, 3)
    assert np.isfinite(out).all()
    assert any("<|image_pad|>" in c for c in calls)
    base = p("make the cat red", **KW)
    assert np.abs(out - base).max() > 1e-6
