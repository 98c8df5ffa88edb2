"""Regional prompting (local_prompts/masks/mask_scales), image-pipeline
ControlNet, and i2i additions across SD / SDXL / SD3 / HunyuanDiT.

Key invariants:
- the blur+blend math matches the reference BasePipeline.merge_latents /
  GaussianBlur (golden vs torch where available);
- a zero mask makes the local-prompt path EXACTLY reproduce the base output
  (weights vanish, blend is identity);
- a full mask changes the output (the local prompt is actually consumed);
- a zero-initialized ControlNet is an exact no-op on the image pipelines.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _torch_gaussian_blur(m, kernel_size, sigma):
    """torchvision GaussianBlur semantics reimplemented on stock torch
    (torchvision is absent here): separable gaussian conv, reflect pad
    (torchvision.transforms.functional_tensor.gaussian_blur)."""
    import torch
    import torch.nn.functional as F

    half = (kernel_size - 1) / 2
    x = torch.arange(kernel_size, dtype=torch.float64) - half
    k = torch.exp(-0.5 * (x / sigma) ** 2)
    k = (k / k.sum()).float()
    pad = kernel_size // 2
    out = F.pad(m[None, None], (pad, pad, pad, pad), mode="reflect")
    out = F.conv2d(out, k.view(1, 1, -1, 1))
    out = F.conv2d(out, k.view(1, 1, 1, -1))
    return out[0, 0]


def test_blur_matches_torch_reference():
    torch = pytest.importorskip("torch")

    from goal_force_tpu.pipelines.regional import _blur_reflect

    rng = np.random.default_rng(0)
    m = (rng.random((40, 52)) > 0.5).astype(np.float32)
    ours = _blur_reflect(m, 9, 3.0)
    ref = _torch_gaussian_blur(torch.tensor(m), 9, 3.0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_blend_matches_reference_merge_latents():
    """Full merge_latents parity on a resize-exact mask (constant 2x2 blocks
    so PIL vs jax resize agree bit-wise after thresholding)."""
    torch = pytest.importorskip("torch")

    from goal_force_tpu.pipelines.regional import (
        blend_local_predictions,
        local_prompt_weights,
    )

    h = w = 16
    mask_big = np.zeros((h * 8, w * 8), np.float32)
    mask_big[: h * 4, :] = 1.0                      # top half
    scale = 3.0

    rng = np.random.default_rng(1)
    g = rng.normal(size=(1, h, w, 4)).astype(np.float32)
    l1 = rng.normal(size=(1, h, w, 4)).astype(np.float32)

    w_ours = local_prompt_weights([mask_big], [scale], h, w,
                                  blur_kernel_size=7, blur_sigma=2.0)
    ours = np.asarray(blend_local_predictions(
        jnp.asarray(g), jnp.asarray(l1), jnp.asarray(w_ours)))

    # reference math (base.py:51-63) on the same pre-resized mask
    m = torch.tensor((mask_big[::8, ::8] > 0.5).astype(np.float32))
    m = _torch_gaussian_blur(m, 7, 2.0)
    value = torch.tensor(g.transpose(0, 3, 1, 2)).clone()
    weight = torch.ones_like(value)
    value += torch.tensor(l1.transpose(0, 3, 1, 2)) * m * scale
    weight += m * scale
    ref = (value / weight).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def sd_pipe():
    from goal_force_tpu.pipelines.sd import SDPipeline

    return SDPipeline.init_random(jax.random.PRNGKey(0), tiny=True)


def test_sd_local_prompts(sd_pipe):
    kw = dict(height=64, width=64, num_inference_steps=1, seed=2,
              local_blur_kernel_size=3, local_blur_sigma=1.0)
    base = sd_pipe("p", height=64, width=64, num_inference_steps=1, seed=2)
    zero = sd_pipe("p", local_prompts=["q"],
                   masks=[np.zeros((64, 64), np.float32)],
                   mask_scales=[3.0], **kw)
    np.testing.assert_allclose(zero, base, rtol=2e-5, atol=2e-5)
    full = sd_pipe("p", local_prompts=["q"],
                   masks=[np.ones((64, 64), np.float32)],
                   mask_scales=[3.0], **kw)
    assert np.abs(full - base).max() > 1e-6


def test_sd_image_controlnet(sd_pipe):
    from goal_force_tpu.models.sd_controlnet import init_sd_controlnet

    cn_plan = sd_pipe.plan[:10] + (("push",),)
    cn = init_sd_controlnet(jax.random.PRNGKey(7), cn_plan, model_dim=8,
                            time_dim=16, cond_channels=(3, 4, 4, 4, 4))
    img = np.random.default_rng(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    base = sd_pipe("p", height=64, width=64, num_inference_steps=1, seed=2)
    with_cn = sd_pipe("p", height=64, width=64, num_inference_steps=1, seed=2,
                      controlnet={"params": cn, "plan": cn_plan},
                      controlnet_image=img)
    np.testing.assert_allclose(with_cn, base, atol=1e-5)
    cn["controlnet_blocks"] = [
        jax.tree_util.tree_map(lambda a: a + 0.05, p)
        for p in cn["controlnet_blocks"]]
    pert = sd_pipe("p", height=64, width=64, num_inference_steps=1, seed=2,
                   controlnet={"params": cn, "plan": cn_plan},
                   controlnet_image=img)
    assert np.abs(pert - base).max() > 1e-5


@pytest.fixture(scope="module")
def sdxl_pipe():
    from goal_force_tpu.pipelines.sd import _init_tiny_vae
    from goal_force_tpu.pipelines.sdxl import SDXLPipeline

    pipe = SDXLPipeline.init_random(jax.random.PRNGKey(0), tiny=True)
    enc, _, enc_plan, _ = _init_tiny_vae(jax.random.PRNGKey(3), jnp.float32)
    pipe.vae_encoder, pipe.vae_enc_plan = enc, enc_plan
    pipe.__post_init__()
    return pipe


def test_sdxl_local_prompts_and_i2i(sdxl_pipe):
    kw = dict(height=64, width=64, num_inference_steps=1, seed=2,
              local_blur_kernel_size=3, local_blur_sigma=1.0)
    base = sdxl_pipe("p", height=64, width=64, num_inference_steps=1, seed=2)
    zero = sdxl_pipe("p", local_prompts=["q"],
                     masks=[np.zeros((64, 64), np.float32)],
                     mask_scales=[5.0], **kw)
    np.testing.assert_allclose(zero, base, rtol=2e-5, atol=2e-5)
    full = sdxl_pipe("p", local_prompts=["q"],
                     masks=[np.ones((64, 64), np.float32)],
                     mask_scales=[5.0], **kw)
    assert np.abs(full - base).max() > 1e-6

    img = np.random.default_rng(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    i2i = sdxl_pipe("p", input_image=img, denoising_strength=0.6,
                    height=64, width=64, num_inference_steps=2, seed=2)
    assert i2i.shape == (64, 64, 3) and np.isfinite(i2i).all()


def test_sdxl_image_controlnet(sdxl_pipe):
    from goal_force_tpu.models.sd_controlnet import init_sdxl_controlnet

    cn_plan = sdxl_pipe.plan[:7] + (("push",),)
    cn = init_sdxl_controlnet(jax.random.PRNGKey(7), cn_plan, model_dim=8,
                              time_dim=16, add_text_dim=16,
                              cond_channels=(3, 4, 4, 4, 4), n_head=2)
    img = np.random.default_rng(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    base = sdxl_pipe("p", height=64, width=64, num_inference_steps=1, seed=2)
    with_cn = sdxl_pipe("p", height=64, width=64, num_inference_steps=1,
                        seed=2, controlnet={"params": cn, "plan": cn_plan},
                        controlnet_image=img)
    np.testing.assert_allclose(with_cn, base, atol=1e-5)


def test_sd3_local_prompts_and_i2i():
    from goal_force_tpu.pipelines.sd3 import SD3Pipeline

    pipe = SD3Pipeline.init_random(jax.random.PRNGKey(0))
    base = pipe("a fox", height=64, width=64, num_inference_steps=1, seed=11)
    zero = pipe("a fox", local_prompts=["red"],
                masks=[np.zeros((64, 64), np.float32)], mask_scales=[4.0],
                local_blur_kernel_size=3, local_blur_sigma=1.0,
                height=64, width=64, num_inference_steps=1, seed=11)
    np.testing.assert_allclose(zero, base, rtol=2e-5, atol=2e-5)
    full = pipe("a fox", local_prompts=["red"],
                masks=[np.ones((64, 64), np.float32)], mask_scales=[4.0],
                local_blur_kernel_size=3, local_blur_sigma=1.0,
                height=64, width=64, num_inference_steps=1, seed=11)
    assert np.abs(full - base).max() > 1e-6

    img = np.random.default_rng(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    i2i = pipe("a fox", input_image=img, denoising_strength=0.5,
               height=64, width=64, num_inference_steps=2, seed=11)
    assert i2i.shape == (64, 64, 3) and np.isfinite(i2i).all()


def test_hunyuan_local_prompts_and_i2i():
    from goal_force_tpu.pipelines.hunyuan_image import HunyuanImagePipeline

    pipe = HunyuanImagePipeline.init_random(jax.random.PRNGKey(0))
    base = pipe("a lake", height=64, width=64, num_inference_steps=1, seed=4)
    zero = pipe("a lake", local_prompts=["swan"],
                masks=[np.zeros((64, 64), np.float32)], mask_scales=[4.0],
                local_blur_kernel_size=3, local_blur_sigma=1.0,
                height=64, width=64, num_inference_steps=1, seed=4)
    np.testing.assert_allclose(zero, base, rtol=2e-5, atol=2e-5)
    full = pipe("a lake", local_prompts=["swan"],
                masks=[np.ones((64, 64), np.float32)], mask_scales=[4.0],
                local_blur_kernel_size=3, local_blur_sigma=1.0,
                height=64, width=64, num_inference_steps=1, seed=4)
    assert np.abs(full - base).max() > 1e-6

    img = np.random.default_rng(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    i2i = pipe("a lake", input_image=img, denoising_strength=0.5,
               height=64, width=64, num_inference_steps=2, seed=4)
    assert i2i.shape == (64, 64, 3) and np.isfinite(i2i).all()
