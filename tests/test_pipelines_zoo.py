"""Smoke tests for the model-zoo pipelines (tiny random weights).

The underlying models all have golden-parity tests; these verify the pipeline
plumbing (schedulers, CFG composition, VAE wiring) runs end-to-end.
"""

import numpy as np
import pytest


def test_qwen_image_pipeline():
    from goal_force_tpu.pipelines.qwen_image import QwenImagePipeline

    pipe = QwenImagePipeline.init_random()
    img = pipe("a paper crane", height=16, width=16, num_inference_steps=2)
    assert img.shape == (16, 16, 3) and np.isfinite(img).all()


def test_stepvideo_pipeline():
    from goal_force_tpu.pipelines.step_video import StepVideoPipeline

    pipe = StepVideoPipeline.init_random()
    vid = pipe("lava flow", height=32, width=32, num_frames=17,
               num_inference_steps=2)
    assert vid.shape == (17, 32, 32, 3) and np.isfinite(vid).all()


def test_svd_pipeline():
    from goal_force_tpu.pipelines.svd_video import SVDVideoPipeline

    pipe = SVDVideoPipeline.init_random()
    img = np.zeros((16, 16, 3), np.float32)
    vid = pipe(img, num_frames=3, height=16, width=16, num_inference_steps=2)
    assert vid.shape[0] == 3 and np.isfinite(vid).all()


def test_omnigen_pipeline_with_reference_image():
    from goal_force_tpu.pipelines.omnigen_image import OmniGenImagePipeline

    pipe = OmniGenImagePipeline.init_random()
    ref = np.zeros((32, 32, 3), np.float32)
    img = pipe("swap the cat for a dog", reference_images=[ref], height=32,
               width=32, num_inference_steps=2)
    assert img.shape == (32, 32, 3) and np.isfinite(img).all()


def test_hunyuan_image_pipeline():
    from goal_force_tpu.pipelines.hunyuan_image import HunyuanImagePipeline

    pipe = HunyuanImagePipeline.init_random()
    img = pipe("an ink-wash mountain", height=32, width=32,
               num_inference_steps=2)
    assert img.shape == (32, 32, 3) and np.isfinite(img).all()


def test_sd_video_pipeline():
    from goal_force_tpu.pipelines.sd_video import SDVideoPipeline

    pipe = SDVideoPipeline.init_random()
    vid = pipe("a dancing robot", num_frames=4, height=32, width=32,
               num_inference_steps=2)
    assert vid.shape == (4, 32, 32, 3) and np.isfinite(vid).all()


def test_sd_video_dancer_controlnet_and_cross_frame():
    """dancer.py parity: a zero-init ControlNet is an exact no-op; perturbed
    zero convs change the video; cross-frame attention changes the video."""
    import jax

    from goal_force_tpu.models.sd_controlnet import init_sd_controlnet
    from goal_force_tpu.pipelines.sd_video import SDVideoPipeline

    pipe = SDVideoPipeline.init_random()
    tiny_cn_plan = pipe.plan[:10] + (("push",),)
    cn = init_sd_controlnet(jax.random.PRNGKey(7), tiny_cn_plan, model_dim=8,
                            time_dim=16, cond_channels=(3, 4, 4, 4, 4))
    frames = np.random.default_rng(0).uniform(
        0, 1, (4, 32, 32, 3)).astype(np.float32)

    base = pipe("a dancing robot", num_frames=4, height=32, width=32,
                num_inference_steps=2)
    with_zero_cn = pipe("a dancing robot", num_frames=4, height=32, width=32,
                        num_inference_steps=2,
                        controlnet={"params": cn, "plan": tiny_cn_plan},
                        controlnet_frames=frames)
    np.testing.assert_allclose(with_zero_cn, base, atol=1e-5)

    import jax.numpy as jnp

    cn["controlnet_blocks"] = [
        {"w": jnp.full_like(p["w"], 0.05), "b": p["b"]}
        for p in cn["controlnet_blocks"]]
    with_cn = pipe("a dancing robot", num_frames=4, height=32, width=32,
                   num_inference_steps=2,
                   controlnet={"params": cn, "plan": tiny_cn_plan},
                   controlnet_frames=frames)
    assert np.isfinite(with_cn).all()
    assert np.abs(with_cn - base).max() > 1e-5

    xf = pipe("a dancing robot", num_frames=4, height=32, width=32,
              num_inference_steps=2, cross_frame_attention=True)
    assert np.isfinite(xf).all()
    assert np.abs(xf - base).max() > 1e-5


def test_sdxl_video_dancer_controlnet_and_cross_frame():
    """lets_dance_xl parity: zero-init union ControlNet is a no-op; perturbed
    zero convs and cross-frame attention both change the video."""
    import jax
    import jax.numpy as jnp

    from goal_force_tpu.models.sd_controlnet import init_sdxl_controlnet
    from goal_force_tpu.pipelines.sdxl_video import SDXLVideoPipeline

    pipe = SDXLVideoPipeline.init_random()
    cn_plan = pipe.plan[:7] + (("push",),)
    cn = init_sdxl_controlnet(jax.random.PRNGKey(7), cn_plan, model_dim=8,
                              time_dim=16, add_text_dim=16,
                              cond_channels=(3, 4, 4, 4, 4), n_head=2)
    frames = np.random.default_rng(0).uniform(
        0, 1, (4, 32, 32, 3)).astype(np.float32)

    base = pipe("a city timelapse", num_frames=4, height=32, width=32,
                num_inference_steps=2)
    with_zero_cn = pipe("a city timelapse", num_frames=4, height=32, width=32,
                        num_inference_steps=2,
                        controlnet={"params": cn, "plan": cn_plan},
                        controlnet_frames=frames)
    np.testing.assert_allclose(with_zero_cn, base, atol=1e-5)

    cn["controlnet_blocks"] = [
        {"w": jnp.full_like(p["w"], 0.05), "b": p["b"]}
        for p in cn["controlnet_blocks"]]
    with_cn = pipe("a city timelapse", num_frames=4, height=32, width=32,
                   num_inference_steps=2,
                   controlnet={"params": cn, "plan": cn_plan},
                   controlnet_frames=frames)
    assert np.isfinite(with_cn).all()
    assert np.abs(with_cn - base).max() > 1e-5

    xf = pipe("a city timelapse", num_frames=4, height=32, width=32,
              num_inference_steps=2, cross_frame_attention=True)
    assert np.isfinite(xf).all()
    assert np.abs(xf - base).max() > 1e-5


def test_kolors_pipeline():
    from goal_force_tpu.pipelines.kolors import KolorsPipeline

    pipe = KolorsPipeline.init_random()
    img = pipe("a red lantern", height=32, width=32, num_inference_steps=2)
    assert img.shape == (32, 32, 3) and np.isfinite(img).all()


def test_tiled_vae_decode_matches_full():
    import jax
    import jax.numpy as jnp

    from goal_force_tpu.models.sd_vae import sd_vae_decode
    from goal_force_tpu.pipelines.sd import _init_tiny_vae
    from goal_force_tpu.utils.tiler import tiled_forward_2d

    _, vae_d, _, dec_plan = _init_tiny_vae(jax.random.PRNGKey(0), jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4)) * 0.2
    full = sd_vae_decode(vae_d, z, dec_plan, groups=4)
    tiled = tiled_forward_2d(
        lambda t: sd_vae_decode(vae_d, t, dec_plan, groups=4),
        z, tile_size=12, tile_stride=8, scale=8)
    assert tiled.shape == full.shape
    # interior matches closely; borders blend (reference contract)
    diff = np.abs(np.asarray(tiled) - np.asarray(full))
    assert np.median(diff) < 2e-2


def test_video_pipeline_runner():
    import os
    import tempfile

    from goal_force_tpu.pipelines.runner import VideoPipelineRunner

    video = np.random.RandomState(0).rand(3, 8, 8, 3).astype(np.float32)
    runner = VideoPipelineRunner(pipeline=lambda seed=0, **kw: video)
    with tempfile.TemporaryDirectory() as d:
        out = runner.run({"data": {"output_folder": d, "fps": 8},
                          "pipeline": {"seed": 1,
                                       "pipeline_inputs": {"prompt": "x"}}})
        assert os.path.exists(out)
        assert os.path.exists(os.path.join(d, "config.json"))


def test_sdxl_video_pipeline():
    from goal_force_tpu.pipelines.sdxl_video import SDXLVideoPipeline

    pipe = SDXLVideoPipeline.init_random()
    vid = pipe("a balloon", num_frames=2, height=32, width=32,
               num_inference_steps=1)
    assert vid.shape == (2, 32, 32, 3) and np.isfinite(vid).all()
