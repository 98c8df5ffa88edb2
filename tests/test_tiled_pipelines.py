"""Wiring tests for `tiled=True` on the image pipelines.

The blend math itself is golden-tested against the reference tiler in
test_tiler.py; here we prove the pipeline plumbing: a geometry where every
stage resolves to a SINGLE tile must reproduce the untiled output exactly
(ramp mask cancels through the fold normalization), and a multi-tile geometry
must produce finite output of the right shape.
"""

import numpy as np
import pytest

import jax


def _sd_pipe():
    from goal_force_tpu.pipelines.sd import SDPipeline

    return SDPipeline.init_random(jax.random.PRNGKey(0), tiny=True)


def _sdxl_pipe():
    from goal_force_tpu.pipelines.sdxl import SDXLPipeline

    return SDXLPipeline.init_random(jax.random.PRNGKey(0), tiny=True)


def test_sd_single_tile_equals_untiled_latents():
    pipe = _sd_pipe()
    kw = dict(prompt="a red ball", height=64, width=64,
              num_inference_steps=2, seed=3, return_latents=True)
    base = pipe(**kw)
    # latent grid is 8x8; tile_size=8 -> one tile at every UNet resolution
    tiled = pipe(**kw, tiled=True, tile_size=8, tile_stride=4)
    np.testing.assert_allclose(tiled, base, rtol=2e-5, atol=2e-5)


def test_sd_single_tile_equals_untiled_image():
    pipe = _sd_pipe()
    kw = dict(prompt="a red ball", height=64, width=64,
              num_inference_steps=1, seed=5)
    base = pipe(**kw)
    img = pipe(**kw, tiled=True, tile_size=8, tile_stride=4)
    np.testing.assert_allclose(img, base, rtol=2e-5, atol=2e-5)


def test_sd_multi_tile_runs():
    pipe = _sd_pipe()
    img = pipe("a red ball", height=128, width=128, num_inference_steps=1,
               seed=1, tiled=True, tile_size=8, tile_stride=4)
    assert img.shape == (128, 128, 3)
    assert np.isfinite(img).all()


def test_sd_tiled_i2i_encode():
    pipe = _sd_pipe()
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    kw = dict(prompt="p", height=64, width=64, num_inference_steps=1,
              input_image=image, denoising_strength=0.7, seed=2,
              return_latents=True)
    base = pipe(**kw)
    # pixel-space encode tile 64 = single tile; latent stages single-tile at 8
    tiled = pipe(**kw, tiled=True, tile_size=64, tile_stride=32)
    # encode is single-tile exact; unet tile clamps 64 -> 8 = single tile
    np.testing.assert_allclose(tiled, base, rtol=2e-5, atol=2e-5)


def test_sdxl_single_tile_equals_untiled():
    pipe = _sdxl_pipe()
    kw = dict(prompt="a castle", height=64, width=64,
              num_inference_steps=2, seed=7)
    base = pipe(**kw)
    tiled = pipe(**kw, tiled=True, tile_size=8, tile_stride=4)
    np.testing.assert_allclose(tiled, base, rtol=2e-5, atol=2e-5)


def test_sdxl_multi_tile_runs():
    pipe = _sdxl_pipe()
    img = pipe("a castle", height=128, width=128, num_inference_steps=1,
               seed=9, tiled=True, tile_size=8, tile_stride=4)
    assert img.shape == (128, 128, 3)
    assert np.isfinite(img).all()


def test_sd3_single_tile_equals_untiled():
    from goal_force_tpu.pipelines.sd3 import SD3Pipeline

    pipe = SD3Pipeline.init_random(jax.random.PRNGKey(0))
    kw = dict(prompt="a fox", height=64, width=64, num_inference_steps=2,
              seed=11)
    base = pipe(**kw)
    # tiny VAE factor 2 -> latent 32x32; tile_size=32 -> one tile everywhere
    tiled = pipe(**kw, tiled=True, tile_size=32, tile_stride=16)
    np.testing.assert_allclose(tiled, base, rtol=2e-5, atol=2e-5)


def test_sd3_multi_tile_runs():
    from goal_force_tpu.pipelines.sd3 import SD3Pipeline

    pipe = SD3Pipeline.init_random(jax.random.PRNGKey(0))
    img = pipe("a fox", height=64, width=64, num_inference_steps=1, seed=12,
               tiled=True, tile_size=16, tile_stride=8)
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()


def test_flux_single_tile_equals_untiled():
    from goal_force_tpu.pipelines.flux import FluxPipeline

    pipe = FluxPipeline.init_random(jax.random.PRNGKey(0))
    kw = dict(prompt="a fox", height=64, width=64, num_inference_steps=2,
              cfg_scale=2.0, seed=13)
    base = pipe(**kw)
    tiled = pipe(**kw, tiled=True, tile_size=32, tile_stride=16)
    np.testing.assert_allclose(tiled, base, rtol=2e-5, atol=2e-5)


def test_hunyuan_tiled_decode():
    from goal_force_tpu.pipelines.hunyuan_image import HunyuanImagePipeline

    pipe = HunyuanImagePipeline.init_random(jax.random.PRNGKey(0))
    kw = dict(prompt="a lake", height=64, width=64, num_inference_steps=1,
              seed=4)
    base = pipe(**kw)
    # latent 8x8; tile_size clamps 64 -> 8 = single tile -> exact
    exact = pipe(**kw, tiled=True)
    np.testing.assert_allclose(exact, base, rtol=2e-5, atol=2e-5)
    multi = pipe(**kw, tiled=True, tile_size=4, tile_stride=2)
    assert multi.shape == base.shape and np.isfinite(multi).all()


def test_sd_video_tiled_decode():
    from goal_force_tpu.pipelines.sd_video import SDVideoPipeline

    pipe = SDVideoPipeline.init_random(jax.random.PRNGKey(0))
    kw = dict(prompt="a dancer", num_frames=2, height=64, width=64,
              num_inference_steps=1, seed=6)
    base = pipe(**kw)
    exact = pipe(**kw, tiled=True)    # tile clamps 64 -> 8 = single tile
    np.testing.assert_allclose(exact, base, rtol=2e-5, atol=2e-5)
    multi = pipe(**kw, tiled=True, tile_size=4, tile_stride=2)
    assert multi.shape == base.shape and np.isfinite(multi).all()


def test_sdxl_video_tiled_decode():
    from goal_force_tpu.pipelines.sdxl_video import SDXLVideoPipeline

    pipe = SDXLVideoPipeline.init_random(jax.random.PRNGKey(0))
    kw = dict(prompt="a dancer", num_frames=2, height=64, width=64,
              num_inference_steps=1, seed=8)
    base = pipe(**kw)
    exact = pipe(**kw, tiled=True)
    np.testing.assert_allclose(exact, base, rtol=2e-5, atol=2e-5)


def test_qwen_image_tiled_vae():
    from goal_force_tpu.pipelines.qwen_image import QwenImagePipeline

    pipe = QwenImagePipeline.init_random(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3), np.float32)
    kw = dict(prompt="a bird", height=32, width=32, num_inference_steps=1,
              seed=10, input_image=img, denoising_strength=0.6)
    base = pipe(**kw)
    # vae_factor=2 -> latent 16x16; pixel tile 32 -> latent tile 16 = single
    # clamped task on both encode and decode -> exact
    exact = pipe(**kw, tiled=True, tile_size=32, tile_stride=16)
    np.testing.assert_allclose(exact, base, rtol=2e-5, atol=2e-5)
    multi = pipe(**kw, tiled=True, tile_size=16, tile_stride=8)
    assert multi.shape == base.shape and np.isfinite(multi).all()


def test_cog_vae_tiled_matches_untiled():
    from goal_force_tpu.models.cog_vae import (
        CogVAEConfig,
        cog_vae_decode,
        cog_vae_decode_tiled,
        cog_vae_encode,
        cog_vae_encode_tiled,
        init_cog_vae_decoder,
        init_cog_vae_encoder,
    )

    cfg = CogVAEConfig(channels=(8, 8, 8, 8), latent_dim=4, groups=4)
    kd, ke = jax.random.split(jax.random.PRNGKey(0))
    dec = init_cog_vae_decoder(kd, cfg)
    enc = init_cog_vae_encoder(ke, cfg)

    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 4, 6, 4)) * 0.7
    base = np.asarray(cog_vae_decode(dec, lat, cfg))
    # single clamped task (tile covers the full latent extent) -> exact
    one = np.asarray(cog_vae_decode_tiled(dec, lat, cfg, (60, 90), (30, 45)))
    np.testing.assert_allclose(one, base, rtol=2e-5, atol=2e-5)
    multi = np.asarray(cog_vae_decode_tiled(dec, lat, cfg, (2, 3), (1, 2)))
    assert multi.shape == base.shape and np.isfinite(multi).all()

    vid = jax.random.normal(jax.random.PRNGKey(2), (1, 9, 32, 48, 3))
    base_e = np.asarray(cog_vae_encode(enc, vid, cfg))
    one_e = np.asarray(cog_vae_encode_tiled(enc, vid, cfg, (60, 90), (30, 45)))
    np.testing.assert_allclose(one_e, base_e, rtol=2e-5, atol=2e-5)
    multi_e = np.asarray(cog_vae_encode_tiled(enc, vid, cfg, (2, 3), (1, 2)))
    assert multi_e.shape == base_e.shape and np.isfinite(multi_e).all()


def test_cog_pipeline_tiled_kwargs():
    from goal_force_tpu.models.cog_vae import (
        CogVAEConfig,
        cog_vae_decode,
        cog_vae_decode_tiled,
        init_cog_vae_decoder,
    )
    from goal_force_tpu.pipelines.cog_video import CogVideoPipeline

    cfg = CogVAEConfig(channels=(8, 8, 8, 8), latent_dim=16, groups=4)
    dec = init_cog_vae_decoder(jax.random.PRNGKey(0), cfg)
    pipe = CogVideoPipeline.init_random(jax.random.PRNGKey(0))
    pipe.decode_video = lambda z, **tk: (
        cog_vae_decode_tiled(dec, z, cfg, tk["tile_size"], tk["tile_stride"])
        if tk.get("tiled") else cog_vae_decode(dec, z, cfg))
    kw = dict(prompt="a fish", num_frames=5, height=32, width=48,
              num_inference_steps=1, seed=3)
    base = pipe(**kw)
    exact = pipe(**kw, tiled=True, tile_size=(60, 90), tile_stride=(30, 45))
    np.testing.assert_allclose(exact, base, rtol=2e-5, atol=2e-5)


def test_flux_multi_tile_runs_and_guards():
    import pytest as _pytest

    from goal_force_tpu.pipelines.flux import FluxPipeline

    pipe = FluxPipeline.init_random(jax.random.PRNGKey(0))
    img = pipe("a fox", height=64, width=64, num_inference_steps=1, seed=14,
               tiled=True, tile_size=16, tile_stride=8)
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    with _pytest.raises(NotImplementedError):
        pipe("a fox", height=64, width=64, num_inference_steps=1,
             tiled=True, tile_size=16, tile_stride=8, tea_cache_thresh=0.1)
