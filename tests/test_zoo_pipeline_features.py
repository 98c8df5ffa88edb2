"""Reference-__call__ surface additions across the remaining zoo pipelines:
SVD v2v + mask_frames, StepVideo tiled decode, OmniGen i2i, Kolors i2i +
regional prompting, Qwen-Image edit_rope_interpolation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_svd_v2v_and_mask_frames():
    from goal_force_tpu.pipelines.svd_video import SVDVideoPipeline

    pipe = SVDVideoPipeline.init_random(jax.random.PRNGKey(0))
    img = np.random.default_rng(0).uniform(-1, 1, (32, 32, 3)) \
        .astype(np.float32)
    kw = dict(num_frames=4, height=32, width=32, num_inference_steps=2,
              seed=1)
    base = pipe(img, **kw)
    assert np.isfinite(base).all()

    def enc_vid(v):
        f = np.asarray(v, np.float32)
        z = jax.image.resize(jnp.asarray(f).mean(-1),
                             (f.shape[0], 4, 4), "linear")
        return jnp.tile(z[..., None], (1, 1, 1, 4))

    pipe.encode_video = enc_vid
    vid = np.random.default_rng(1).uniform(-1, 1, (4, 32, 32, 3)) \
        .astype(np.float32)
    v2v = pipe(img, input_video=vid, denoising_strength=0.5, **kw)
    assert np.isfinite(v2v).all()
    assert np.abs(v2v - base).max() > 1e-6
    mk = pipe(img, mask_frames=vid[:2], mask_frame_ids=[0, 2], **kw)
    assert np.isfinite(mk).all()
    assert np.abs(mk - base).max() > 1e-6
    # requesting masks without an encoder must refuse
    pipe.encode_video = None
    with pytest.raises(ValueError):
        pipe(img, mask_frames=vid[:1], mask_frame_ids=[0], **kw)


def test_stepvideo_tiled_decode():
    from goal_force_tpu.pipelines.step_video import StepVideoPipeline

    pipe = StepVideoPipeline.init_random(jax.random.PRNGKey(0))
    kw = dict(height=32, width=32, num_frames=17, num_inference_steps=1,
              seed=2)
    base = pipe("a fish", **kw)
    tiled = pipe("a fish", tiled=True, tile_size=(2, 2), tile_stride=(1, 1),
                 **kw)
    assert tiled.shape == base.shape
    assert np.isfinite(tiled).all()
    # a tile covering the whole latent grid = single spatial task -> exact
    one = pipe("a fish", tiled=True, tile_size=(64, 64),
               tile_stride=(32, 32), **kw)
    np.testing.assert_allclose(one, base, rtol=2e-5, atol=2e-5)


def test_omnigen_i2i():
    from goal_force_tpu.pipelines.omnigen_image import OmniGenImagePipeline

    pipe = OmniGenImagePipeline.init_random(jax.random.PRNGKey(0))
    kw = dict(height=32, width=32, num_inference_steps=2, seed=3)
    base = pipe("a bird", **kw)
    img = np.random.default_rng(2).uniform(-1, 1, (32, 32, 3)) \
        .astype(np.float32)
    i2i = pipe("a bird", input_image=img, denoising_strength=0.6, **kw)
    assert np.isfinite(i2i).all()
    assert np.abs(i2i - base).max() > 1e-6


def test_omnigen_kv_cache_equivalence():
    """The condition-prefix KV cache must reproduce the full forward exactly
    (the prefix is timestep-invariant; reference OmniGenCache
    omnigen_image.py:17-110, crop :182-194)."""
    from goal_force_tpu.pipelines.omnigen_image import OmniGenImagePipeline

    pipe = OmniGenImagePipeline.init_random(jax.random.PRNGKey(0))
    kw = dict(height=32, width=32, num_inference_steps=3, seed=3)
    base = pipe("a bird", use_kv_cache=False, **kw)
    cached = pipe("a bird", use_kv_cache=True, **kw)
    np.testing.assert_allclose(cached, base, rtol=2e-4, atol=2e-4)

    ref = np.random.default_rng(1).uniform(-1, 1, (16, 16, 3)) \
        .astype(np.float32)
    b2 = pipe("a bird like this", reference_images=[ref],
              use_kv_cache=False, **kw)
    c2 = pipe("a bird like this", reference_images=[ref],
              use_kv_cache=True, **kw)
    np.testing.assert_allclose(c2, b2, rtol=2e-4, atol=2e-4)


def test_kolors_i2i_and_local_prompts():
    from goal_force_tpu.pipelines.kolors import KolorsPipeline

    pipe = KolorsPipeline.init_random(jax.random.PRNGKey(0))
    kw = dict(height=64, width=64, num_inference_steps=1, seed=4)
    base = pipe("a temple", **kw)
    zero = pipe("a temple", local_prompts=["gold roof"],
                masks=[np.zeros((64, 64), np.float32)], mask_scales=[4.0],
                local_blur_kernel_size=3, local_blur_sigma=1.0, **kw)
    np.testing.assert_allclose(zero, base, rtol=2e-5, atol=2e-5)
    full = pipe("a temple", local_prompts=["gold roof"],
                masks=[np.ones((64, 64), np.float32)], mask_scales=[4.0],
                local_blur_kernel_size=3, local_blur_sigma=1.0, **kw)
    assert np.abs(full - base).max() > 1e-6

    img = np.random.default_rng(3).uniform(0, 1, (64, 64, 3)) \
        .astype(np.float32)
    i2i = pipe("a temple", input_image=img, denoising_strength=0.6,
               height=64, width=64, num_inference_steps=2, seed=4)
    assert np.isfinite(i2i).all()


def test_qwen_edit_rope_interpolation():
    """The sampled rope differs from the centered rope only for EXTRA grids
    whose geometry differs from grid 0 (reference forward_sampling :169-195)."""
    from goal_force_tpu.models.qwen_image_dit import qwen_rope_tables_multi

    shapes = ((8, 8), (4, 4))
    base = qwen_rope_tables_multi(shapes, 6, (4, 6, 6), 10000.0)
    interp = qwen_rope_tables_multi(shapes, 6, (4, 6, 6), 10000.0,
                                    interpolate=True)
    # grid 0 rows identical
    np.testing.assert_allclose(interp[0][0][:64], base[0][0][:64])
    # extra grid rows differ (sampled from grid 0's positions)
    assert np.abs(interp[0][0][64:] - base[0][0][64:]).max() > 1e-6
    # same-geometry extra grid: linspace sampling is the identity
    shapes2 = ((8, 8), (8, 8))
    b2 = qwen_rope_tables_multi(shapes2, 6, (4, 6, 6), 10000.0)
    i2 = qwen_rope_tables_multi(shapes2, 6, (4, 6, 6), 10000.0,
                                interpolate=True)
    np.testing.assert_allclose(i2[0][0], b2[0][0])

    # end-to-end: an extra image grid of a DIFFERENT geometry (context_image
    # at half resolution) flows through the sampled rope
    from goal_force_tpu.pipelines.qwen_image import QwenImagePipeline

    pipe = QwenImagePipeline.init_random(jax.random.PRNGKey(0))
    ctx = np.random.default_rng(4).uniform(0, 1, (16, 16, 3)) \
        .astype(np.float32)
    kw = dict(height=32, width=32, num_inference_steps=2, seed=5,
              context_image=ctx)
    base = pipe("recolor it", **kw)
    rope = pipe("recolor it", edit_rope_interpolation=True, **kw)
    assert np.isfinite(rope).all()
    assert np.abs(rope - base).max() > 1e-6
