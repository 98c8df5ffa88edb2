"""SDPipeline end-to-end smoke (tiny random weights, CPU)."""

import numpy as np

from goal_force_tpu.pipelines.sd import SDPipeline


def test_sd_pipeline_t2i_and_i2i():
    pipe = SDPipeline.init_random(tiny=True)
    img = pipe("a red ball", "blurry", height=32, width=32,
               num_inference_steps=3, seed=1)
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert np.isfinite(img).all() and 0.0 <= img.min() and img.max() <= 1.0

    # same seed/prompt -> identical; different seed -> different
    img_b = pipe("a red ball", "blurry", height=32, width=32,
                 num_inference_steps=3, seed=1)
    np.testing.assert_array_equal(img, img_b)
    img_c = pipe("a red ball", "blurry", height=32, width=32,
                 num_inference_steps=3, seed=2)
    assert not np.allclose(img, img_c)

    # image-to-image with partial denoising
    src = (np.ones((32, 32, 3)) * 128).astype(np.uint8)
    out = pipe("a red ball", height=32, width=32, num_inference_steps=3,
               input_image=src, denoising_strength=0.5, seed=3)
    assert out.shape == (32, 32, 3) and np.isfinite(out).all()

    # clip_skip reaches the text encoder
    img_d = pipe("a red ball", "blurry", height=32, width=32,
                 num_inference_steps=3, seed=1, clip_skip=2)
    assert not np.allclose(img, img_d)
