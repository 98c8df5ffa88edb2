"""HunyuanVideo pipeline feature coverage: true CFG, v2v, I2V token-replace,
TeaCache, and the step_processor loop (reference hunyuan_video.py:133-230).

The DiT-level token-replace math is golden-tested in test_hunyuan_video.py;
here the pipeline mechanics run with tiny random weights and injected
fake VAE callables (the real VAE is golden-tested in test_hunyuan_vae.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.pipelines.hunyuan_video import HunyuanVideoPipeline


@pytest.fixture(scope="module")
def pipe():
    return HunyuanVideoPipeline.init_random(jax.random.PRNGKey(0))


def _fake_encode(v, **tk):
    b, t, h, w, _ = v.shape
    lt = (t - 1) // 4 + 1
    z = jax.image.resize(v.mean(-1), (b, lt, h // 8, w // 8), "linear")
    return jnp.tile(z[..., None], (1, 1, 1, 1, 16))


def _fake_decode(z, **tk):
    t = (z.shape[1] - 1) * 4 + 1
    f = jax.image.resize(z.mean(-1), (1, t, z.shape[2] * 8, z.shape[3] * 8),
                         "linear")
    return jnp.tile(f[..., None], (1, 1, 1, 1, 3))


KW = dict(height=16, width=16, num_frames=5, num_inference_steps=2, seed=0)


def test_cfg_merges_and_gates(pipe):
    base = pipe("a cat", **KW)
    assert base.shape == (1, 2, 2, 2, 16)
    with_cfg = pipe("a cat", negative_prompt="ugly", cfg_scale=3.0, **KW)
    assert np.abs(with_cfg - base).max() > 1e-6
    # cfg_scale == 1 must not even consume the negative prompt
    one = pipe("a cat", negative_prompt="ugly", cfg_scale=1.0, **KW)
    np.testing.assert_allclose(one, base, atol=1e-6)


def test_v2v_denoising_strength(pipe):
    pipe.encode_video = _fake_encode
    base = pipe("a cat", **KW)
    vid = np.random.default_rng(0).uniform(0, 1, (5, 16, 16, 3)) \
        .astype(np.float32)
    v2v = pipe("a cat", input_video=vid, denoising_strength=0.6, **KW)
    assert np.isfinite(v2v).all()
    assert np.abs(v2v - base).max() > 1e-6


def test_i2v_stability_and_token_replace(pipe):
    pipe.encode_video = _fake_encode
    base = pipe("a cat", **KW)
    img = np.random.default_rng(1).uniform(0, 1, (16, 16, 3)) \
        .astype(np.float32)
    i2v = pipe("a cat", input_images=img, **KW)
    assert np.isfinite(i2v).all()
    assert np.abs(i2v - base).max() > 1e-6
    # without stability the init is pure noise but token replace still runs
    i2v2 = pipe("a cat", input_images=img, i2v_stability=False, **KW)
    assert np.isfinite(i2v2).all()
    assert np.abs(np.asarray(i2v2) - np.asarray(i2v)).max() > 1e-6


def test_teacache_skip_path(pipe):
    kw = dict(KW, num_inference_steps=4)
    base = pipe("a cat", **kw)
    # an enormous threshold forces skips on every eligible step
    tc = pipe("a cat", tea_cache_l1_thresh=1e9, **kw)
    assert np.isfinite(tc).all()
    assert tc.shape == base.shape
    # a zero threshold never skips -> identical to the plain path
    tc0 = pipe("a cat", tea_cache_l1_thresh=0.0, **kw)
    np.testing.assert_allclose(tc0, base, rtol=2e-5, atol=2e-5)


def test_step_processor_roundtrip(pipe):
    pipe.encode_video = _fake_encode
    pipe.decode_video = _fake_decode
    try:
        calls = []

        def proc(frames01):
            calls.append(frames01.shape)
            return np.clip(frames01 * 0.5 + 0.25, 0.0, 1.0)

        out = pipe("a cat", step_processor=proc, **KW)
        assert np.isfinite(np.asarray(out)).all()
        assert len(calls) == KW["num_inference_steps"]
        assert calls[0] == (5, 16, 16, 3)
    finally:
        pipe.decode_video = None
