"""AnimateDiff video-pipeline feature coverage for SD and SDXL: v2v via
input_frames + denoising_strength, sliding-window long-video blending
(lets_dance_with_long_video, reference sd_video.py:14-59), and the mid-loop
smoother (to_final + return_to_timestep, :249-267)."""

import numpy as np
import pytest

import jax


KW = dict(num_frames=6, height=32, width=32, num_inference_steps=2, seed=1)


@pytest.fixture(scope="module")
def sd_pipe():
    from goal_force_tpu.pipelines.sd_video import SDVideoPipeline

    return SDVideoPipeline.init_random(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def sdxl_pipe():
    from goal_force_tpu.pipelines.sdxl_video import SDXLVideoPipeline

    return SDXLVideoPipeline.init_random(jax.random.PRNGKey(0))


@pytest.mark.parametrize("which", ["sd", "sdxl"])
def test_sliding_window_single_equals_base(which, sd_pipe, sdxl_pipe):
    pipe = sd_pipe if which == "sd" else sdxl_pipe
    base = pipe("a dancer", **KW)
    assert base.shape == (6, 32, 32, 3) and np.isfinite(base).all()
    # one window spanning the whole clip: the triangular bias normalizes away
    one = pipe("a dancer", animatediff_batch_size=6, animatediff_stride=3,
               **KW)
    np.testing.assert_allclose(one, base, rtol=2e-5, atol=2e-5)
    # overlapping windows blend across batches -> different, still finite
    multi = pipe("a dancer", animatediff_batch_size=4, animatediff_stride=2,
                 **KW)
    assert np.isfinite(multi).all()
    assert np.abs(multi - base).max() > 1e-6


@pytest.mark.parametrize("which", ["sd", "sdxl"])
def test_v2v_input_frames(which, sd_pipe, sdxl_pipe):
    pipe = sd_pipe if which == "sd" else sdxl_pipe
    base = pipe("a dancer", **KW)
    vid = np.random.default_rng(0).uniform(0, 1, (6, 32, 32, 3)) \
        .astype(np.float32)
    v2v = pipe("a dancer", input_frames=vid, denoising_strength=0.6, **KW)
    assert np.isfinite(v2v).all()
    assert np.abs(v2v - base).max() > 1e-6


@pytest.mark.parametrize("which", ["sd", "sdxl"])
def test_mid_loop_smoother(which, sd_pipe, sdxl_pipe):
    pipe = sd_pipe if which == "sd" else sdxl_pipe
    calls = []

    def smoother(frames01, original_frames=None):
        calls.append(frames01.shape)
        return np.clip(frames01 * 0.9 + 0.05, 0.0, 1.0)

    out = pipe("a dancer", smoother=smoother,
               smoother_progress_ids=[0, -1], **KW)
    assert np.isfinite(out).all()
    # once mid-loop (progress id 0) + once after the loop (-1)
    assert len(calls) == 2
    assert calls[0] == (6, 32, 32, 3)
