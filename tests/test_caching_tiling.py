"""TeaCache and temporal sliding-window paths (tiny configs, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu import configs
from goal_force_tpu.pipelines import GoalForcePipeline
from goal_force_tpu.pipelines.teacache import TeaCache


@pytest.fixture(scope="module")
def pipe():
    dit_cfg, t5_cfg, vae_cfg, cn_cfg = configs.tiny_pipeline_configs()
    return GoalForcePipeline.init_random(
        jax.random.PRNGKey(0), dit_cfg=dit_cfg, t5_cfg=t5_cfg, vae_cfg=vae_cfg,
        cn_cfg=cn_cfg, dtype=jnp.float32,
    )


def test_teacache_thresholds():
    tc = TeaCache(10, rel_l1_thresh=1e9, model_id="Wan2.1-I2V-14B-480P")
    t_mod = np.ones((2, 6, 8), np.float32)
    assert not tc.should_skip(t_mod)          # step 0 always computes
    assert tc.should_skip(t_mod * 1.001)      # tiny drift under huge threshold -> skip
    tc2 = TeaCache(10, rel_l1_thresh=-1.0, model_id="Wan2.1-I2V-14B-480P")
    assert not tc2.should_skip(t_mod)
    assert not tc2.should_skip(t_mod * 2)     # negative threshold -> never skip


def test_teacache_rejects_unknown_model():
    with pytest.raises(ValueError):
        TeaCache(10, 0.1, "not-a-model")


def test_teacache_pipeline_runs_and_huge_threshold_changes_output(pipe):
    img = np.random.default_rng(0).uniform(size=(32, 48, 3)).astype(np.float32)
    kwargs = dict(seed=0, num_frames=5, num_inference_steps=4)
    base = pipe("x", img, **kwargs)
    cached = pipe("x", img, tea_cache_l1_thresh=1e9, **kwargs)
    assert cached.shape == base.shape
    assert np.isfinite(cached).all()
    # with an absurd threshold most steps skip -> output differs from exact
    assert np.abs(cached - base).max() > 1e-6
    # threshold ~0 -> never skip -> identical to exact path
    exact = pipe("x", img, tea_cache_l1_thresh=-1.0, **kwargs)
    np.testing.assert_allclose(exact, base, atol=1e-5)


def test_sliding_window_covers_all_frames(pipe):
    img = np.random.default_rng(1).uniform(size=(32, 48, 3)).astype(np.float32)
    out = pipe("x", img, seed=0, num_frames=9, num_inference_steps=2,
               sliding_window_size=2, sliding_window_stride=1)
    assert out.shape == (9, 32, 48, 3)
    assert np.isfinite(out).all()


def test_sliding_window_honors_controlnet(pipe):
    """The side-stack runs inside each window (the reference's tiler drops it:
    wan_video_new.py:1381-1405) — with non-identity zero-convs the control
    video must change the output under sliding-window denoising."""
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(32, 48, 3)).astype(np.float32)
    ctrl_a = rng.uniform(size=(9, 32, 48, 3)).astype(np.float32)
    ctrl_b = rng.uniform(size=(9, 32, 48, 3)).astype(np.float32)

    # break the zero-conv identity so the CN contributes
    import jax.tree_util as jtu

    origs = {k: pipe.params[k] for k in ("controlnet", "controlnet2")}
    for k, orig in origs.items():
        hot = jtu.tree_map(lambda a: a, orig)
        hot["zero_convs"] = jtu.tree_map(lambda a: a + 0.05, hot["zero_convs"])
        pipe.params[k] = hot
    try:
        kwargs = dict(seed=0, num_frames=9, num_inference_steps=2,
                      sliding_window_size=2, sliding_window_stride=1)
        out_a = pipe("x", img, control_signal_video=ctrl_a, **kwargs)
        out_b = pipe("x", img, control_signal_video=ctrl_b, **kwargs)
    finally:
        pipe.params.update(origs)
    assert np.isfinite(out_a).all() and np.isfinite(out_b).all()
    assert np.abs(out_a - out_b).max() > 1e-6
