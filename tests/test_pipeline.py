"""End-to-end pipeline tests on tiny configs (CPU, f32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu import configs
from goal_force_tpu.data import ControlSpec, render_control_video
from goal_force_tpu.pipelines import GoalForcePipeline


@pytest.fixture(scope="module")
def pipe():
    dit_cfg, t5_cfg, vae_cfg, cn_cfg = configs.tiny_pipeline_configs()
    return GoalForcePipeline.init_random(
        jax.random.PRNGKey(0), dit_cfg=dit_cfg, t5_cfg=t5_cfg, vae_cfg=vae_cfg,
        cn_cfg=cn_cfg, dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    image = rng.uniform(size=(32, 48, 3)).astype(np.float32)
    spec = ControlSpec(
        force=200, angle_deg=30, x_pos=0.3, y_pos=0.5,
        target_force=100, target_angle_deg=90, target_x_pos=0.7, target_y_pos=0.4,
        projectile_mass=2.0, projectile_xy_px=(15, 16),
        target_mass=3.0, target_xy_px=(33, 12),
    )
    cv = render_control_video(spec, 9, 32, 48, min_force=30, max_force=400)
    return image, cv


def test_end_to_end_generation(pipe, inputs):
    image, cv = inputs
    video = pipe(
        "a ball rolls right", image, control_signal_video=cv,
        seed=0, num_frames=9, num_inference_steps=4,
    )
    assert video.shape == (9, 32, 48, 3)
    assert np.isfinite(video).all()
    assert 0.0 <= video.min() and video.max() <= 1.0


def test_controlnet_identity_invariant(pipe, inputs):
    """Zero-init zero-convs => ControlNet output equals base-model output
    (the reference's own sanity invariant, inference_goal_force.py:105-107)."""
    image, cv = inputs
    kwargs = dict(seed=3, num_frames=5, num_inference_steps=2)
    with_cn = pipe("a ball", image, control_signal_video=cv[:5], controlnet=True, **kwargs)
    without = pipe("a ball", image, controlnet=False, **kwargs)
    np.testing.assert_allclose(with_cn, without, atol=1e-5)


def test_seed_determinism(pipe, inputs):
    image, cv = inputs
    kwargs = dict(num_frames=5, num_inference_steps=2)
    a = pipe("x", image, control_signal_video=cv[:5], seed=7, **kwargs)
    b = pipe("x", image, control_signal_video=cv[:5], seed=7, **kwargs)
    c = pipe("x", image, control_signal_video=cv[:5], seed=8, **kwargs)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-4


def test_cfg_scale_one_skips_negative(pipe, inputs):
    image, cv = inputs
    out = pipe("x", image, control_signal_video=cv[:5], seed=0,
               num_frames=5, num_inference_steps=2, cfg_scale=1.0)
    assert out.shape == (5, 32, 48, 3)


def test_expert_switch_uses_dit2(pipe, inputs):
    """Steps below the boundary must use dit2: make dit2 differ and check the output
    changes only when the schedule crosses the boundary."""
    image, cv = inputs
    base = pipe("x", image, control_signal_video=cv[:5], seed=1,
                num_frames=5, num_inference_steps=4)
    # Perturb dit2; with boundary 0.875 and 4 steps, later steps use dit2.
    import jax.tree_util as jtu

    saved = pipe.params["dit2"]
    pipe.params["dit2"] = jtu.tree_map(lambda a: a + 0.01, saved)
    try:
        perturbed = pipe("x", image, control_signal_video=cv[:5], seed=1,
                         num_frames=5, num_inference_steps=4)
    finally:
        pipe.params["dit2"] = saved
    assert np.abs(base - perturbed).max() > 1e-6


def test_generate_batch_matches_single(pipe, inputs):
    image, cv = inputs
    rng = np.random.default_rng(5)
    image2 = rng.uniform(size=image.shape).astype(np.float32)
    kwargs = dict(num_frames=5, num_inference_steps=2)
    single0 = pipe("a ball", image, control_signal_video=cv[:5], seed=0, **kwargs)
    single1 = pipe("a cat", image2, control_signal_video=cv[:5], seed=1, **kwargs)
    batch = pipe.generate_batch(
        ["a ball", "a cat"], np.stack([image, image2]),
        control_signal_videos=[cv[:5], cv[:5]], seeds=[0, 1], **kwargs,
    )
    assert batch.shape == (2, 5, 32, 48, 3)
    np.testing.assert_allclose(batch[0], single0, atol=2e-4)
    np.testing.assert_allclose(batch[1], single1, atol=2e-4)


def test_fun_control_mode():
    """Fun-Control: control latents concat into y (in_dim = z + z + mask+cond)."""
    from goal_force_tpu.configs import ControlNetConfig, WanDiTConfig

    dit_cfg, t5_cfg, vae_cfg, _ = configs.tiny_pipeline_configs()
    z = vae_cfg.z_dim
    fun_dit = WanDiTConfig(**{**dit_cfg.__dict__, "in_dim": 3 * z + 4})
    p = GoalForcePipeline.init_random(
        jax.random.PRNGKey(0), dit_cfg=fun_dit, t5_cfg=t5_cfg, vae_cfg=vae_cfg,
        cn_cfg=None, dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    image = rng.uniform(size=(32, 48, 3)).astype(np.float32)
    fun_cv = rng.uniform(size=(5, 32, 48, 3)).astype(np.float32)
    out = p("x", image, fun_control_video=fun_cv, controlnet=False,
            seed=0, num_frames=5, num_inference_steps=2)
    assert out.shape == (5, 32, 48, 3)
    assert np.isfinite(out).all()
