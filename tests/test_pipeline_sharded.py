"""Public-API sharded inference: GoalForcePipeline.shard() places params over an
8-device CPU mesh with the standby expert host-staged, and the generated clip matches
the unsharded run (the GSPMD replacement for the reference's USP monkeypatching at
/root/reference/src/goal_force/wan_video_new.py:455-480 and the expert offload dance
at :697-704)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu import configs
from goal_force_tpu.parallel import make_mesh
from goal_force_tpu.pipelines.goal_force import GoalForcePipeline


def _tiny_pipe():
    dit_cfg, t5_cfg, vae_cfg, cn_cfg = configs.tiny_pipeline_configs(
        num_layers=2, cn_layers=1
    )
    return GoalForcePipeline.init_random(
        jax.random.PRNGKey(7), dit_cfg=dit_cfg, t5_cfg=t5_cfg, vae_cfg=vae_cfg,
        cn_cfg=cn_cfg, dtype=jnp.float32,
    )


def _inputs():
    rng = np.random.default_rng(3)
    img = np.asarray(rng.uniform(0, 1, (32, 32, 3)), np.float32)
    ctrl = np.asarray(rng.uniform(0, 1, (5, 32, 32, 3)), np.float32)
    return img, ctrl


@pytest.mark.parametrize("host_stage", [False, True])
def test_sharded_call_matches_unsharded(host_stage):
    img, ctrl = _inputs()
    kw = dict(control_signal_video=ctrl, num_frames=5, num_inference_steps=4,
              cfg_scale=3.0, seed=0)

    ref = _tiny_pipe()("a ball rolls", img, **kw)

    pipe = _tiny_pipe().shard(make_mesh(dp=2, sp=2, tp=2),
                              host_stage_experts=host_stage)
    if host_stage:
        assert "dit" not in pipe.params and "dit2" not in pipe.params
    got = pipe("a ball rolls", img, **kw)

    assert got.shape == (5, 32, 32, 3)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_sharded_call_is_reusable_after_boundary():
    """A second __call__ must start back on the high-noise expert (stager resets)."""
    img, ctrl = _inputs()
    kw = dict(control_signal_video=ctrl, num_frames=5, num_inference_steps=4,
              cfg_scale=3.0, seed=0)
    pipe = _tiny_pipe().shard(make_mesh(dp=2, sp=2, tp=2), host_stage_experts=True)
    a = pipe("a ball rolls", img, **kw)
    b = pipe("a ball rolls", img, **kw)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_sharded_generate_batch_matches_unsharded():
    img, ctrl = _inputs()
    imgs = np.stack([img, 1.0 - img])
    ctrls = np.stack([ctrl, 1.0 - ctrl])
    kw = dict(control_signal_videos=ctrls, num_frames=5, num_inference_steps=2,
              cfg_scale=3.0, seeds=[0, 1])
    prompts = ["a ball rolls", "a domino falls"]

    ref = _tiny_pipe().generate_batch(prompts, imgs, **kw)
    got = (_tiny_pipe()
           .shard(make_mesh(dp=2, sp=2, tp=2), host_stage_experts=True)
           .generate_batch(prompts, imgs, **kw))
    assert got.shape == (2, 5, 32, 32, 3)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_pp_sharded_call_matches_unsharded():
    """Pipeline-parallel inference through the public API: shard() on a pp mesh
    pipelines the merged-CFG batch as microbatches (wan_dit.pp_run_blocks)."""
    img, ctrl = _inputs()
    kw = dict(control_signal_video=ctrl, num_frames=5, num_inference_steps=4,
              cfg_scale=3.0, seed=0)

    ref = _tiny_pipe()("a ball rolls", img, **kw)

    pipe = _tiny_pipe().shard(make_mesh(dp=1, sp=2, tp=2, pp=2))
    assert pipe.pp_microbatches == 2
    got = pipe("a ball rolls", img, **kw)

    assert got.shape == (5, 32, 32, 3)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_shard_invalidates_cached_steps():
    """shard() must drop step closures built before it (they capture
    pp_microbatches/mesh state at first access)."""
    pipe = _tiny_pipe()
    _ = pipe._denoise_step          # build a closure pre-shard
    assert "_denoise_step" in pipe.__dict__
    pipe.shard(make_mesh(dp=1, sp=2, tp=2, pp=2))
    assert "_denoise_step" not in pipe.__dict__   # rebuilt on next access
    assert pipe.pp_microbatches == 2
