"""Pipeline-level adapter conditionings: motion bucket (SpeedControl),
Fun-Reference, Fun-Camera, VACE, and t2v (no first frame) generation.

The adapters themselves have golden-parity tests vs the reference modules
(test_adapters.py, test_camera_controller.py); here we cover the public
`pipe(...)` plumbing that mirrors the reference pipeline units
(/root/reference/src/goal_force/wan_video_new.py:967-1100, 1039-1047).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu import configs
from goal_force_tpu.models.adapters import init_motion_controller, init_vace
from goal_force_tpu.models.camera_controller import init_simple_adapter
from goal_force_tpu.pipelines import GoalForcePipeline

H, W, F = 32, 48, 5


@pytest.fixture(scope="module")
def pipe():
    dit_cfg, t5_cfg, vae_cfg, cn_cfg = configs.tiny_pipeline_configs()
    p = GoalForcePipeline.init_random(
        jax.random.PRNGKey(0), dit_cfg=dit_cfg, t5_cfg=t5_cfg, vae_cfg=vae_cfg,
        cn_cfg=cn_cfg, dtype=jnp.float32,
    )
    key = jax.random.PRNGKey(7)
    p.params["motion_controller"] = init_motion_controller(
        key, freq_dim=32, dim=dit_cfg.dim)
    # non-zero final layer so the offset actually perturbs t_mod
    p.params["motion_controller"]["fc2"]["w"] = (
        jax.random.normal(key, p.params["motion_controller"]["fc2"]["w"].shape) * 0.02)
    p.params["camera_adapter"] = init_simple_adapter(
        jax.random.PRNGKey(8), out_dim=dit_cfg.dim, in_dim=24,
        kernel=dit_cfg.patch_size[1])
    # Fun-Reference 2x2 conv-patch projection (z*4 -> dim)
    z4 = p.vae_cfg.z_dim * 4
    p.params["dit"]["ref_conv"] = {
        "w": jax.random.normal(jax.random.PRNGKey(9), (z4, dit_cfg.dim)) * 0.02,
        "b": jnp.zeros((dit_cfg.dim,)),
    }
    p.params["dit2"]["ref_conv"] = p.params["dit"]["ref_conv"]
    return p


@pytest.fixture(scope="module")
def image():
    return np.random.default_rng(0).uniform(size=(H, W, 3)).astype(np.float32)


KW = dict(seed=0, num_frames=F, num_inference_steps=2, controlnet=False)


def test_motion_bucket_id(pipe, image):
    base = pipe("a ball", image, **KW)
    moved = pipe("a ball", image, motion_bucket_id=42.0, **KW)
    assert moved.shape == base.shape
    assert np.isfinite(moved).all()
    assert np.abs(moved - base).max() > 1e-6


def test_reference_image(pipe, image):
    ref = np.random.default_rng(1).uniform(size=(H, W, 3)).astype(np.float32)
    base = pipe("a ball", image, **KW)
    out = pipe("a ball", image, reference_image=ref, **KW)
    assert out.shape == (F, H, W, 3)
    assert np.isfinite(out).all()
    assert np.abs(out - base).max() > 1e-6


def test_reference_image_with_controlnet_raises(pipe, image):
    ref = np.random.default_rng(1).uniform(size=(H, W, 3)).astype(np.float32)
    cv = np.random.default_rng(2).uniform(size=(F, H, W, 3)).astype(np.float32)
    with pytest.raises(NotImplementedError):
        pipe("a ball", image, reference_image=ref, control_signal_video=cv,
             controlnet=True, seed=0, num_frames=F, num_inference_steps=1)


def test_camera_control(pipe, image):
    base = pipe("a ball", image, **KW)
    out = pipe("a ball", image, camera_control_direction="Left", **KW)
    assert out.shape == (F, H, W, 3)
    assert np.isfinite(out).all()
    assert np.abs(out - base).max() > 1e-6


def test_camera_model_y_path():
    """Fun-Camera checkpoints use in_dim = 2*z with a mask-less y (zeros + frame-0
    single-image encode, reference WanVideoUnit_FunCameraControl :1016-1022) — not
    the 4+z i2v y."""
    dit_cfg, t5_cfg, vae_cfg, _ = configs.tiny_pipeline_configs()
    dit_cfg = dataclasses.replace(dit_cfg, in_dim=2 * vae_cfg.z_dim)
    p = GoalForcePipeline.init_random(
        jax.random.PRNGKey(3), dit_cfg=dit_cfg, t5_cfg=t5_cfg, vae_cfg=vae_cfg,
        cn_cfg=None, dtype=jnp.float32,
    )
    p.params["camera_adapter"] = init_simple_adapter(
        jax.random.PRNGKey(4), out_dim=dit_cfg.dim, in_dim=24,
        kernel=dit_cfg.patch_size[1])
    image = np.random.default_rng(5).uniform(size=(H, W, 3)).astype(np.float32)
    out = p("a ball", image, camera_control_direction="Up", **KW)
    assert out.shape == (F, H, W, 3)
    assert np.isfinite(out).all()


# ---------------------------------------------------------------------------
# t2v + VACE (no first-frame conditioning)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def t2v_pipe():
    dit_cfg, t5_cfg, vae_cfg, _ = configs.tiny_pipeline_configs()
    dit_cfg = dataclasses.replace(dit_cfg, in_dim=vae_cfg.z_dim)
    p = GoalForcePipeline.init_random(
        jax.random.PRNGKey(1), dit_cfg=dit_cfg, t5_cfg=t5_cfg, vae_cfg=vae_cfg,
        cn_cfg=None, dtype=jnp.float32,
    )
    layers = (0, 1)
    vace_in = 2 * vae_cfg.z_dim + 64
    p.params["vace"] = init_vace(jax.random.PRNGKey(2), dit_cfg,
                                 vace_layers=layers, vace_in_dim=vace_in)
    p.vace_layers = layers
    return p


def test_t2v_generation(t2v_pipe):
    out = t2v_pipe("a ball", height=H, width=W, **KW)
    assert out.shape == (F, H, W, 3)
    assert np.isfinite(out).all()


def test_t2v_requires_height_width(t2v_pipe):
    with pytest.raises(ValueError):
        t2v_pipe("a ball", num_frames=F, num_inference_steps=1)


def test_vace_generation(t2v_pipe):
    rng = np.random.default_rng(3)
    vv = rng.uniform(size=(F, H, W, 3)).astype(np.float32)
    mask = (rng.uniform(size=(F, H, W)) > 0.5).astype(np.float32)
    base = t2v_pipe("a ball", height=H, width=W, **KW)
    out = t2v_pipe("a ball", height=H, width=W, vace_video=vv,
                   vace_video_mask=mask, **KW)
    assert out.shape == (F, H, W, 3)
    assert np.isfinite(out).all()
    assert np.abs(out - base).max() > 1e-6


def test_vace_reference_image_frame_bookkeeping(t2v_pipe):
    """vace_reference_image adds a latent frame that must be stripped again:
    output frame count is unchanged (reference :757-762, :726-727)."""
    rng = np.random.default_rng(4)
    vv = rng.uniform(size=(F, H, W, 3)).astype(np.float32)
    ref = rng.uniform(size=(H, W, 3)).astype(np.float32)
    out = t2v_pipe("a ball", height=H, width=W, vace_video=vv,
                   vace_reference_image=ref, **KW)
    assert out.shape == (F, H, W, 3)
    assert np.isfinite(out).all()


def test_vace_with_first_frame_raises(pipe, image):
    """vace weights absent on the i2v pipe -> ValueError; with a ref image on a
    y-model the pipeline refuses before that."""
    with pytest.raises((ValueError, NotImplementedError)):
        pipe("a ball", image, vace_video=np.zeros((F, H, W, 3), np.float32),
             seed=0, num_frames=F, num_inference_steps=1)


def test_vace_mask_interpolation_matches_torch():
    """The mask-latent temporal resize must match torch's nearest-exact
    (reference WanVideoUnit_VACE :1083)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    num_frames, h8, w8 = 9, 4, 6
    m = rng.uniform(size=(64, num_frames, h8, w8)).astype(np.float32)
    t_out = (num_frames + 3) // 4
    idx = np.minimum((np.floor((np.arange(t_out) + 0.5) * num_frames / t_out))
                     .astype(np.int64), num_frames - 1)
    ours = m[:, idx]
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(m)[None], size=(t_out, h8, w8), mode="nearest-exact"
    )[0].numpy()
    np.testing.assert_array_equal(ours, ref)


def test_per_call_tiling_override(pipe, image):
    """tiled/tile_size/tile_stride per-call kwargs (reference __call__ :648-650).

    Forcing 2-latent tiles on the tiny VAE (receptive field wider than a tile)
    must actually route through the tiled coders — the blend-mask tiling is an
    approximation, so the output changing proves the switch — and the override
    must not stick to the pipeline config."""
    base = pipe("a ball", image, tiled=False, **KW)
    tiled = pipe("a ball", image, tiled=True, tile_size=(2, 2),
                 tile_stride=(1, 1), **KW)
    assert pipe.pipe_cfg.tile_size == (30, 52)  # override did not stick
    assert pipe.pipe_cfg.tiled is True
    assert tiled.shape == base.shape
    assert np.isfinite(tiled).all()
    assert np.abs(tiled - base).max() > 1e-6  # tiled path actually ran
