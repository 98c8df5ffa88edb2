"""Adapter parity: motion controller vs reference; VACE hint structure; camera rays."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu import configs
from goal_force_tpu.models import adapters, wan_dit
from goal_force_tpu.ops.rope import assemble_rope, rope_tables_3d

from conftest import reference_available

if reference_available():
    import importlib
    import importlib.machinery
    import sys

    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refmodels", None, is_package=True)
    )
    pkg.__path__ = ["/root/reference/diffsynth/models"]
    sys.modules.setdefault("refmodels", pkg)
    ref_mc = importlib.import_module("refmodels.wan_video_motion_controller")
    ref_vace = importlib.import_module("refmodels.wan_video_vace")


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_motion_controller_matches_reference():
    import torch

    torch.manual_seed(0)
    model = ref_mc.WanMotionControllerModel(freq_dim=32, dim=48).float().eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = adapters.motion_controller_from_torch(sd)
    mb = np.array([5.0, 25.0], np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(mb)).numpy()
    got = adapters.motion_controller_apply(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(mb), freq_dim=32
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_vace_hints_match_reference():
    import torch

    torch.manual_seed(0)
    cfg = configs.tiny_dit(num_layers=4)
    layers = (0, 2)
    model = ref_vace.VaceWanModel(
        vace_layers=layers, vace_in_dim=8, patch_size=cfg.patch_size,
        has_image_input=False, dim=cfg.dim, num_heads=cfg.num_heads,
        ffn_dim=cfg.ffn_dim, eps=cfg.eps,
    ).float().eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, adapters.vace_from_torch(sd, cfg, layers)
    )

    rng = np.random.default_rng(0)
    f, h, w = 3, 4, 6
    s = f * h * w
    x = rng.normal(size=(1, s, cfg.dim)).astype(np.float32)
    vctx = rng.normal(size=(1, 8, f, h * 2, w * 2)).astype(np.float32)  # channels-first
    ctx = rng.normal(size=(1, 8, cfg.dim)).astype(np.float32)
    t_mod = rng.normal(size=(1, 6, cfg.dim)).astype(np.float32)

    # build torch freqs from the DiT helper
    import importlib

    ref_dit = importlib.import_module("refmodels.wan_video_dit")
    fr = ref_dit.precompute_freqs_cis_3d(cfg.head_dim)
    freqs = torch.cat([
        fr[0][:f].view(f, 1, 1, -1).expand(f, h, w, -1),
        fr[1][:h].view(1, h, 1, -1).expand(f, h, w, -1),
        fr[2][:w].view(1, 1, w, -1).expand(f, h, w, -1),
    ], dim=-1).reshape(s, 1, -1)
    with torch.no_grad():
        ref_hints = model(torch.from_numpy(x), [torch.from_numpy(vctx[0])],
                          torch.from_numpy(ctx), torch.from_numpy(t_mod), freqs)
        ref_hints = torch.stack(list(ref_hints)).numpy()

    cos, sin = assemble_rope(rope_tables_3d(cfg.head_dim), f, h, w)
    got = adapters.vace_hints(
        params, cfg, jnp.asarray(x), jnp.asarray(np.moveaxis(vctx, 1, -1)),
        jnp.asarray(ctx), jnp.asarray(t_mod), cos, sin, vace_layers=layers,
    )
    assert got.shape == ref_hints.shape
    np.testing.assert_allclose(np.asarray(got), ref_hints, rtol=3e-4, atol=3e-4)


def test_apply_vace_hints_mapping():
    hints = jnp.stack([jnp.ones((1, 4, 8)), 2 * jnp.ones((1, 4, 8))])
    x = jnp.zeros((1, 4, 8))
    out = adapters.apply_vace_hints(0, x, hints, (0, 2), scale=0.5)
    np.testing.assert_allclose(np.asarray(out), 0.5)
    out = adapters.apply_vace_hints(1, x, hints, (0, 2), scale=0.5)
    np.testing.assert_allclose(np.asarray(out), 0.0)
    out = adapters.apply_vace_hints(2, x, hints, (0, 2), scale=0.5)
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_plucker_rays_shape_and_norm():
    ext = np.tile(np.eye(4, dtype=np.float64)[None], (3, 1, 1))
    rays = adapters.plucker_rays(ext, fx=0.5, fy=0.5, cx=0.5, cy=0.5, height=8, width=12)
    assert rays.shape == (3, 8, 12, 6)
    d = rays[..., 3:]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-5)
