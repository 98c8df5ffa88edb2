"""Camera controller golden parity: Plücker embedding + SimpleAdapter."""

import numpy as np
import pytest

import jax.numpy as jnp

from goal_force_tpu.models.camera_controller import (
    camera_control_embedding,
    generate_camera_coordinates,
    simple_adapter_apply,
    simple_adapter_params_from_torch,
)

from conftest import reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")

if reference_available():
    import importlib
    import importlib.machinery
    import sys

    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refmodels", None, is_package=True))
    pkg.__path__ = ["/root/reference/diffsynth/models"]
    sys.modules.setdefault("refmodels", pkg)
    ref_cam = importlib.import_module("refmodels.wan_video_camera_controller")


def test_plucker_embedding_golden_parity():
    coords = ref_cam.generate_camera_coordinates("LeftUp", 5, 1 / 54)
    ref = ref_cam.process_pose_file(coords, width=32, height=16).numpy()
    ours = camera_control_embedding("LeftUp", 5, height=16, width=32)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)

    assert generate_camera_coordinates("RightDown", 4) == \
        ref_cam.generate_camera_coordinates("RightDown", 4)


def test_simple_adapter_golden_parity():
    import torch

    torch.manual_seed(0)
    m = ref_cam.SimpleAdapter(in_dim=6, out_dim=16, kernel_size=2, stride=2,
                              num_residual_blocks=2).eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.05
    x = torch.randn(1, 6, 3, 16, 16)          # (B, C, F, H, W)
    with torch.no_grad():
        ref = m(x).numpy()                     # (B, out, F, h, w)

    params = simple_adapter_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()})
    frames = jnp.asarray(x.numpy()[0].transpose(1, 2, 3, 0))   # (F, H, W, C)
    ours = simple_adapter_apply(params, frames, stride=2)
    ours = np.asarray(ours).transpose(3, 0, 1, 2)[None]
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=3e-4)
