"""ESRGAN + RIFE parity vs the reference torch implementations (tiny configs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.extensions.esrgan import ESRGAN, rrdbnet_apply, rrdbnet_params_from_torch
from goal_force_tpu.extensions.rife import (
    RIFEInterpolater,
    ifnet_apply,
    ifnet_params_from_torch,
    warp,
)

from conftest import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")

if reference_available():
    import importlib
    import importlib.machinery
    import sys

    def load_ext(name):
        pkg = importlib.util.module_from_spec(
            importlib.machinery.ModuleSpec(f"refext_{name}", None, is_package=True)
        )
        pkg.__path__ = [f"/root/reference/diffsynth/extensions/{name}"]
        sys.modules.setdefault(f"refext_{name}", pkg)
        return importlib.import_module(f"refext_{name}.__init__")

    ref_esrgan = load_ext("ESRGAN")
    ref_rife = load_ext("RIFE")


def test_rrdbnet_matches_reference():
    import torch

    torch.manual_seed(0)
    model = ref_esrgan.RRDBNet(num_feat=16, num_block=2, num_grow_ch=8).float().eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, rrdbnet_params_from_torch(sd))

    x = np.random.default_rng(0).uniform(size=(1, 3, 16, 24)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    got = rrdbnet_apply(params, jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref,
                               rtol=3e-4, atol=3e-4)


def test_warp_matches_grid_sample():
    import torch

    rng = np.random.default_rng(1)
    img = rng.uniform(size=(2, 3, 16, 24)).astype(np.float32)
    flow = (rng.normal(size=(2, 2, 16, 24)) * 2).astype(np.float32)
    ref = ref_rife.warp(torch.from_numpy(img), torch.from_numpy(flow), "cpu").numpy()
    got = warp(jnp.asarray(np.moveaxis(img, 1, -1)),
               jnp.asarray(np.moveaxis(flow, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref,
                               rtol=2e-4, atol=2e-4)


def test_ifnet_matches_reference():
    import torch

    torch.manual_seed(0)
    model = ref_rife.IFNet().float().eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(np.ascontiguousarray(a)),
                                    ifnet_params_from_torch(sd))

    rng = np.random.default_rng(2)
    img0 = rng.uniform(size=(1, 3, 32, 64)).astype(np.float32)
    img1 = rng.uniform(size=(1, 3, 32, 64)).astype(np.float32)
    with torch.no_grad():
        _, _, merged = model(torch.from_numpy(np.concatenate([img0, img1], 1)))
        ref = merged[2].numpy()
    got = ifnet_apply(params, jnp.asarray(np.moveaxis(img0, 1, -1)),
                      jnp.asarray(np.moveaxis(img1, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref,
                               rtol=2e-3, atol=2e-3)


def test_interpolater_doubles_frames():
    import torch

    torch.manual_seed(1)
    model = ref_rife.IFNet().float().eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    rife = RIFEInterpolater(ifnet_params_from_torch(sd))
    # smooth frames (a resize roundtrip preserves them; noise would not)
    yy, xx = np.mgrid[0:40, 0:56].astype(np.float32)
    base = np.stack([xx / 56, yy / 40, (xx + yy) / 96], -1)
    frames = np.stack([np.clip(base + 0.05 * i, 0, 1) for i in range(3)])
    out = rife.interpolate(frames, num_iter=1)
    assert out.shape == (5, 40, 56, 3)
    np.testing.assert_allclose(out[0], frames[0], atol=0.05)  # 32-pad resize roundtrip
    assert np.isfinite(out).all()
