"""VAE38 parity vs the reference streaming implementation (tiny config, f32, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models import vae38 as j38

from conftest import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")

if reference_available():
    import importlib
    import importlib.machinery
    import sys

    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refmodels", None, is_package=True)
    )
    pkg.__path__ = ["/root/reference/diffsynth/models"]
    sys.modules.setdefault("refmodels", pkg)
    ref_vae = importlib.import_module("refmodels.wan_video_vae")


@pytest.fixture(scope="module")
def tiny():
    import torch

    torch.manual_seed(0)
    cfg = j38.tiny_vae38()
    model = ref_vae.VideoVAE38_(
        dim=cfg.dim, z_dim=cfg.z_dim, dec_dim=cfg.dec_dim, dim_mult=list(cfg.dim_mult),
        num_res_blocks=cfg.num_res_blocks,
        temperal_downsample=list(cfg.temporal_downsample),
    ).eval().float()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32),
                                    j38.vae38_params_from_torch(sd, cfg))
    return cfg, model, params


def _scale(z):
    import torch

    return [torch.zeros(z), torch.ones(z)]


@pytest.mark.parametrize("t", [1, 5])
def test_encode38_matches_reference(tiny, t):
    import torch

    cfg, model, params = tiny
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, t, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = model.encode(torch.from_numpy(x), _scale(cfg.z_dim)).numpy()
    got = j38.encode(params, cfg, jnp.asarray(np.moveaxis(x, 1, -1)))
    got_cf = np.moveaxis(np.asarray(got), -1, 1)
    assert got_cf.shape == ref.shape
    np.testing.assert_allclose(got_cf, ref, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("t", [1, 3])
def test_decode38_matches_reference(tiny, t):
    import torch

    cfg, model, params = tiny
    rng = np.random.default_rng(1)
    z = rng.normal(size=(1, cfg.z_dim, t, 2, 2)).astype(np.float32)
    with torch.no_grad():
        ref = model.decode(torch.from_numpy(z), _scale(cfg.z_dim)).numpy()
    got = j38.decode(params, cfg, jnp.asarray(np.moveaxis(z, 1, -1)))
    got_cf = np.moveaxis(np.asarray(got), -1, 1)
    assert got_cf.shape == ref.shape
    np.testing.assert_allclose(got_cf, ref, rtol=5e-4, atol=5e-4)
