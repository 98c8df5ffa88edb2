"""3D causal VAE parity: closed-form full-sequence convs vs the reference's streaming
feat-cache implementation (tiny config, f32, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu import configs
from goal_force_tpu.io.torch_convert import vae_params_from_torch
from goal_force_tpu.models import vae as jvae

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
    cfg = configs.tiny_vae()
    model = ref_vae.VideoVAE_(
        dim=cfg.dim, z_dim=cfg.z_dim, dim_mult=list(cfg.dim_mult),
        num_res_blocks=cfg.num_res_blocks,
        temperal_downsample=list(cfg.temporal_downsample),
    ).eval().float()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = vae_params_from_torch(sd, cfg)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)
    return cfg, model, params


def _ref_scale(z_dim):
    import torch

    return [torch.zeros(z_dim), torch.ones(z_dim)]


@pytest.mark.parametrize("t", [1, 5, 9])
def test_encode_matches_reference_streaming(tiny, t):
    import torch

    cfg, model, params = tiny
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, t, 32, 32)).astype(np.float32)

    with torch.no_grad():
        ref = model.encode(torch.from_numpy(x), _ref_scale(cfg.z_dim)).numpy()

    got = jvae.encode(params, cfg, jnp.asarray(np.moveaxis(x, 1, -1)))
    got_cf = np.moveaxis(np.asarray(got), -1, 1)
    assert got_cf.shape == ref.shape
    np.testing.assert_allclose(got_cf, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("t", [1, 3])
def test_decode_matches_reference_streaming(tiny, t):
    import torch

    cfg, model, params = tiny
    rng = np.random.default_rng(1)
    z = rng.normal(size=(1, cfg.z_dim, t, 4, 4)).astype(np.float32)

    with torch.no_grad():
        ref = model.decode(torch.from_numpy(z), _ref_scale(cfg.z_dim)).numpy()

    got = jvae.decode(params, cfg, jnp.asarray(np.moveaxis(z, 1, -1)))
    got_cf = np.moveaxis(np.asarray(got), -1, 1)
    assert got_cf.shape == ref.shape
    np.testing.assert_allclose(got_cf, ref, rtol=5e-4, atol=5e-4)


def test_temporal_compression_shapes(tiny):
    cfg, _, params = tiny
    x = jnp.zeros((1, 9, 32, 32, 3))
    z = jvae.encode(params, cfg, x)
    assert z.shape == (1, 3, 4, 4, cfg.z_dim)  # 1+4k -> 1+k, spatial /8
    out = jvae.decode(params, cfg, z)
    assert out.shape == (1, 9, 32, 32, 3)      # L -> 4L-3


def test_tiled_encode_close_to_full(tiny):
    cfg, _, params = tiny
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 5, 64, 64, 3)).astype(np.float32)) * 0.5
    full = jvae.encode_video(params, cfg, x)
    tiled = jvae.encode_video_tiled(params, cfg, x, tile_size=(6, 6), tile_stride=(4, 4))
    assert tiled.shape == full.shape
    # interior agrees; borders blend (reference behavior)
    diff = np.abs(np.asarray(tiled) - np.asarray(full))
    assert np.median(diff) < 0.05
