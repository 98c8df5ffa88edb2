"""Golden parity for the 2D/3D spatial tilers vs the reference's tiler.py workers."""

import numpy as np
import pytest

import jax.numpy as jnp

from goal_force_tpu.models.tiler import (
    tiled_forward_2d,
    tiled_forward_2d_shift,
    tiled_forward_2d_to_3d,
)

from conftest import load_reference_module, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def _ref_tiler():
    return load_reference_module("diffsynth/models/tiler.py", "ref_tiler")


def _mix_matrix(c_in, c_out, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(c_in, c_out)).astype(np.float32)


def test_tiled_forward_2d_identity_scale():
    import torch

    ref = _ref_tiler()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 24, 16, 3)).astype(np.float32)
    w = _mix_matrix(3, 5)

    fn = lambda t: jnp.einsum("bhwc,cd->bhwd", t, jnp.asarray(w))
    ours = np.asarray(tiled_forward_2d(fn, jnp.asarray(x), 8, 4))

    tfn = lambda t: torch.einsum("bchw,cd->bdhw", t, torch.from_numpy(w))
    theirs = ref.TileWorker().tiled_forward(
        tfn, torch.from_numpy(x.transpose(0, 3, 1, 2)), 8, 4,
        tile_device="cpu", tile_dtype=torch.float32,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scale", [2, 8])
def test_tiled_forward_2d_upscale(scale):
    import torch

    ref = _ref_tiler()
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 16, 24, 4)).astype(np.float32)

    # nearest-neighbour upsample: io_scale = scale (VAE-decoder-like)
    fn = lambda t: jnp.repeat(jnp.repeat(t, scale, axis=1), scale, axis=2)
    ours = np.asarray(tiled_forward_2d(fn, jnp.asarray(x), 8, 4))

    tfn = lambda t: torch.repeat_interleave(
        torch.repeat_interleave(t, scale, dim=2), scale, dim=3)
    theirs = ref.TileWorker().tiled_forward(
        tfn, torch.from_numpy(x.transpose(0, 3, 1, 2)), 8, 4,
        tile_device="cpu", tile_dtype=torch.float32,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_tiled_forward_2d_downscale():
    import torch

    ref = _ref_tiler()
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)

    # 2x average pool: io_scale = 0.5 (VAE-encoder-like)
    def fn(t):
        b, h, w, c = t.shape
        return t.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))

    ours = np.asarray(tiled_forward_2d(fn, jnp.asarray(x), 16, 8))

    tfn = lambda t: torch.nn.functional.avg_pool2d(t, 2)
    theirs = ref.TileWorker().tiled_forward(
        tfn, torch.from_numpy(x.transpose(0, 3, 1, 2)), 16, 8,
        tile_device="cpu", tile_dtype=torch.float32,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_tiled_forward_2d_rejects_uncovered_geometry():
    fn = lambda t: t
    x = jnp.zeros((1, 30, 24, 3))  # (30 - 8) % 4 != 0 on H... actually 22 % 4 = 2
    with pytest.raises(ValueError):
        tiled_forward_2d(fn, x, 8, 4)


def test_tiled_forward_2d_shift_matches_fast_tile_worker():
    import torch

    ref = _ref_tiler()
    rng = np.random.default_rng(4)
    # 22 is NOT on the stride grid: exercises the clamped final tile
    x = rng.normal(size=(2, 22, 18, 3)).astype(np.float32)
    # the reference FastTileWorker pre-allocates with the INPUT channel count,
    # so forward_fn must be channel-preserving
    w = _mix_matrix(3, 3)
    xj = jnp.asarray(x)

    fn = lambda h0, h1, w0, w1: jnp.einsum(
        "bhwc,cd->bhwd", xj[:, h0:h1, w0:w1, :], jnp.asarray(w))
    ours = np.asarray(tiled_forward_2d_shift(fn, (2, 22, 18), 8, 4))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    tfn = lambda hl, hr, wl, wr: torch.einsum(
        "bchw,cd->bdhw", xt[:, :, hl:hr, wl:wr], torch.from_numpy(w))
    theirs = ref.FastTileWorker().tiled_forward(
        tfn, xt, 8, 4, tile_device="cpu", tile_dtype=torch.float32,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_tiled_forward_2d_to_3d_matches_reference():
    import torch

    ref = _ref_tiler()
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 3, 20, 28, 4)).astype(np.float32)  # B T H W C
    w = _mix_matrix(4, 6)

    # channel mix + 2x spatial upsample, temporal preserved:
    # scales (C,T,H,W) = (6/4, 1, 2, 2)
    def fn(t):
        t = jnp.einsum("bthwc,cd->bthwd", t, jnp.asarray(w))
        return jnp.repeat(jnp.repeat(t, 2, axis=2), 2, axis=3)

    ours = np.asarray(tiled_forward_2d_to_3d(
        fn, jnp.asarray(x), (8, 8), (4, 4), scales=(6 / 4, 1, 2, 2)))

    def tfn(t):  # t: (B, C, T, H, W)
        t = torch.einsum("bcthw,cd->bdthw", t, torch.from_numpy(w))
        return torch.repeat_interleave(
            torch.repeat_interleave(t, 2, dim=3), 2, dim=4)

    theirs = ref.TileWorker2Dto3D().tiled_forward(
        tfn, torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), (8, 8), (4, 4),
        tile_device="cpu", tile_dtype=torch.float32,
        computation_device="cpu", computation_dtype=torch.float32,
        scales=[6 / 4, 1, 2, 2],
    ).numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)
