"""Control-map renderer semantics (vs an independent per-frame re-derivation of the
reference's loop at /root/reference/src/goal_force/unified_dataset.py:775-940)."""

import math

import numpy as np

from goal_force_tpu.data.control_signal import (
    BLOB_RADIUS,
    ControlSpec,
    gaussian_blob,
    mass_blob_radius,
    render_control_video,
)


def _loop_blob(x, y, radius, height, width):
    yg, xg = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    d2 = (xg - x) ** 2 + (yg - y) ** 2
    return np.exp(-d2 / (2.0 * radius**2)).astype(np.float32)


def test_gaussian_blob_matches_loop():
    got = gaussian_blob([10.5, 50.0], [20.0, 3.0], 20.0, 48, 64)
    for i, (x, y) in enumerate([(10.5, 20.0), (50.0, 3.0)]):
        np.testing.assert_allclose(got[i], _loop_blob(x, y, 20.0, 48, 64), rtol=1e-5, atol=1e-6)


def _spec(**kw):
    base = dict(
        force=200.0, angle_deg=30.0, x_pos=0.25, y_pos=0.5,
        target_force=100.0, target_angle_deg=90.0, target_x_pos=0.75, target_y_pos=0.4,
        projectile_mass=2.0, projectile_xy_px=(40.0, 30.0),
        target_mass=3.0, target_xy_px=(100.0, 50.0),
    )
    base.update(kw)
    return ControlSpec(**base)


def test_moving_blob_trajectory_matches_reference_formula():
    H, W, F = 48, 128, 9
    out = render_control_video(_spec(), F, H, W, min_force=30.0, max_force=400.0)

    # Re-derive channel 0 per the reference loop.
    x_start, y_start = 0.25 * W, (1 - 0.5) * H
    norm = (200.0 - 30.0) / (400.0 - 30.0)
    disp = W / 8 + (W / 2 - W / 8) * norm
    x_end = x_start + disp * math.cos(math.radians(30.0))
    y_end = y_start - disp * math.sin(math.radians(30.0))
    for f in [0, 4, 8]:
        t = f / (F - 1)
        expect = _loop_blob(x_start * (1 - t) + x_end * t, y_start * (1 - t) + y_end * t, BLOB_RADIUS, H, W)
        expect = np.clip(expect, 0, 1)  # mass channel rendered -> global clamp
        np.testing.assert_allclose(out[f, :, :, 0], expect, rtol=1e-4, atol=1e-5)


def test_mass_channel_static_and_flipped():
    H, W, F = 48, 64, 5
    out = render_control_video(_spec(), F, H, W, min_force=30.0, max_force=400.0,
                               min_mass=1.0, max_mass=4.0)
    r_p = mass_blob_radius(2.0, 1.0, 4.0)
    r_t = mass_blob_radius(3.0, 1.0, 4.0)
    expect = _loop_blob(40.0, H - 30.0, r_p, H, W) + _loop_blob(100.0, H - 50.0, r_t, H, W)
    expect = np.clip(expect, 0, 1)
    for f in range(F):
        np.testing.assert_allclose(out[f, :, :, 2], expect, rtol=1e-4, atol=1e-5)


def test_masking_rules():
    H, W, F = 16, 24, 3
    # force == -1 masks the direct channel only.
    out = render_control_video(_spec(force=-1), F, H, W, min_force=0.0, max_force=1.0)
    assert np.all(out[..., 0] == 0) and out[..., 1].max() > 0
    # target_force == -1 masks the indirect channel only.
    out = render_control_video(_spec(target_force=-1), F, H, W, min_force=30.0, max_force=400.0)
    assert out[..., 0].max() > 0 and np.all(out[..., 1] == 0)
    # p_mask_out_masses = 1 zeroes channel 2 and (quirk) skips the clamp.
    out = render_control_video(_spec(), F, H, W, min_force=30.0, max_force=400.0,
                               p_mask_out_masses=1.0)
    assert np.all(out[..., 2] == 0)
    # mass == -1 entries are skipped.
    out = render_control_video(_spec(projectile_mass=-1, target_mass=-1), F, H, W,
                               min_force=30.0, max_force=400.0)
    assert np.all(out[..., 2] == 0)


def test_deterministic_masking_probabilities():
    H, W, F = 8, 8, 2
    rng = np.random.default_rng(0)
    # With p_direct=1, the direct channel is always masked when both forces present.
    out = render_control_video(_spec(), F, H, W, min_force=30.0, max_force=400.0,
                               p_mask_out_direct=1.0, rng=rng)
    assert np.all(out[..., 0] == 0) and out[..., 1].max() > 0
    out = render_control_video(_spec(), F, H, W, min_force=30.0, max_force=400.0,
                               p_mask_out_indirect=1.0, rng=rng)
    assert out[..., 0].max() > 0 and np.all(out[..., 1] == 0)


def test_native_backend_matches_numpy():
    from goal_force_tpu.native import native

    if native() is None:
        import pytest

        pytest.skip("no native toolchain")
    spec = _spec()
    a = render_control_video(spec, 9, 64, 96, min_force=30, max_force=400, backend="native")
    b = render_control_video(spec, 9, 64, 96, min_force=30, max_force=400, backend="numpy")
    np.testing.assert_allclose(a, b, atol=1e-6)
