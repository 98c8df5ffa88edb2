"""FastBlend behavioral tests.

The reference implementation (diffsynth/extensions/FastBlend) requires cupy
(hand-written CUDA RawKernels), which is not installed in this environment, so
golden parity against it is impossible; these tests instead pin down the
algorithm's defining behaviors: identity fixed point, translation recovery,
sparse-table window decomposition, and actual deflickering on a synthetic
flickering clip.
"""

import numpy as np
import pytest

from goal_force_tpu.extensions.fastblend import (
    FastBlendSmoother,
    PatchMatcher,
    PyramidPatchMatcher,
    TableManager,
    accurate_mode_blend,
    area_resize,
    balanced_mode_blend,
    bilinear_resize,
    fast_mode_blend,
    interpolation_mode_blend,
)


def _texture(rng, h, w, c=3):
    """Smooth random texture (so patch errors are informative)."""
    base = rng.uniform(0, 255, size=(h // 4 + 2, w // 4 + 2, c)).astype(np.float32)
    img = area_resize(base[None], h // 4 + 2, w // 4 + 2)[0]
    # upsample by bilinear to full size for smoothness
    return bilinear_resize(img[None], h, w)[0]


def test_area_resize_matches_torch_adaptive_pool():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 13, 17, 3)).astype(np.float32)
    got = area_resize(x, 5, 7)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(np.moveaxis(x, -1, 1)), size=(5, 7), mode="area")
    np.testing.assert_allclose(got, np.moveaxis(ref.numpy(), 1, -1),
                               rtol=1e-5, atol=1e-5)


def test_bilinear_resize_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(1, 9, 11, 2)).astype(np.float32)
    got = bilinear_resize(x, 14, 23)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(np.moveaxis(x, -1, 1)), size=(14, 23),
        mode="bilinear", align_corners=False)
    np.testing.assert_allclose(got, np.moveaxis(ref.numpy(), 1, -1),
                               rtol=1e-4, atol=1e-4)


def test_native_backend_matches_numpy():
    """The C++ kernels (native/patchmatch.cpp) must agree with the numpy
    reference implementation on all three ops and on the full NNF loop."""
    from goal_force_tpu.native import patchmatch_native

    if patchmatch_native() is None:
        pytest.skip("no g++ / native build unavailable")
    rng = np.random.default_rng(11)
    h, w, b = 20, 26, 4
    guide = rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)
    tgt = rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)
    style = rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)
    nnf = np.stack([rng.integers(0, h, (b, h, w)),
                    rng.integers(0, w, (b, h, w))], -1).astype(np.int32)

    pms = [PatchMatcher(h, w, 3, minimum_patch_size=3, num_iter=2, backend=bk,
                        rng=np.random.default_rng(0)) for bk in ("numpy", "native")]
    for pm in pms:
        pm.patch_size = 5
    a, c = pms
    np.testing.assert_allclose(
        a.get_patch_error(a.pad_image(guide), nnf, a.pad_image(tgt)),
        c.get_patch_error(c.pad_image(guide), nnf, c.pad_image(tgt)),
        rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(
        a.apply_nnf_to_image(nnf, a.pad_image(style)),
        c.apply_nnf_to_image(nnf, c.pad_image(style)),
        rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(
        a.get_pairwise_patch_error(a.pad_image(style), nnf),
        c.get_pairwise_patch_error(c.pad_image(style), nnf),
        rtol=1e-4, atol=1e-2)
    # full loop (same rng seeds -> identical candidate sequences)
    n0, r0 = a.estimate_nnf(guide, tgt, style, nnf.copy())
    n1, r1 = c.estimate_nnf(guide, tgt, style, nnf.copy())
    np.testing.assert_array_equal(n0, n1)
    np.testing.assert_allclose(r0, r1, rtol=1e-5, atol=1e-3)


def test_identity_nnf_is_fixed_point():
    """Identical guides + identity NNF: zero error, remap returns the style
    exactly, and no update can strictly improve — nnf stays identity."""
    rng = np.random.default_rng(2)
    h = w = 24
    guide = _texture(rng, h, w)[None]
    style = _texture(rng, h, w)[None]
    pm = PatchMatcher(h, w, 3, minimum_patch_size=3, num_iter=2,
                      rng=np.random.default_rng(0))
    yy, xx = np.mgrid[0:h, 0:w]
    identity = np.stack([yy, xx], 2).astype(np.int32)[None]
    nnf, remapped = pm.estimate_nnf(guide, guide.copy(), style, identity.copy())
    np.testing.assert_array_equal(nnf, identity)
    np.testing.assert_allclose(remapped, style, rtol=1e-4, atol=1e-3)


def test_patch_error_identity_zero():
    rng = np.random.default_rng(3)
    h = w = 16
    img = _texture(rng, h, w)[None]
    pm = PatchMatcher(h, w, 3, minimum_patch_size=5, num_iter=1)
    pm.patch_size = 5
    yy, xx = np.mgrid[0:h, 0:w]
    identity = np.stack([yy, xx], 2).astype(np.int32)[None]
    err = pm.get_patch_error(pm.pad_image(img), identity, pm.pad_image(img))
    np.testing.assert_allclose(err, 0.0, atol=1e-3)


def test_patchmatch_recovers_translation():
    """Target guide = source guide shifted by (+2, +3); the recovered NNF in
    the interior should map pixel (x, y) -> (x - 2, y - 3)."""
    rng = np.random.default_rng(4)
    h = w = 32
    big = rng.uniform(0, 255, size=(h + 8, w + 8, 3)).astype(np.float32)
    src = big[4:4 + h, 4:4 + w]
    tgt = big[2:2 + h, 1:1 + w]  # content of tgt(x,y) == src(x-2, y-3)
    pm = PatchMatcher(h, w, 3, minimum_patch_size=3, num_iter=3,
                      rng=np.random.default_rng(0))
    yy, xx = np.mgrid[0:h, 0:w]
    nnf = np.stack([yy, xx], 2).astype(np.int32)[None]
    # propagation moves candidates 1 px per round, so refine twice (the
    # pyramid provides the equivalent multi-pass refinement in real use)
    for _ in range(2):
        nnf, _ = pm.estimate_nnf(src[None], tgt[None], src[None], nnf)
    inner = (slice(0, 1), slice(8, h - 8), slice(8, w - 8))
    dx = nnf[..., 0][inner] - (yy[None][inner] - 2)
    dy = nnf[..., 1][inner] - (xx[None][inner] - 3)
    frac_exact = np.mean((dx == 0) & (dy == 0))
    assert frac_exact > 0.95, frac_exact


def test_pyramid_identity_roundtrip():
    """Pyramid matcher on identical guides reproduces the style frame."""
    rng = np.random.default_rng(5)
    h, w = 48, 40
    guide = _texture(rng, h, w)[None]
    style = _texture(rng, h, w)[None]
    engine = PyramidPatchMatcher(h, w, 3, minimum_patch_size=3, num_iter=2, seed=0)
    assert engine.pyramid_level >= 2
    nnf, remapped = engine.estimate_nnf(guide, guide.copy(), style)
    yy, xx = np.mgrid[0:h, 0:w]
    identity = np.stack([yy, xx], 2).astype(np.int32)[None]
    np.testing.assert_array_equal(nnf, identity)
    np.testing.assert_allclose(remapped, style, rtol=1e-3, atol=1e-2)


def test_table_manager_tree_query_partitions_window():
    tm = TableManager()
    for l in range(0, 12):
        for r in range(l, 24):
            nodes = tm.tree_query(l, r)
            covered = []
            for idx, level in nodes:
                covered += list(range(idx - (1 << level) + 1, idx + 1))
            assert sorted(covered) == list(range(l, r + 1)), (l, r, nodes)


def test_table_manager_tasks_provide_tree_query_levels():
    """Every (node, level) tree_query can request must exist in the table
    that task_list builds (level v at node t needs tasks up to level v)."""
    tm = TableManager()
    for n in [1, 2, 3, 5, 8, 13, 21]:
        levels = {i: 0 for i in range(n)}
        for t in tm.task_list(n):
            assert 0 <= t["source"] < t["target"] < n
            levels[t["target"]] = max(levels[t["target"]], t["level"])
        for target in range(n):
            for left in range(max(0, target - 7), target + 1):
                for idx, level in tm.tree_query(left, target):
                    assert level <= levels[idx], (n, target, idx, level)


def test_fast_mode_blend_weights_sum():
    """With perfectly constant guides+styles, all blends are exact and the
    output equals the input style (weights telescope to 1)."""
    rng = np.random.default_rng(6)
    frame = _texture(rng, 24, 24)
    guides = [frame.copy() for _ in range(5)]
    styles = [frame.copy() for _ in range(5)]
    engine = PyramidPatchMatcher(24, 24, 3, minimum_patch_size=3, num_iter=2, seed=0)
    out = fast_mode_blend(guides, styles, engine, batch_size=4, window_size=3)
    assert len(out) == 5
    for f in out:
        np.testing.assert_allclose(f, frame, rtol=1e-3, atol=0.5)


def test_smoother_reduces_flicker():
    """Static scene + alternating global brightness flicker in the styled
    frames: the smoothed clip's frame-to-frame variation must collapse."""
    rng = np.random.default_rng(7)
    h = w = 24
    scene = _texture(rng, h, w)
    guides = [scene.astype(np.uint8)] * 6
    flicker = [(-20 if i % 2 else 20) for i in range(6)]
    styles = [np.clip(scene + d, 0, 255).astype(np.uint8) for d in flicker]

    smoother = FastBlendSmoother(batch_size=4, window_size=4,
                                 minimum_patch_size=3, num_iter=2, seed=0)
    out = smoother(styles, guides)  # (rendered, original)
    assert len(out) == 6 and out[0].shape == (h, w, 3) and out[0].dtype == np.uint8

    def flicker_energy(frames):
        f = np.stack([x.astype(np.float32) for x in frames])
        return float(np.mean(np.abs(np.diff(f, axis=0))))

    before, after = flicker_energy(styles), flicker_energy(out)
    assert after < 0.5 * before, (before, after)


def test_accurate_and_balanced_modes_run():
    rng = np.random.default_rng(8)
    scene = _texture(rng, 24, 24)
    guides = [scene] * 3
    styles = [np.clip(scene + d, 0, 255) for d in (10, -10, 10)]
    engine_acc = PyramidPatchMatcher(24, 24, 3, minimum_patch_size=3, num_iter=2,
                                     use_mean_target_style=True, seed=0)
    out = accurate_mode_blend(guides, styles, engine_acc, batch_size=2, window_size=2)
    assert len(out) == 3 and out[0].shape == (24, 24, 3)
    engine_bal = PyramidPatchMatcher(24, 24, 3, minimum_patch_size=3, num_iter=2, seed=0)
    out = balanced_mode_blend(guides, styles, engine_bal, batch_size=2, window_size=2)
    assert len(out) == 3
    # balanced mode on a static scene averages the flicker away
    spread = np.mean(np.abs(out[0] - out[1]))
    assert spread < np.mean(np.abs(styles[0] - styles[1]))


def test_interpolation_mode_propagates_keyframes():
    """Keyframe styles propagate to unstyled frames of a static scene."""
    rng = np.random.default_rng(9)
    scene = _texture(rng, 24, 24)
    guides = [scene] * 5
    keyframes = [np.clip(scene + 15, 0, 255), np.clip(scene + 15, 0, 255)]
    engine = PyramidPatchMatcher(24, 24, 3, minimum_patch_size=3, num_iter=2,
                                 use_pairwise_patch_error=True, seed=0)
    out = interpolation_mode_blend(guides, keyframes, [0, 4], engine, batch_size=2)
    assert len(out) == 5 and all(f is not None for f in out)
    # middle frame should look like the (identical) keyframes
    np.testing.assert_allclose(out[2], keyframes[0], atol=2.0)
