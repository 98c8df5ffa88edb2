"""Annotators + MultiControlNetManager (host-side; model-based detectors are
pluggable — see goal_force_tpu/controlnets.py)."""

import numpy as np
import pytest

from goal_force_tpu.controlnets import (
    Annotator,
    ControlNetUnit,
    MultiControlNetManager,
)


def _img():
    rng = np.random.default_rng(0)
    return (rng.uniform(0, 255, (32, 48, 3))).astype(np.uint8)


@pytest.mark.parametrize("pid", ["canny", "depth", "softedge", "lineart",
                                 "lineart_anime", "normal", "tile", "none",
                                 "inpaint"])
def test_annotator_shapes_and_range(pid):
    out = Annotator(pid)(_img())
    assert out.shape == (32, 48, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0 + 1e-6


def test_annotator_openpose_requires_processor():
    with pytest.raises(NotImplementedError):
        Annotator("openpose")(_img())
    out = Annotator("openpose", processor=lambda im: np.zeros_like(im))(_img())
    assert out.shape == (32, 48, 3)


def test_multi_controlnet_sums_scaled_residuals():
    calls = []

    def fake_apply(params, sample, t, ctx, cond, **kw):
        calls.append(cond)
        return [np.full((1, 2, 2, 4), params["v"], np.float32)]

    units = [
        ControlNetUnit(Annotator("tile"), {"v": 1.0}, fake_apply, scale=0.5),
        ControlNetUnit(Annotator("canny"), {"v": 2.0}, fake_apply, scale=1.0),
    ]
    mgr = MultiControlNetManager(units)
    conds = mgr.process_image(_img())
    assert len(conds) == 2
    res = mgr(None, None, None, conds)
    np.testing.assert_allclose(res[0], 0.5 * 1.0 + 1.0 * 2.0)
