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
    out = Annotator(pid, approx=True)(_img())
    assert out.shape == (32, 48, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0 + 1e-6


def test_annotator_approximations_are_opt_in():
    # learned-detector ids refuse to silently fall back (VERDICT r2 #5/#10)
    with pytest.raises(ValueError):
        Annotator("depth")(_img())
    with pytest.raises(ValueError):
        Annotator("softedge")(_img())
    Annotator("canny")(_img())          # exact ids need no opt-in


def test_annotator_openpose_requires_processor():
    with pytest.raises(NotImplementedError):
        Annotator("openpose", approx=True)(_img())
    out = Annotator("openpose", processor=lambda im: np.zeros_like(im))(_img())
    assert out.shape == (32, 48, 3)


def test_hed_learned_annotator_golden_and_wiring(tmp_path):
    """The ported HED net matches a torch mirror of ControlNetHED_Apache2 on
    the released checkpoint layout, and Annotator('softedge',
    weights_path=...) serves it."""
    import torch

    from goal_force_tpu.extensions.hed import (
        HED_STAGES,
        hed_forward,
        hed_params_from_torch,
    )

    torch.manual_seed(0)
    sd = {"norm": torch.zeros(1, 3, 1, 1) + 0.3}
    for k, (cin, cout, n, _) in enumerate(HED_STAGES, start=1):
        for i in range(n):
            ci = cin if i == 0 else cout
            sd[f"block{k}.convs.{i}.weight"] = torch.randn(cout, ci, 3, 3) * 0.05
            sd[f"block{k}.convs.{i}.bias"] = torch.randn(cout) * 0.01
        sd[f"block{k}.projection.weight"] = torch.randn(1, cout, 1, 1) * 0.05
        sd[f"block{k}.projection.bias"] = torch.randn(1) * 0.01

    # torch mirror of the Apache2 forward (x - norm; per stage: optional 2x2
    # maxpool, conv+relu chain, 1x1 projection; maps resized + averaged + sigmoid)
    def torch_forward(x):
        h = x - sd["norm"]
        maps = []
        for k, (_, _, n, down) in enumerate(HED_STAGES, start=1):
            if down:
                h = torch.nn.functional.max_pool2d(h, 2, 2)
            for i in range(n):
                h = torch.nn.functional.relu(torch.nn.functional.conv2d(
                    h, sd[f"block{k}.convs.{i}.weight"],
                    sd[f"block{k}.convs.{i}.bias"], padding=1))
            maps.append(torch.nn.functional.conv2d(
                h, sd[f"block{k}.projection.weight"],
                sd[f"block{k}.projection.bias"]))
        up = [torch.nn.functional.interpolate(m, size=x.shape[2:],
                                              mode="bilinear",
                                              align_corners=False)
              for m in maps]
        return torch.sigmoid(torch.stack(up).mean(0))[:, 0]

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (1, 32, 48, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_forward(torch.tensor(img.transpose(0, 3, 1, 2))).numpy()

    import jax.numpy as jnp

    params = hed_params_from_torch({k: v.numpy() for k, v in sd.items()})
    got = np.asarray(hed_forward(params, jnp.asarray(img)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)

    # end-to-end: save the checkpoint, load through the Annotator
    import safetensors.numpy

    path = str(tmp_path / "ControlNetHED.safetensors")
    safetensors.numpy.save_file({k: v.numpy() for k, v in sd.items()}, path)
    ann = Annotator("softedge", weights_path=path)
    pix = _img()
    out = ann(pix)
    assert out.shape == (32, 48, 3) and 0.0 <= out.min() and out.max() <= 1.0
    direct = np.asarray(hed_forward(
        params, jnp.asarray(pix, jnp.float32)[None]))[0]
    np.testing.assert_allclose(out[..., 0], direct, atol=1e-5)


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
