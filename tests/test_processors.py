"""Video post-processor chain: PIL-parity for the editors, dispatch, chaining.

Reference: diffsynth/processors/{PILEditor,sequencial_processor,RIFE}.py.
"""

import numpy as np
import pytest

from goal_force_tpu.extensions.processors import (
    ContrastEditor,
    SequentialProcessor,
    SharpnessEditor,
    auto_processor,
    sequential_from_configs,
)


def _frames(f=3, h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(size=(f, h, w, 3)).astype(np.float32)


def _pil_enhance(frames, enhancer, rate):
    from PIL import Image

    u8 = np.clip(frames * 255.0 + 0.5, 0, 255).astype(np.uint8)
    out = []
    for fr in u8:
        img = enhancer(Image.fromarray(fr)).enhance(rate)
        out.append(np.asarray(img, np.uint8))
    return np.stack(out).astype(np.float32) / 255.0


@pytest.mark.parametrize("rate", [0.5, 1.0, 1.5, 3.0])
def test_contrast_matches_pil(rate):
    from PIL import ImageEnhance

    frames = _frames(seed=1)
    want = _pil_enhance(frames, ImageEnhance.Contrast, rate)
    got = ContrastEditor(rate)(frames)
    # u8 rounding at two spots: allow 1/255 per pixel
    assert np.abs(got - want).max() <= (1.0 / 255.0) + 1e-6


@pytest.mark.parametrize("rate", [0.5, 1.0, 1.5, 3.0])
def test_sharpness_matches_pil(rate):
    from PIL import ImageEnhance

    frames = _frames(seed=2)
    want = _pil_enhance(frames, ImageEnhance.Sharpness, rate)
    got = SharpnessEditor(rate)(frames)
    assert np.abs(got - want).max() <= (1.0 / 255.0) + 1e-6


def test_auto_processor_dispatch_and_chain():
    chain = sequential_from_configs([
        {"processor_type": "Contrast", "config": {"rate": 1.2}},
        {"processor_type": "Sharpness", "config": {"rate": 0.8}},
    ])
    frames = _frames(seed=3)
    got = chain(frames)
    want = SharpnessEditor(0.8)(ContrastEditor(1.2)(frames))
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.shape == frames.shape
    with pytest.raises(ValueError):
        auto_processor("NoSuchProcessor")


def test_sequential_empty_is_identity():
    frames = _frames(seed=4)
    np.testing.assert_allclose(SequentialProcessor()(frames), frames)


def test_rife_smoother_matches_reference_composition():
    """smooth() == the reference RIFESmoother's predict-then-blend schedule."""
    import torch

    from tests.test_extensions import ref_rife  # reference IFNet import helper
    from goal_force_tpu.extensions.rife import (
        RIFEInterpolater,
        RIFESmoother,
        ifnet_params_from_torch,
    )

    torch.manual_seed(3)
    model = ref_rife.IFNet().float().eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    interp = RIFEInterpolater(ifnet_params_from_torch(sd))

    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32)
    base = np.stack([xx / 32, yy / 32, (xx + yy) / 64], -1)
    frames = np.stack([np.clip(base + 0.07 * i, 0, 1) for i in range(4)])

    for interpolate in (True, False):
        got = RIFESmoother(interp, interpolate=interpolate)(frames)
        assert got.shape == frames.shape
        # endpoints pass through untouched
        np.testing.assert_allclose(got[0], frames[0], atol=1e-6)
        np.testing.assert_allclose(got[-1], frames[-1], atol=1e-6)

        # reference composition (processors/RIFE.py:55-77) with the torch model
        t = torch.from_numpy(np.moveaxis(frames, -1, 1))
        with torch.no_grad():
            _, _, merged = model(torch.cat([t[:-2], t[2:]], dim=1))
            pred = merged[2]
            if interpolate:
                _, _, merged2 = model(torch.cat([t[1:-1], pred], dim=1))
                mid = merged2[2]
            else:
                mid = (t[1:-1] + pred) / 2
        want = np.moveaxis(mid.numpy(), 1, -1)
        np.testing.assert_allclose(got[1:-1], np.clip(want, 0, 1),
                                   rtol=5e-3, atol=5e-3)
