"""Golden parity for the learned lineart annotator.

The reference's Annotator("lineart") wraps controlnet_aux's LineartDetector
(diffsynth/controlnets/processors.py:21-23) — the CycleGAN-style
``Generator(3, 1, 3)`` shipped as sk_model.pth. controlnet_aux is not
installed here, so the torch side is reconstructed from the checkpoint's
module layout (Sequential indices model0..model4, affine-free instance
norms) with random weights; the converter must reproduce it exactly.
"""

import numpy as np
import pytest

import jax

from goal_force_tpu.controlnets import Annotator
from goal_force_tpu.extensions.lineart import (init_lineart, lineart_annotate,
                                               lineart_forward,
                                               lineart_params_from_torch)

torch = pytest.importorskip("torch")
nn = torch.nn


def _residual_block(dim):
    return nn.Sequential(
        nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3), nn.InstanceNorm2d(dim),
        nn.ReLU(inplace=True),
        nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3), nn.InstanceNorm2d(dim))


class _TorchResBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_block = _residual_block(dim)

    def forward(self, x):
        return x + self.conv_block(x)


class _TorchGenerator(nn.Module):
    """The sk_model.pth module layout (keys model{0..4}.<seq-idx>)."""

    def __init__(self):
        super().__init__()
        self.model0 = nn.Sequential(
            nn.ReflectionPad2d(3), nn.Conv2d(3, 64, 7), nn.InstanceNorm2d(64),
            nn.ReLU(inplace=True))
        self.model1 = nn.Sequential(
            nn.Conv2d(64, 128, 3, stride=2, padding=1), nn.InstanceNorm2d(128),
            nn.ReLU(inplace=True),
            nn.Conv2d(128, 256, 3, stride=2, padding=1), nn.InstanceNorm2d(256),
            nn.ReLU(inplace=True))
        self.model2 = nn.Sequential(*[_TorchResBlock(256) for _ in range(3)])
        self.model3 = nn.Sequential(
            nn.ConvTranspose2d(256, 128, 3, stride=2, padding=1,
                               output_padding=1),
            nn.InstanceNorm2d(128), nn.ReLU(inplace=True),
            nn.ConvTranspose2d(128, 64, 3, stride=2, padding=1,
                               output_padding=1),
            nn.InstanceNorm2d(64), nn.ReLU(inplace=True))
        self.model4 = nn.Sequential(
            nn.ReflectionPad2d(3), nn.Conv2d(64, 1, 7), nn.Sigmoid())

    def forward(self, x):
        for m in (self.model0, self.model1, self.model2, self.model3,
                  self.model4):
            x = m(x)
        return x


def test_lineart_golden_parity():
    torch.manual_seed(0)
    ref = _TorchGenerator().eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = lineart_params_from_torch(sd)
    with pytest.raises(ValueError, match="unconsumed"):
        lineart_params_from_torch({**sd, "bogus.k": sd["model0.1.bias"]})

    img = np.random.default_rng(0).uniform(0, 255, (1, 24, 32, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)) / 255.0)
    got = lineart_forward(params, img)
    np.testing.assert_allclose(np.asarray(got), want.numpy()[:, 0], atol=2e-5)


def test_lineart_annotator_wiring(tmp_path):
    from safetensors.numpy import save_file

    torch.manual_seed(1)
    ref = _TorchGenerator().eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    path = tmp_path / "sk_model.safetensors"
    save_file(sd, str(path))

    ann = Annotator("lineart", weights_path=str(path))
    img = np.random.default_rng(1).integers(0, 255, (30, 42, 3), np.uint8)
    out = ann(img)
    assert out.shape == (30, 42, 3) and out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    # inversion: annotator output == 1 - network line map (uint8 rounded)
    params = lineart_params_from_torch(sd)
    direct = lineart_annotate(params, img, invert=False)[..., 0]
    np.testing.assert_allclose(out[..., 0] * 255, 255 - direct, atol=1e-3)


def test_lineart_odd_sizes_match_torch():
    """Non-multiple-of-4 inputs: edge-padded to stride alignment, cropped
    back — parity is on the valid region against torch on the padded input."""
    torch.manual_seed(2)
    ref = _TorchGenerator().eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = lineart_params_from_torch(sd)
    img = np.random.default_rng(2).integers(0, 255, (27, 33, 3), np.uint8)
    out = lineart_annotate(params, img, invert=False)
    pad = np.pad(img.astype(np.float32), ((0, 1), (0, 3), (0, 0)),
                 mode="edge")
    with torch.no_grad():
        want = ref(torch.from_numpy(
            pad.transpose(2, 0, 1)[None]) / 255.0)[0, 0, :27, :33].numpy()
    want = np.clip(want * 255.0, 0, 255).astype(np.uint8)
    np.testing.assert_allclose(out[..., 0].astype(np.int32), want, atol=1)
