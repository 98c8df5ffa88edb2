"""Golden parity for the learned anime-lineart annotator.

The reference's Annotator("lineart_anime") wraps controlnet_aux's
LineartAnimeDetector (diffsynth/controlnets/processors.py:24-26) — the
pix2pix ``UnetGenerator(3, 1, 8, 64)`` shipped as netG.pth. controlnet_aux
is not installed here, so the torch side is reconstructed with the same
recursive UnetSkipConnectionBlock nesting (affine-free instance norms) at
random weights; the converter must reproduce it exactly.
"""

import functools

import numpy as np
import pytest

import jax

from goal_force_tpu.extensions.lineart_anime import (
    NUM_DOWNS, init_lineart_anime, lineart_anime_annotate,
    lineart_anime_forward, lineart_anime_params_from_torch)

torch = pytest.importorskip("torch")
nn = torch.nn


class _SkipBlock(nn.Module):
    """pix2pix UnetSkipConnectionBlock with affine-free InstanceNorm2d."""

    def __init__(self, outer_nc, inner_nc, input_nc=None, submodule=None,
                 outermost=False, innermost=False):
        super().__init__()
        self.outermost = outermost
        norm = functools.partial(nn.InstanceNorm2d, affine=False,
                                 track_running_stats=False)
        if input_nc is None:
            input_nc = outer_nc
        downconv = nn.Conv2d(input_nc, inner_nc, 4, stride=2, padding=1,
                             bias=True)
        downrelu = nn.LeakyReLU(0.2, True)
        uprelu = nn.ReLU(True)
        if outermost:
            upconv = nn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, stride=2,
                                        padding=1)
            model = [downconv, submodule, uprelu, upconv, nn.Tanh()]
        elif innermost:
            upconv = nn.ConvTranspose2d(inner_nc, outer_nc, 4, stride=2,
                                        padding=1, bias=True)
            model = [downrelu, downconv, uprelu, upconv, norm(outer_nc)]
        else:
            upconv = nn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, stride=2,
                                        padding=1, bias=True)
            model = [downrelu, downconv, norm(inner_nc), submodule, uprelu,
                     upconv, norm(outer_nc)]
        self.model = nn.Sequential(*model)

    def forward(self, x):
        if self.outermost:
            return self.model(x)
        return torch.cat([x, self.model(x)], 1)


class _UnetGenerator(nn.Module):
    def __init__(self, input_nc=3, output_nc=1, num_downs=NUM_DOWNS, ngf=64):
        super().__init__()
        block = _SkipBlock(ngf * 8, ngf * 8, innermost=True)
        for _ in range(num_downs - 5):
            block = _SkipBlock(ngf * 8, ngf * 8, submodule=block)
        block = _SkipBlock(ngf * 4, ngf * 8, submodule=block)
        block = _SkipBlock(ngf * 2, ngf * 4, submodule=block)
        block = _SkipBlock(ngf, ngf * 2, submodule=block)
        self.model = _SkipBlock(output_nc, ngf, input_nc=input_nc,
                                submodule=block, outermost=True)

    def forward(self, x):
        return self.model(x)


def test_lineart_anime_golden_parity():
    torch.manual_seed(0)
    ref = _UnetGenerator().eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = lineart_anime_params_from_torch(sd)
    with pytest.raises(ValueError, match="unconsumed"):
        lineart_anime_params_from_torch(
            {**sd, "bogus.k": sd["model.model.0.bias"]})
    # a DataParallel-style "module." prefix is stripped
    lineart_anime_params_from_torch({"module." + k: v for k, v in sd.items()})

    img = np.random.default_rng(0).uniform(-1, 1, (1, 256, 256, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    got = lineart_anime_forward(params, img)
    np.testing.assert_allclose(np.asarray(got), want.numpy()[:, 0],
                               atol=3e-5)


def test_lineart_anime_annotator_wiring(tmp_path):
    from safetensors.numpy import save_file

    from goal_force_tpu.controlnets import Annotator

    torch.manual_seed(1)
    ref = _UnetGenerator().eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    path = tmp_path / "netG.safetensors"
    save_file(sd, str(path))
    ann = Annotator("lineart_anime", weights_path=str(path))
    img = np.random.default_rng(1).integers(0, 255, (100, 140, 3), np.uint8)
    out = ann(img)
    assert out.shape == (100, 140, 3) and out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    # inversion semantics vs the raw net output
    params = lineart_anime_params_from_torch(sd)
    direct = lineart_anime_annotate(params, img, invert=False)[..., 0]
    np.testing.assert_allclose(out[..., 0] * 255, 255 - direct, atol=1e-3)


def test_lineart_anime_init_runs():
    params = init_lineart_anime(jax.random.PRNGKey(0))
    img = np.random.default_rng(2).integers(0, 255, (64, 80, 3), np.uint8)
    out = lineart_anime_annotate(params, img)
    assert out.shape == (64, 80, 3) and out.dtype == np.uint8
