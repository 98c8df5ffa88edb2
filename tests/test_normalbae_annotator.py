"""Golden parity for the learned NormalBae surface-normal annotator.

The reference's Annotator("normal") wraps controlnet_aux's NormalBaeDetector
(diffsynth/controlnets/processors.py:29-31) — NNET with a
tf_efficientnet_b5_ap encoder (geffnet layout) and the BN decoder, shipped as
scannet.pt. Neither controlnet_aux, timm, nor geffnet is installed here, so
the torch side is reconstructed from the checkpoint layout (TF-SAME padding,
BN eps 1e-3, swish, SE blocks; UpSampleBN decoder with align_corners
interpolation and dense eval refinement) at random weights + random BN
running stats; the converter must reproduce it exactly.
"""

import math

import numpy as np
import pytest

import jax

from goal_force_tpu.extensions.normalbae import (B5_STAGES, init_normalbae,
                                                 normalbae_annotate,
                                                 normalbae_forward,
                                                 normalbae_params_from_torch)

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


class Conv2dSame(nn.Conv2d):
    """geffnet conv2d_same: TF SAME dynamic padding."""

    def __init__(self, *a, **kw):
        kw["padding"] = 0
        super().__init__(*a, **kw)

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph = max((math.ceil(ih / sh) - 1) * sh + kh - ih, 0)
        pw = max((math.ceil(iw / sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0, (1, 1),
                        self.groups)


def _bn(c):
    return nn.BatchNorm2d(c, eps=1e-3)


def _swish(x):
    return x * torch.sigmoid(x)


class _SE(nn.Module):
    def __init__(self, ch, red):
        super().__init__()
        self.conv_reduce = nn.Conv2d(ch, red, 1, bias=True)
        self.conv_expand = nn.Conv2d(red, ch, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(_swish(self.conv_reduce(s)))
        return x * torch.sigmoid(s)


class _DSBlock(nn.Module):
    def __init__(self, cin, cout, k):
        super().__init__()
        self.conv_dw = Conv2dSame(cin, cin, k, stride=1, groups=cin,
                                  bias=False)
        self.bn1 = _bn(cin)
        self.se = _SE(cin, max(1, int(cin * 0.25)))
        self.conv_pw = nn.Conv2d(cin, cout, 1, bias=False)
        self.bn2 = _bn(cout)
        self.has_skip = cin == cout

    def forward(self, x):
        h = _swish(self.bn1(self.conv_dw(x)))
        h = self.se(h)
        h = self.bn2(self.conv_pw(h))
        return h + x if self.has_skip else h


class _IRBlock(nn.Module):
    def __init__(self, cin, cout, k, stride, e):
        super().__init__()
        mid = cin * e
        self.conv_pw = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = _bn(mid)
        self.conv_dw = Conv2dSame(mid, mid, k, stride=stride, groups=mid,
                                  bias=False)
        self.bn2 = _bn(mid)
        self.se = _SE(mid, max(1, int(cin * 0.25)))
        self.conv_pwl = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = _bn(cout)
        self.has_skip = stride == 1 and cin == cout

    def forward(self, x):
        h = _swish(self.bn1(self.conv_pw(x)))
        h = _swish(self.bn2(self.conv_dw(h)))
        h = self.se(h)
        h = self.bn3(self.conv_pwl(h))
        return h + x if self.has_skip else h


class _EffNetB5(nn.Module):
    """geffnet tf_efficientnet_b5_ap module layout (eval subset)."""

    def __init__(self):
        super().__init__()
        self.conv_stem = Conv2dSame(3, 48, 3, stride=2, bias=False)
        self.bn1 = _bn(48)
        stages = []
        for n, k, stride, e, cin, cout in B5_STAGES:
            blocks = []
            for i in range(n):
                ci = cin if i == 0 else cout
                s = stride if i == 0 else 1
                blocks.append(_DSBlock(ci, cout, k) if e == 1
                              else _IRBlock(ci, cout, k, s, e))
            stages.append(nn.Sequential(*blocks))
        self.blocks = nn.Sequential(*stages)
        self.conv_head = nn.Conv2d(512, 2048, 1, bias=False)
        self.bn2 = _bn(2048)
        self.classifier = nn.Linear(2048, 10)

    def forward(self, x):
        feats = []
        h = _swish(self.bn1(self.conv_stem(x)))
        for s, stage in enumerate(self.blocks):
            h = stage(h)
            if s in (0, 1, 2, 4):
                feats.append(h)
        feats.append(self.conv_head(h))
        return feats


class _Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.original_model = _EffNetB5()

    def forward(self, x):
        return self.original_model(x)


class _UpSampleBN(nn.Module):
    def __init__(self, skip_input, out):
        super().__init__()
        self._net = nn.Sequential(
            nn.Conv2d(skip_input, out, 3, 1, 1), _bn(out), nn.LeakyReLU(),
            nn.Conv2d(out, out, 3, 1, 1), _bn(out), nn.LeakyReLU())

    def forward(self, x, concat_with):
        up = F.interpolate(x, size=concat_with.shape[2:], mode="bilinear",
                           align_corners=True)
        return self._net(torch.cat([up, concat_with], dim=1))


def _norm_normalize(out):
    n, kappa = out[:, :3], out[:, 3:]
    n = n / (n.norm(dim=1, keepdim=True) + 1e-10)
    return torch.cat([n, F.elu(kappa) + 1.0 + 0.01], dim=1)


def _mlp(cin):
    return nn.Sequential(nn.Conv1d(cin, 128, 1), nn.ReLU(),
                         nn.Conv1d(128, 128, 1), nn.ReLU(),
                         nn.Conv1d(128, 128, 1), nn.ReLU(),
                         nn.Conv1d(128, 4, 1))


class _Decoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv2 = nn.Conv2d(2048, 2048, 1)
        self.up1 = _UpSampleBN(2048 + 176, 1024)
        self.up2 = _UpSampleBN(1024 + 64, 512)
        self.up3 = _UpSampleBN(512 + 40, 256)
        self.up4 = _UpSampleBN(256 + 24, 128)
        self.out_conv_res8 = nn.Conv2d(512, 4, 3, 1, 1)
        self.out_conv_res4 = _mlp(512 + 4)
        self.out_conv_res2 = _mlp(256 + 4)
        self.out_conv_res1 = _mlp(128 + 4)

    def forward(self, features):
        f0, f1, f2, f4, head = features
        x_d0 = self.conv2(head)
        x_d1 = self.up1(x_d0, f4)
        x_d2 = self.up2(x_d1, f2)
        x_d3 = self.up3(x_d2, f1)
        x_d4 = self.up4(x_d3, f0)
        out = _norm_normalize(self.out_conv_res8(x_d2))
        for feat, mlp in ((x_d2, self.out_conv_res4),
                          (x_d3, self.out_conv_res2),
                          (x_d4, self.out_conv_res1)):
            b, _, h, w = feat.shape
            fm = F.interpolate(feat, scale_factor=2, mode="bilinear",
                               align_corners=True)
            ip = F.interpolate(out, size=(2 * h, 2 * w), mode="bilinear",
                               align_corners=True)
            fm = torch.cat([fm, ip], dim=1)
            out = mlp(fm.view(b, fm.shape[1], -1)).view(b, 4, 2 * h, 2 * w)
            out = _norm_normalize(out)
        return [out]


class _NNET(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = _Encoder()
        self.decoder = _Decoder()

    def forward(self, x):
        return self.decoder(self.encoder(x))


def _randomize_bn(model, gen):
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5, generator=gen)
                m.running_var.uniform_(0.5, 2.0, generator=gen)
                m.weight.normal_(1.0, 0.2, generator=gen)
                m.bias.normal_(0, 0.2, generator=gen)


@pytest.fixture(scope="module")
def ref_model():
    torch.manual_seed(0)
    model = _NNET().eval()
    _randomize_bn(model, torch.Generator().manual_seed(1))
    return model


def test_normalbae_golden_parity(ref_model):
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params = normalbae_params_from_torch(sd)
    with pytest.raises(ValueError, match="unconsumed"):
        normalbae_params_from_torch(
            {**sd, "bogus.k": sd["decoder.conv2.bias"]})

    img = np.random.default_rng(0).uniform(-2, 2, (1, 64, 96, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        want = ref_model(torch.from_numpy(img.transpose(0, 3, 1, 2)))[-1]
    got = normalbae_forward(params, img)
    assert got.shape == (1, 64, 96, 4)
    np.testing.assert_allclose(np.asarray(got),
                               want.numpy().transpose(0, 2, 3, 1),
                               atol=5e-4)
    # unit-norm output normals
    norms = np.linalg.norm(np.asarray(got)[..., :3], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_normalbae_annotator_wiring(ref_model, tmp_path):
    from safetensors.numpy import save_file

    from goal_force_tpu.controlnets import Annotator

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    path = tmp_path / "scannet.safetensors"
    save_file(sd, str(path))
    ann = Annotator("normal", weights_path=str(path))
    img = np.random.default_rng(1).integers(0, 255, (50, 70, 3), np.uint8)
    out = ann(img)
    assert out.shape == (50, 70, 3) and out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_normalbae_init_runs():
    params = init_normalbae(jax.random.PRNGKey(0))
    img = np.random.default_rng(2).integers(0, 255, (40, 48, 3), np.uint8)
    out = normalbae_annotate(params, img)
    assert out.shape == (40, 48, 3) and out.dtype == np.uint8
