"""StepVideo VAE (version 2) golden parity vs the reference implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.stepvideo_vae import (
    StepVideoVAEConfig,
    stepvideo_decode_chunk,
    stepvideo_encode_chunk,
    stepvideo_vae_decode,
    stepvideo_vae_params_from_torch,
)

from conftest import reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")

if reference_available():
    import importlib
    import importlib.machinery
    import sys

    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refmodels", None, is_package=True))
    pkg.__path__ = ["/root/reference/diffsynth/models"]
    sys.modules.setdefault("refmodels", pkg)
    ref_sv = importlib.import_module("refmodels.stepvideo_vae")


CFG = StepVideoVAEConfig(enc_ch=32, enc_mult=(4, 8, 16, 16), dec_ch=32,
                         dec_mult=(1, 2, 4, 4), num_res_blocks=2, z_dim=16,
                         groups=32)


def _seed(m):
    import torch

    torch.manual_seed(0)
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.03


def test_stepvideo_encoder_golden_parity():
    import torch

    ref_sv.base_group_norm.spatial = True  # version-2 behavior (:924)
    enc = ref_sv.VideoEncoder(ch=CFG.enc_ch, z_channels=CFG.z_dim,
                              num_res_blocks=CFG.num_res_blocks,
                              version=2).eval().float()
    _seed(enc)
    vid = torch.randn(1, 3, 17, 32, 32)
    with torch.no_grad():
        ref_out = enc(vid, 17, True).numpy()     # (B, T, C, H, W)

    full = {"encoder." + k: v.numpy() for k, v in enc.state_dict().items()}
    from goal_force_tpu.models.stepvideo_vae import (_attn_from, _c2, _c3,
                                                     _nrm, _res_from)

    enc_params = {
        "conv_in": _c3(full, "encoder.conv_in.conv"),
        "down": [],
        "mid_block1": _res_from(full, "encoder.mid.block_1"),
        "mid_attn": _attn_from(full, "encoder.mid.attn_1"),
        "mid_block2": _res_from(full, "encoder.mid.block_2"),
        "norm_out": _nrm(full, "encoder.norm_out"),
        "conv_patchify": _c3(full, "encoder.conv_patchify.conv.conv"),
        "conv_out": _c3(full, "encoder.conv_out.conv"),
    }
    for i in range(4):
        lvl = {"blocks": [_res_from(full, f"encoder.down.{i}.block.{j}")
                          for j in range(CFG.num_res_blocks)]}
        if i != 3:
            if i in CFG.enc_down3d_levels:
                lvl["downsample"] = _c3(full, f"encoder.down.{i}.downsample.conv.conv")
            else:
                lvl["downsample"] = _c2(full, f"encoder.down.{i}.downsample.conv")
        enc_params["down"].append(lvl)

    ours = stepvideo_encode_chunk(
        enc_params, jnp.asarray(vid.numpy().transpose(0, 2, 3, 4, 1)), CFG)
    ours = np.asarray(ours).transpose(0, 1, 4, 2, 3)
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=5e-4, rtol=5e-3)


def test_stepvideo_decoder_golden_parity():
    import torch

    ref_sv.base_group_norm.spatial = True
    dec = ref_sv.VideoDecoder(ch=CFG.dec_ch, z_channels=CFG.z_dim,
                              out_channels=3, num_res_blocks=CFG.num_res_blocks,
                              version=2).eval().float()
    _seed(dec)
    lat = torch.randn(1, 3, CFG.z_dim, 4, 4)
    with torch.no_grad():
        ref_out = dec(lat, True).permute(0, 2, 1, 3, 4).numpy()  # b t c h w

    full = {"decoder." + k: v.numpy() for k, v in dec.state_dict().items()}
    from goal_force_tpu.models.stepvideo_vae import (_attn_from, _c2, _c3,
                                                     _nrm, _res_from)

    dec_up = []
    for i in range(4):
        lvl = {"blocks": [_res_from(full, f"decoder.up.{i}.block.{j}")
                          for j in range(CFG.num_res_blocks + 1)]}
        if i != 0:
            if i in CFG.dec_up3d_levels:
                pre = f"decoder.up.{i}.upsample.conv3d"
                lvl["upsample"] = {"conv3d": {
                    "conv1": _c3(full, pre + ".conv1.conv"),
                    "norm1": _nrm(full, pre + ".norm1"),
                    "conv2": _c3(full, pre + ".conv2.conv"),
                    "norm2": _nrm(full, pre + ".norm2")}}
            else:
                lvl["upsample"] = _c2(full, f"decoder.up.{i}.upsample.conv")
        dec_up.append(lvl)
    dec_params = {
        "conv_in": _c3(full, "decoder.conv_in.conv"),
        "conv_unpatchify": _c3(full, "decoder.conv_unpatchify.conv.conv"),
        "mid_block1": _res_from(full, "decoder.mid.block_1"),
        "mid_attn": _attn_from(full, "decoder.mid.attn_1"),
        "mid_block2": _res_from(full, "decoder.mid.block_2"),
        "up": dec_up,
        "norm_out": _nrm(full, "decoder.norm_out"),
        "conv_out": _c3(full, "decoder.conv_out.conv"),
    }

    ours = stepvideo_decode_chunk(
        dec_params, jnp.asarray(lat.numpy().transpose(0, 1, 3, 4, 2)), CFG)
    ours = np.asarray(ours).transpose(0, 1, 4, 2, 3)
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=5e-4, rtol=5e-3)


def test_stepvideo_mix_seam():
    import dataclasses

    # mix() parity on raw arrays (reference :1014-1023)
    import torch

    x = torch.randn(1, 34, 3, 4, 4)
    frame_len = 17
    front = slice(frame_len - 1, x.size(1) - 1, frame_len)
    back = slice(frame_len, x.size(1), frame_len)
    ref = x.clone()
    ref[:, front], ref[:, back] = (
        x[:, front] * 0.6 + x[:, back] * 0.4,
        x[:, back] * 0.6 + x[:, front] * 0.4,
    )

    xj = jnp.asarray(x.numpy())
    f = xj[:, frame_len - 1:-1:frame_len]
    b = xj[:, frame_len::frame_len]
    out = xj.at[:, frame_len - 1:-1:frame_len].set(f * 0.6 + b * 0.4)
    out = out.at[:, frame_len::frame_len].set(b * 0.6 + f * 0.4)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-6)
