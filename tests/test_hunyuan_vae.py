"""HunyuanVideo 3D causal VAE golden parity (direct + tiled) vs the reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.hunyuan_video_vae import (
    HunyuanVAEConfig,
    hunyuan_vae_decode,
    hunyuan_vae_decode_tiled,
    hunyuan_vae_decoder_params_from_torch,
    hunyuan_vae_encode,
    hunyuan_vae_encode_tiled,
    hunyuan_vae_encoder_params_from_torch,
    tiny_hunyuan_vae_config,
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
    ref_enc_mod = importlib.import_module("refmodels.hunyuan_video_vae_encoder")
    ref_dec_mod = importlib.import_module("refmodels.hunyuan_video_vae_decoder")


def _models(cfg):
    import torch

    torch.manual_seed(0)
    enc = ref_enc_mod.HunyuanVideoVAEEncoder(
        block_out_channels=list(cfg.block_out_channels),
        layers_per_block=cfg.layers_per_block, num_groups=cfg.num_groups).eval()
    dec = ref_dec_mod.HunyuanVideoVAEDecoder(
        block_out_channels=list(cfg.block_out_channels),
        layers_per_block=cfg.layers_per_block, num_groups=cfg.num_groups).eval()
    for m in (enc, dec):
        for p in m.parameters():
            p.data = torch.randn_like(p.data) * 0.1
    return enc, dec


def test_hunyuan_vae_roundtrip_parity():
    import torch

    cfg = tiny_hunyuan_vae_config()
    enc, dec = _models(cfg)
    rng = np.random.default_rng(0)
    video = rng.uniform(-1, 1, (1, 3, 5, 16, 16)).astype(np.float32)
    lat = rng.normal(size=(1, 16, 2, 2, 2)).astype(np.float32)

    with torch.no_grad():
        ref_lat = enc(torch.tensor(video)).numpy()
        ref_vid = dec(torch.tensor(lat)).numpy()

    p_enc = hunyuan_vae_encoder_params_from_torch(
        {k: v.numpy() for k, v in enc.state_dict().items()}, cfg)
    p_dec = hunyuan_vae_decoder_params_from_torch(
        {k: v.numpy() for k, v in dec.state_dict().items()}, cfg)

    got_lat = hunyuan_vae_encode(p_enc, jnp.asarray(video.transpose(0, 2, 3, 4, 1)),
                                 cfg)
    np.testing.assert_allclose(np.asarray(got_lat).transpose(0, 4, 1, 2, 3),
                               ref_lat, atol=2e-3, rtol=2e-3)

    got_vid = hunyuan_vae_decode(p_dec, jnp.asarray(lat.transpose(0, 2, 3, 4, 1)),
                                 cfg)
    np.testing.assert_allclose(np.asarray(got_vid).transpose(0, 4, 1, 2, 3),
                               ref_vid, atol=2e-3, rtol=2e-3)


def test_hunyuan_vae_tiled_matches_reference_tiling():
    import torch

    cfg = tiny_hunyuan_vae_config()
    enc, dec = _models(cfg)
    rng = np.random.default_rng(1)
    video = rng.uniform(-1, 1, (1, 3, 13, 32, 32)).astype(np.float32)

    with torch.no_grad():
        ref_lat = enc.tile_forward(torch.tensor(video), tile_size=(9, 16, 16),
                                   tile_stride=(4, 8, 8)).numpy()

    p_enc = hunyuan_vae_encoder_params_from_torch(
        {k: v.numpy() for k, v in enc.state_dict().items()}, cfg)
    got = hunyuan_vae_encode_tiled(
        p_enc, video.transpose(0, 2, 3, 4, 1), cfg,
        tile_size=(9, 16, 16), tile_stride=(4, 8, 8))
    np.testing.assert_allclose(got.transpose(0, 4, 1, 2, 3), ref_lat,
                               atol=2e-3, rtol=2e-3)


def test_hunyuan_vae_tiled_decode_matches_reference():
    import torch

    cfg = tiny_hunyuan_vae_config()
    _, dec = _models(cfg)
    rng = np.random.default_rng(2)
    lat = rng.normal(size=(1, 16, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = dec.tile_forward(torch.tensor(lat), tile_size=(2, 4, 4),
                               tile_stride=(1, 3, 3)).numpy()
    p_dec = hunyuan_vae_decoder_params_from_torch(
        {k: v.numpy() for k, v in dec.state_dict().items()}, cfg)
    got = hunyuan_vae_decode_tiled(p_dec, lat.transpose(0, 2, 3, 4, 1), cfg,
                                   tile_size=(2, 4, 4), tile_stride=(1, 3, 3))
    np.testing.assert_allclose(got.transpose(0, 4, 1, 2, 3), ref,
                               atol=2e-3, rtol=2e-3)
