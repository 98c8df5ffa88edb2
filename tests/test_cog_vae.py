"""CogVideoX VAE golden parity: full-sequence causal formulation vs the
reference's chunked CachedConv3d evaluation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.cog_vae import (
    CogVAEConfig,
    cog_vae_decode,
    cog_vae_decoder_params_from_torch,
    cog_vae_encode,
    cog_vae_encoder_params_from_torch,
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
    ref_vae = importlib.import_module("refmodels.cog_vae")


def _seed_params(m):
    import torch

    torch.manual_seed(0)
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.03


@pytest.mark.parametrize("t_latent", [2, 3])
def test_cog_decoder_golden_parity(t_latent):
    import torch

    m = ref_vae.CogVAEDecoder().eval().float()
    _seed_params(m)
    lat = torch.randn(1, 16, t_latent, 4, 4) * 0.7
    with torch.no_grad():
        ref_out = m.decode_small_video(lat).numpy()

    params = cog_vae_decoder_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()})
    ours = cog_vae_decode(params,
                          jnp.asarray(lat.numpy().transpose(0, 2, 3, 4, 1)))
    ours = np.asarray(ours).transpose(0, 4, 1, 2, 3)
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("t_in", [8, 9])
def test_cog_encoder_golden_parity(t_in):
    import torch

    m = ref_vae.CogVAEEncoder().eval().float()
    _seed_params(m)
    vid = torch.randn(1, 3, t_in, 32, 32)
    with torch.no_grad():
        ref_out = m.encode_small_video(vid).numpy()

    params = cog_vae_encoder_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()})
    ours = cog_vae_encode(params,
                          jnp.asarray(vid.numpy().transpose(0, 2, 3, 4, 1)))
    ours = np.asarray(ours).transpose(0, 4, 1, 2, 3)
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=2e-3)
