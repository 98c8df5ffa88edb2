"""Qwen-Image VAE golden parity vs the reference torch implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from goal_force_tpu.models.qwen_image_vae import (
    qwen_image_vae_decode,
    qwen_image_vae_encode,
    qwen_image_vae_params_from_torch,
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
    ref_vae = importlib.import_module("refmodels.qwen_image_vae")


def test_qwen_image_vae_golden_parity():
    import torch

    torch.manual_seed(0)
    m = ref_vae.QwenImageVAE().eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.03

    img = torch.rand(1, 3, 64, 64) * 2 - 1
    with torch.no_grad():
        ref_lat = m.encode(img).numpy()
        ref_img = m.decode(torch.tensor(ref_lat)).numpy()

    params = qwen_image_vae_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()})
    lat = qwen_image_vae_encode(params,
                                jnp.asarray(img.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(lat).transpose(0, 3, 1, 2), ref_lat,
                               atol=3e-4, rtol=3e-3)
    out = qwen_image_vae_decode(params, lat)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref_img,
                               atol=3e-4, rtol=3e-3)
