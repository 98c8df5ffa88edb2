"""Step1X Qwen2Connector golden parity vs the reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.step1x_connector import (
    Step1xConnectorConfig,
    step1x_connector_forward,
    step1x_connector_params_from_torch,
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
    ref_cx = importlib.import_module("refmodels.step1x_connector")


def test_step1x_connector_golden_parity():
    import torch

    torch.manual_seed(0)
    m = ref_cx.Qwen2Connector(in_channels=24, hidden_size=32, heads_num=4,
                              depth=2, dtype=torch.float32).eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.05

    x = torch.randn(2, 7, 24)
    t = torch.tensor([3.0, 11.0])
    mask = torch.tensor([[1, 1, 1, 1, 1, 0, 0], [1, 1, 1, 0, 0, 0, 0]])
    with torch.no_grad():
        ref_tokens, ref_glob = m(x, t, mask)

    cfg = Step1xConnectorConfig(in_channels=24, hidden_size=32, heads_num=4,
                                depth=2)
    params = step1x_connector_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    tokens, glob = step1x_connector_forward(
        params, cfg, jnp.asarray(x.numpy()), jnp.asarray(t.numpy()),
        jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(glob), ref_glob.numpy(), atol=3e-5,
                               rtol=3e-4)
    np.testing.assert_allclose(np.asarray(tokens), ref_tokens.numpy(),
                               atol=3e-4, rtol=3e-3)
