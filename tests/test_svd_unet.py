"""SVD spatio-temporal UNet golden parity: tiny structure-complete plan assembled
from the reference's own block classes, run through the reference SVDUNet.forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.svd_unet import (
    SVD_PLAN,
    svd_unet_apply,
    svd_unet_params_from_torch,
    tiny_svd_plan,
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
    ref_svd = importlib.import_module("refmodels.svd_unet")
    ref_sd = importlib.import_module("refmodels.sd_unet")


def _torch_tiny_svd(plan, model_dim=8, time_dim=16, groups=4):
    import torch

    torch.manual_seed(0)
    blocks = []
    for spec in plan:
        kind = spec[0]
        if kind == "res":
            blocks.append(ref_sd.ResnetBlock(spec[1], spec[2], time_dim,
                                             groups=groups, eps=spec[3]))
        elif kind == "tres":
            blocks.append(ref_svd.TemporalResnetBlock(spec[1], spec[2], time_dim,
                                                      groups=groups, eps=spec[3]))
        elif kind == "attn_np":
            blocks.append(ref_sd.AttentionBlock(
                spec[1], spec[2], spec[3], 1, spec[4], norm_num_groups=groups,
                eps=1e-6, need_proj_out=False))
        elif kind == "tattn":
            blocks.append(ref_svd.TemporalAttentionBlock(
                spec[1], spec[2], spec[3], spec[4], None))
        elif kind == "popmix":
            blocks.append(ref_svd.PopMixBlock(spec[1] if len(spec) > 1 else None))
        elif kind == "push":
            blocks.append(ref_sd.PushBlock())
        elif kind == "pop":
            blocks.append(ref_sd.PopBlock())
        elif kind == "down":
            blocks.append(ref_sd.DownSampler(spec[1]))
        elif kind == "up":
            blocks.append(ref_sd.UpSampler(spec[1]))

    m = ref_svd.SVDUNet.__new__(ref_svd.SVDUNet)
    torch.nn.Module.__init__(m)
    m.time_proj = ref_sd.Timesteps(model_dim)
    m.time_embedding = torch.nn.Sequential(
        torch.nn.Linear(model_dim, time_dim), torch.nn.SiLU(),
        torch.nn.Linear(time_dim, time_dim))
    m.add_time_proj = ref_sd.Timesteps(256)
    m.add_time_embedding = torch.nn.Sequential(
        torch.nn.Linear(768, time_dim), torch.nn.SiLU(),
        torch.nn.Linear(time_dim, time_dim))
    m.conv_in = torch.nn.Conv2d(8, model_dim, 3, padding=1)
    m.blocks = torch.nn.ModuleList(blocks)
    m.conv_norm_out = torch.nn.GroupNorm(groups, model_dim, eps=1e-5)
    m.conv_act = torch.nn.SiLU()
    m.conv_out = torch.nn.Conv2d(model_dim, 4, 3, padding=1)
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.1
    return m.eval().float()


def test_svd_unet_golden_parity():
    import torch

    plan = tiny_svd_plan()
    m = _torch_tiny_svd(plan)

    rng = np.random.default_rng(0)
    t_frames = 4
    sample = rng.normal(size=(t_frames, 8, 8, 8)).astype(np.float32)  # (T,C,H,W)
    text = rng.normal(size=(1, 16)).astype(np.float32)
    add_time_id = torch.tensor([6.0, 127.0, 0.02])

    with torch.no_grad():
        ref = m(torch.tensor(sample), 500.0, torch.tensor(text),
                add_time_id).numpy()

    params = jax.tree_util.tree_map(jnp.asarray, svd_unet_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, plan))
    got = svd_unet_apply(
        params, plan, jnp.asarray(np.moveaxis(sample, 1, -1)),
        jnp.asarray(500.0), jnp.asarray(text),
        jnp.asarray([6.0, 127.0, 0.02]), groups=4)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref,
                               rtol=3e-4, atol=3e-4)


def test_svd_full_plan_converter_consumes_reference_state_dict():
    """Structural check: the converter reads every key class of the REAL SVDUNet
    (too big to run on CPU; shapes only via meta-style zero dict)."""
    import torch

    m = ref_svd.SVDUNet()
    sd = {k: v for k, v in m.state_dict().items()}
    params = svd_unet_params_from_torch(sd, SVD_PLAN)
    assert len(params["blocks"]) == len(SVD_PLAN)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    assert n_leaves == len(sd), (n_leaves, len(sd))
