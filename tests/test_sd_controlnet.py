"""SD ControlNet / SDXL ControlNet-Union / AnimateDiff motion golden parity,
assembled tiny from the reference's own block classes, plus UNet-integration
semantics (the dancer.py injection contract)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.sd_controlnet import (
    sd_controlnet_apply,
    sd_controlnet_params_from_torch,
    sdxl_controlnet_apply,
    sdxl_controlnet_params_from_torch,
)
from goal_force_tpu.models.sd_unet import sd_unet_apply, sd_unet_params_from_torch

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
    ref_sd = importlib.import_module("refmodels.sd_unet")
    ref_cn = importlib.import_module("refmodels.sd_controlnet")
    ref_motion = importlib.import_module("refmodels.sd_motion")

# tiny down+mid controlnet plan (structure of SD_CONTROLNET_PLAN)
TINY_CN_PLAN = (
    ("res", 8, 8), ("attn", 2, 4, 8, 24), ("push",),
    ("down", 8), ("push",),
    ("res", 8, 16), ("push",),
    ("res", 16, 16), ("attn", 2, 8, 16, 24), ("res", 16, 16), ("push",),
)
# matching full unet plan = controlnet plan + up path (stack: conv_in 8, pushes
# 8, 8, 16, 16 — popped in reverse)
TINY_UNET_PLAN = TINY_CN_PLAN + (
    ("pop",), ("res", 32, 16),
    ("pop",), ("res", 32, 16),
    ("pop",), ("res", 24, 8), ("up", 8),
    ("pop",), ("res", 16, 8), ("attn", 2, 4, 8, 24),
)


def _torch_blocks(plan, time_dim=16, groups=4):
    import torch

    blocks = []
    for spec in plan:
        kind = spec[0]
        if kind == "res":
            blocks.append(ref_sd.ResnetBlock(spec[1], spec[2], time_dim,
                                             groups=groups))
        elif kind == "attn":
            depth = spec[5] if len(spec) > 5 else 1
            blocks.append(ref_sd.AttentionBlock(
                spec[1], spec[2], spec[3], depth, spec[4],
                norm_num_groups=groups, eps=1e-6))
        elif kind == "push":
            blocks.append(ref_sd.PushBlock())
        elif kind == "pop":
            blocks.append(ref_sd.PopBlock())
        elif kind == "down":
            blocks.append(ref_sd.DownSampler(spec[1]))
        elif kind == "up":
            blocks.append(ref_sd.UpSampler(spec[1]))
    return torch.nn.ModuleList(blocks)


def _torch_tiny_controlnet(model_dim=8, time_dim=16, groups=4):
    import torch

    torch.manual_seed(0)
    m = ref_cn.SDControlNet.__new__(ref_cn.SDControlNet)
    torch.nn.Module.__init__(m)
    m.time_proj = ref_sd.Timesteps(model_dim)
    m.time_embedding = torch.nn.Sequential(
        torch.nn.Linear(model_dim, time_dim), torch.nn.SiLU(),
        torch.nn.Linear(time_dim, time_dim))
    m.conv_in = torch.nn.Conv2d(4, model_dim, 3, padding=1)
    m.controlnet_conv_in = ref_cn.ControlNetConditioningLayer(
        channels=(3, 4, 6, model_dim))
    m.blocks = _torch_blocks(TINY_CN_PLAN, time_dim, groups)
    # stack channels: conv_in(8) + pushes at 8, 8, 16, 16
    m.controlnet_blocks = torch.nn.ModuleList([
        torch.nn.Conv2d(c, c, 1) for c in (8, 8, 8, 16, 16)])
    m.global_pool = False
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.1
    return m.eval().float()


def _cn_inputs(groups=4):
    rng = np.random.default_rng(0)
    sample = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    t = np.array([500.0], np.float32)
    ctx = rng.normal(size=(2, 7, 24)).astype(np.float32)
    cond = rng.uniform(0, 1, (2, 3, 16, 16)).astype(np.float32)
    return sample, t, ctx, cond


def test_sd_controlnet_golden_parity():
    import torch

    m = _torch_tiny_controlnet()
    sample, t, ctx, cond = _cn_inputs()
    with torch.no_grad():
        ref = m(torch.tensor(sample), torch.tensor(t), torch.tensor(ctx),
                torch.tensor(cond))

    params = jax.tree_util.tree_map(jnp.asarray, sd_controlnet_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, TINY_CN_PLAN))
    got = sd_controlnet_apply(
        params, jnp.asarray(np.moveaxis(sample, 1, -1)), jnp.asarray(t),
        jnp.asarray(ctx), jnp.asarray(np.moveaxis(cond, 1, -1)),
        plan=TINY_CN_PLAN, groups=4)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.moveaxis(np.asarray(g), -1, 1), r.numpy(),
                                   rtol=2e-4, atol=2e-4)


def test_unet_consumes_controlnet_residuals():
    """dancer.py injection contract (:102-107): hidden += res[-1] at the end of
    down+mid, remaining stack entries += res[:-1]."""
    import torch

    from test_sd_unet import _torch_tiny, _torch_forward  # noqa: F401

    cn = _torch_tiny_controlnet()
    sample, t, ctx, cond = _cn_inputs()
    with torch.no_grad():
        res = cn(torch.tensor(sample), torch.tensor(t), torch.tensor(ctx),
                 torch.tensor(cond))

    unet = _torch_tiny(TINY_UNET_PLAN)
    # reference loop with injection at the first PopBlock (== after mid push)
    with torch.no_grad():
        temb = ref_sd.Timesteps(8)(torch.tensor(t)).to(torch.float32)
        temb = unet.time_embedding(temb)
        x = unet.conv_in(torch.tensor(sample))
        stack = [x]
        res_left = list(res)
        applied = False
        for spec, block in zip(TINY_UNET_PLAN, unet.blocks):
            if spec[0] == "pop" and not applied:
                x = x + res_left.pop()
                stack = [s + r for s, r in zip(stack, res_left)] \
                    + stack[len(res_left):]
                applied = True
            x, temb, _, stack = block(x, temb, torch.tensor(ctx), stack)
        x = unet.conv_norm_out(x)
        x = torch.nn.functional.silu(x)
        ref_out = unet.conv_out(x).numpy()

    params = jax.tree_util.tree_map(jnp.asarray, sd_unet_params_from_torch(
        {k: v.detach().numpy() for k, v in unet.state_dict().items()},
        TINY_UNET_PLAN))
    got = sd_unet_apply(
        params, TINY_UNET_PLAN, jnp.asarray(np.moveaxis(sample, 1, -1)),
        jnp.asarray(t), jnp.asarray(ctx), groups=4,
        controlnet_res=[jnp.asarray(np.moveaxis(r.numpy(), 1, -1)) for r in res])
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref_out,
                               rtol=2e-4, atol=2e-4)


TINY_XL_CN_PLAN = (
    ("res", 8, 8), ("push",),
    ("down", 8), ("push",),
    ("res", 8, 16), ("attn", 2, 8, 16, 24, 2), ("push",),
    ("res", 16, 16), ("attn", 2, 8, 16, 24, 2), ("res", 16, 16), ("push",),
)


def _torch_tiny_xl_controlnet(model_dim=8, time_dim=16, groups=4, add_text=12):
    import torch

    ref_xl_cn = importlib.import_module("refmodels.sdxl_controlnet")

    torch.manual_seed(0)
    m = ref_xl_cn.SDXLControlNetUnion.__new__(ref_xl_cn.SDXLControlNetUnion)
    torch.nn.Module.__init__(m)
    m.time_proj = ref_sd.Timesteps(model_dim)
    m.time_embedding = torch.nn.Sequential(
        torch.nn.Linear(model_dim, time_dim), torch.nn.SiLU(),
        torch.nn.Linear(time_dim, time_dim))
    m.add_time_proj = ref_sd.Timesteps(256)
    m.add_time_embedding = torch.nn.Sequential(
        torch.nn.Linear(add_text + 6 * 256, time_dim), torch.nn.SiLU(),
        torch.nn.Linear(time_dim, time_dim))
    m.control_type_proj = ref_sd.Timesteps(256)
    m.control_type_embedding = torch.nn.Sequential(
        torch.nn.Linear(256 * 8, time_dim), torch.nn.SiLU(),
        torch.nn.Linear(time_dim, time_dim))
    m.conv_in = torch.nn.Conv2d(4, model_dim, 3, padding=1)
    m.controlnet_conv_in = ref_xl_cn.ControlNetConditioningLayer(
        channels=(3, 4, 6, model_dim))
    m.controlnet_transformer = ref_xl_cn.ResidualAttentionBlock(model_dim, 2)
    m.task_embedding = torch.nn.Parameter(torch.randn(8, model_dim))
    m.spatial_ch_projs = torch.nn.Linear(model_dim, model_dim)
    m.blocks = _torch_blocks(TINY_XL_CN_PLAN, time_dim, groups)
    m.controlnet_blocks = torch.nn.ModuleList([
        torch.nn.Conv2d(c, c, 1) for c in (8, 8, 8, 16, 16)])
    m.global_pool = False
    m.task_id = {"canny": 3}
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.1
    return m.eval().float()


def test_sdxl_controlnet_union_golden_parity():
    import torch

    m = _torch_tiny_xl_controlnet()
    sample, t, ctx, cond = _cn_inputs()
    add_time_id = np.tile(
        np.asarray([512, 512, 0, 0, 512, 512], np.float32), 2)  # (B*6,)
    add_text = np.random.default_rng(1).normal(size=(2, 12)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.tensor(sample), torch.tensor(t), torch.tensor(ctx),
                torch.tensor(cond), "canny",
                torch.tensor(add_time_id), torch.tensor(add_text))

    params = jax.tree_util.tree_map(
        jnp.asarray, sdxl_controlnet_params_from_torch(
            {k: v.numpy() for k, v in m.state_dict().items()},
            TINY_XL_CN_PLAN))
    params["cn_transformer"]["n_head"] = 2
    got = sdxl_controlnet_apply(
        params, jnp.asarray(np.moveaxis(sample, 1, -1)), jnp.asarray(t),
        jnp.asarray(ctx), jnp.asarray(np.moveaxis(cond, 1, -1)),
        jnp.asarray(add_time_id), jnp.asarray(add_text),
        task_id=3, plan=TINY_XL_CN_PLAN, groups=4)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.moveaxis(np.asarray(g), -1, 1), r.numpy(),
                                   rtol=3e-4, atol=3e-4)


def test_motion_module_golden_parity():
    """AnimateDiff TemporalBlock vs reference (frames on the leading axis)."""
    import torch

    from goal_force_tpu.models.sd_motion import (
        motion_params_from_torch,
        temporal_block_apply,
    )

    torch.manual_seed(0)
    c, heads = 8, 2
    tb = ref_motion.TemporalBlock(heads, c // heads, c, norm_num_groups=4,
                                  eps=1e-6)
    for p in tb.parameters():
        p.data = torch.randn_like(p.data) * 0.1
    tb = tb.eval()
    wrapper = torch.nn.Module()
    wrapper.motion_modules = torch.nn.ModuleList([tb])

    rng = np.random.default_rng(0)
    f, h, w = 4, 6, 6
    x = rng.normal(size=(f, c, h, w)).astype(np.float32)
    with torch.no_grad():
        ref, _, _, _ = tb(torch.tensor(x), None, None, None, batch_size=1)

    params = motion_params_from_torch(
        {k: v.numpy() for k, v in wrapper.state_dict().items()}, call_map={})
    got = temporal_block_apply(
        jax.tree_util.tree_map(jnp.asarray, params["modules"][0]),
        jnp.asarray(np.moveaxis(x, 1, -1)), groups=4, video_batch=1,
        num_heads=heads)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref.numpy(),
                               rtol=2e-4, atol=2e-4)
