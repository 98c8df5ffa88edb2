"""IP-Adapter golden parity (SD module outputs) + tiny-UNet wiring checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.ipadapter import (
    attn_unit_schedule,
    init_ip_adapter,
    ip_adapter_apply,
    ip_adapter_params_from_torch,
    ip_plan_assignments,
    ipadapter_kwargs_for_plan,
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


def test_sd_schedule_matches_reference_shapes():
    from goal_force_tpu.models.sd_unet import SD15_PLAN

    sched = attn_unit_schedule(SD15_PLAN)
    dims = [SD15_PLAN[pi][3] for pi, _ in sched]
    # reference sd_ipadapter.py:21 shape_list ordering (downs, ups, mid)
    assert dims == [320] * 2 + [640] * 2 + [1280] * 5 + [640] * 3 + [320] * 3 \
        + [1280] * 1


def test_sdxl_schedule_matches_reference_shapes():
    from goal_force_tpu.models.sdxl_unet import SDXL_PLAN

    sched = attn_unit_schedule(SDXL_PLAN)
    dims = [SDXL_PLAN[pi][3] for pi, _ in sched]
    # reference sdxl_ipadapter.py:46 shape_list (downs, ups, mid=10 units)
    assert dims == [640] * 4 + [1280] * 50 + [640] * 6 + [1280] * 10
    assert len(sched) == 70


def test_sd_ipadapter_golden_parity():
    import torch

    ref = importlib.import_module("refmodels.sd_ipadapter")
    torch.manual_seed(0)
    m = ref.SDIpAdapter().eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.05
    emb = torch.randn(1, 1024)
    with torch.no_grad():
        kv_dict = m(emb, scale=0.7)

    params = ip_adapter_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()})
    kvs = ip_adapter_apply(params, jnp.asarray(emb.numpy()), scale=0.7)
    assert len(kvs) == 16
    # reference block_ids (sd_ipadapter.py:27) index the same modules our
    # schedule orders as downs, ups, mid
    block_ids = [1, 4, 9, 12, 17, 20, 40, 43, 46, 50, 53, 56, 60, 63, 66, 29]
    for j, bid in enumerate(block_ids):
        ref_kv = kv_dict[bid][0]
        np.testing.assert_allclose(np.asarray(kvs[j]["k"]),
                                   ref_kv["ip_k"].numpy(), atol=2e-5, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(kvs[j]["v"]),
                                   ref_kv["ip_v"].numpy(), atol=2e-5, rtol=2e-3)
        assert kvs[j]["scale"] == 0.7


def test_tiny_unet_consumes_ipadapter():
    from goal_force_tpu.models.sd_unet import (init_sd_unet, sd_unet_apply,
                                               tiny_sd_plan)

    plan = tiny_sd_plan(ctx_dim=24)
    key = jax.random.PRNGKey(0)
    unet = init_sd_unet(key, plan, model_dim=8, time_dim=16)
    adapter = init_ip_adapter(jax.random.PRNGKey(1), plan, ctx_dim=24,
                              clip_dim=12, tokens=4)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    t = jnp.asarray([3.0])
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 24))
    emb = jax.random.normal(jax.random.PRNGKey(4), (1, 12))

    base = sd_unet_apply(unet, plan, x, t, ctx, groups=4)
    ipk0 = ipadapter_kwargs_for_plan(plan, adapter, emb, scale=0.0)
    ipk1 = ipadapter_kwargs_for_plan(plan, adapter, emb, scale=1.0)
    out0 = sd_unet_apply(unet, plan, x, t, ctx, groups=4, ipadapter=ipk0)
    out1 = sd_unet_apply(unet, plan, x, t, ctx, groups=4, ipadapter=ipk1)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(base), atol=1e-6)
    assert np.abs(np.asarray(out1) - np.asarray(base)).max() > 1e-4

    # subset selection maps only the chosen modules
    sched = attn_unit_schedule(plan)
    assign = ip_plan_assignments(plan, module_ids=[0])
    assert list(assign.keys()) == [sched[0][0]]


def test_sdxl_ipadapter_golden_parity():
    import torch

    ref = importlib.import_module("refmodels.sdxl_ipadapter")
    torch.manual_seed(0)
    m = ref.SDXLIpAdapter().eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.02
    emb = torch.randn(1, 1280)
    with torch.no_grad():
        kv_dict = m(emb, scale=0.55)

    params = ip_adapter_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()})
    kvs = ip_adapter_apply(params, jnp.asarray(emb.numpy()), scale=0.55)
    assert len(kvs) == 70

    # reference map_list ordering == our attn_unit_schedule ordering: compare
    # every (block, transformer) entry
    from goal_force_tpu.models.sdxl_unet import SDXL_PLAN

    sched = attn_unit_schedule(SDXL_PLAN)
    ref_entries = sorted(kv_dict.keys())
    j = 0
    for (block_id, t_id), ipadapter_id in m.call_block_id.items():
        ref_kv = kv_dict[block_id][t_id]
        np.testing.assert_allclose(np.asarray(kvs[ipadapter_id]["k"]),
                                   ref_kv["ip_k"].numpy(), atol=2e-5,
                                   rtol=2e-3)
        np.testing.assert_allclose(np.asarray(kvs[ipadapter_id]["v"]),
                                   ref_kv["ip_v"].numpy(), atol=2e-5,
                                   rtol=2e-3)
        j += 1
    assert j == 70
