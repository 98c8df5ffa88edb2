"""SD UNet golden parity vs the reference torch implementation.

Full-graph parity on a structure-complete tiny plan (reference block classes
assembled per the same plan, run through the reference's push/pop forward
loop), plus a structural check that the converter consumes the real SD-1.5
SDUNet state dict exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.sd_unet import (
    SD15_PLAN,
    init_sd_unet,
    sd_unet_apply,
    sd_unet_params_from_torch,
    timestep_embedding,
    tiny_sd_plan,
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
    ref_sd = importlib.import_module("refmodels.sd_unet")


def _torch_tiny(plan, time_dim=16, model_dim=8, groups=4):
    """Assemble reference block classes per the plan with SDUNet's naming."""
    import torch

    torch.manual_seed(0)
    blocks = []
    for spec in plan:
        kind = spec[0]
        if kind == "res":
            blocks.append(ref_sd.ResnetBlock(spec[1], spec[2], time_dim,
                                             groups=groups))
        elif kind == "attn":
            blocks.append(ref_sd.AttentionBlock(
                spec[1], spec[2], spec[3], 1, spec[4],
                norm_num_groups=groups, eps=1e-6))
        elif kind == "push":
            blocks.append(ref_sd.PushBlock())
        elif kind == "pop":
            blocks.append(ref_sd.PopBlock())
        elif kind == "down":
            blocks.append(ref_sd.DownSampler(spec[1]))
        elif kind == "up":
            blocks.append(ref_sd.UpSampler(spec[1]))

    model = torch.nn.Module()
    model.time_embedding = torch.nn.Sequential(
        torch.nn.Linear(model_dim, time_dim), torch.nn.SiLU(),
        torch.nn.Linear(time_dim, time_dim))
    model.conv_in = torch.nn.Conv2d(4, model_dim, 3, padding=1)
    model.blocks = torch.nn.ModuleList(blocks)
    model.conv_norm_out = torch.nn.GroupNorm(groups, model_dim, eps=1e-5)
    model.conv_out = torch.nn.Conv2d(model_dim, 4, 3, padding=1)
    return model.eval().float()


def _torch_forward(model, plan, sample, timestep, text_emb, model_dim=8):
    """The reference SDUNet.forward loop (sd_unet.py:325-345) over our plan."""
    import torch

    with torch.no_grad():
        temb = ref_sd.Timesteps(model_dim)(timestep).to(sample.dtype)
        temb = model.time_embedding(temb)
        h = model.conv_in(sample)
        stack = [h]
        for block in model.blocks:
            h, temb, text_emb, stack = block(h, temb, text_emb, stack)
        h = model.conv_norm_out(h)
        h = torch.nn.functional.silu(h)
        return model.conv_out(h)


def test_timestep_embedding_matches():
    import torch

    t = np.array([0.0, 1.0, 500.0, 999.0], np.float32)
    ref = ref_sd.Timesteps(320)(torch.from_numpy(t)).numpy()
    got = timestep_embedding(jnp.asarray(t), 320)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_tiny_full_graph_matches_reference():
    import torch

    plan = tiny_sd_plan(ctx_dim=24)
    model = _torch_tiny(plan)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, sd_unet_params_from_torch(sd, plan))

    rng = np.random.default_rng(0)
    sample = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    t = np.array([42.0, 900.0], np.float32)
    ctx = rng.normal(size=(2, 7, 24)).astype(np.float32)

    ref = _torch_forward(model, plan, torch.from_numpy(sample),
                         torch.from_numpy(t), torch.from_numpy(ctx)).numpy()
    got = sd_unet_apply(params, plan, jnp.asarray(np.moveaxis(sample, 1, -1)),
                        jnp.asarray(t), jnp.asarray(ctx), groups=4)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref,
                               rtol=2e-4, atol=2e-4)


def test_sd15_converter_consumes_reference_state_dict():
    """The converter must consume the REAL SDUNet's state dict exactly:
    every key read, correct shapes, ~859M params."""
    import torch

    with torch.device("meta"):
        ref = ref_sd.SDUNet()
    shapes = {k: tuple(v.shape) for k, v in ref.state_dict().items()}
    sd = {k: np.zeros(s, np.float16) for k, s in shapes.items()}
    params = sd_unet_params_from_torch(sd, SD15_PLAN)
    assert len(params["blocks"]) == len(SD15_PLAN) == 67
    n_params = sum(int(np.prod(s)) for s in shapes.values())
    assert abs(n_params - 859.5e6) < 5e6, n_params
    # spot-check converted shapes (NHWC conv / transposed linear)
    assert params["conv_in"]["w"].shape == (3, 3, 4, 320)
    assert params["time_w1"].shape == (320, 1280)
    assert params["blocks"][1]["proj_in_w"].shape == (320, 320)
    # every tensor in the file is consumed by the converter
    consumed = set()

    class Tracker(dict):
        def __init__(self, base):
            super().__init__(base)

        def __getitem__(self, k):
            consumed.add(k)
            return super().__getitem__(k)

        def __contains__(self, k):
            return super().__contains__(k)

    sd_unet_params_from_torch(Tracker(sd), SD15_PLAN)
    missed = set(shapes) - consumed
    assert not missed, sorted(missed)[:10]


def test_init_and_apply_shapes():
    plan = tiny_sd_plan()
    params = init_sd_unet(jax.random.PRNGKey(0), plan, model_dim=8,
                          time_dim=16)
    out = sd_unet_apply(params, plan, jnp.zeros((1, 16, 16, 4)),
                        jnp.zeros((1,)), jnp.zeros((1, 7, 24)), groups=4)
    assert out.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_civitai_converter_matches_reference_table():
    """The ALGORITHMIC civitai converter must agree with the reference's
    literal ~700-entry rename table: rename a full random SDUNet state dict
    into civitai naming via the INVERTED reference table, convert through
    sd_unet_params_from_civitai, and compare with the diffsynth-format
    converter output tensor-for-tensor."""
    import torch

    from goal_force_tpu.models.sd_unet import sd_unet_params_from_civitai

    with torch.device("meta"):
        ref = ref_sd.SDUNet()
    shapes = {k: tuple(v.shape) for k, v in ref.state_dict().items()}
    rng = np.random.default_rng(0)
    ours_sd = {k: rng.normal(size=s).astype(np.float16) for k, s in shapes.items()}

    # invert: reference table maps civitai -> diffsynth names
    probe = {}
    import inspect
    src = inspect.getsource(ref_sd.SDUNetStateDictConverter.from_civitai)
    # build the civitai-named dict through the reference converter itself:
    # feed identity-tagged tensors and observe where they land
    civ_names = [line.split('"')[1] for line in src.splitlines()
                 if line.strip().startswith('"model.diffusion_model.')]
    tagged = {name: torch.full((1,), i, dtype=torch.float32)
              for i, name in enumerate(civ_names)}
    renamed = ref_sd.SDUNetStateDictConverter().from_civitai(tagged)
    inv = {}
    for ours_name, tag in renamed.items():
        inv[ours_name] = civ_names[int(tag.flatten()[0])]
    assert set(inv) == set(shapes), "reference table does not cover SDUNet"

    civitai_sd = {inv[k]: v for k, v in ours_sd.items()}
    # proj_in/proj_out are 1x1 convs in civitai checkpoints
    for k in list(civitai_sd):
        if (".proj_in.weight" in k or ".proj_out.weight" in k) \
                and civitai_sd[k].ndim == 2:
            civitai_sd[k] = civitai_sd[k][:, :, None, None]

    a = sd_unet_params_from_torch(ours_sd, SD15_PLAN)
    b = sd_unet_params_from_civitai(civitai_sd, SD15_PLAN)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a, b)
