"""SDXL UNet parity: tiny full-graph (incl. depth-2 transformer and the
add-embedding path) vs reference blocks, plus exact state-dict coverage of the
real 2.6B SDXLUNet."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.sdxl_unet import (
    SDXL_PLAN,
    init_sdxl_unet,
    sdxl_unet_apply,
    sdxl_unet_params_from_torch,
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
    ref_sdxl = importlib.import_module("refmodels.sdxl_unet")

TINY_PLAN = (
    ("res", 8, 8), ("push",),
    ("down", 8), ("push",),
    ("res", 8, 16), ("attn", 2, 8, 16, 24, 2),
    ("res", 16, 16),
    ("pop",), ("res", 24, 16), ("attn", 2, 8, 16, 24, 2), ("up", 16),
    ("pop",), ("res", 24, 8),
)


def test_tiny_sdxl_graph_with_add_embedding_matches_reference():
    import torch

    time_dim, model_dim, pooled = 16, 8, 8
    torch.manual_seed(0)
    blocks = []
    for spec in TINY_PLAN:
        kind = spec[0]
        if kind == "res":
            blocks.append(ref_sdxl.ResnetBlock(spec[1], spec[2], time_dim,
                                               groups=4))
        elif kind == "attn":
            blocks.append(ref_sdxl.AttentionBlock(
                spec[1], spec[2], spec[3], spec[5], spec[4],
                norm_num_groups=4, eps=1e-6))
        elif kind == "push":
            blocks.append(ref_sdxl.PushBlock())
        elif kind == "pop":
            blocks.append(ref_sdxl.PopBlock())
        elif kind == "down":
            blocks.append(ref_sdxl.DownSampler(spec[1]))
        elif kind == "up":
            blocks.append(ref_sdxl.UpSampler(spec[1]))
    model = torch.nn.Module()
    model.time_embedding = torch.nn.Sequential(
        torch.nn.Linear(model_dim, time_dim), torch.nn.SiLU(),
        torch.nn.Linear(time_dim, time_dim))
    model.add_time_embedding = torch.nn.Sequential(
        torch.nn.Linear(pooled + 6 * 256, time_dim), torch.nn.SiLU(),
        torch.nn.Linear(time_dim, time_dim))
    model.conv_in = torch.nn.Conv2d(4, model_dim, 3, padding=1)
    model.blocks = torch.nn.ModuleList(blocks)
    model.conv_norm_out = torch.nn.GroupNorm(4, model_dim, eps=1e-5)
    model.conv_out = torch.nn.Conv2d(model_dim, 4, 3, padding=1)
    model = model.eval().float()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, sdxl_unet_params_from_torch(sd, TINY_PLAN))

    rng = np.random.default_rng(0)
    sample = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    t = np.array([42.0, 900.0], np.float32)
    ctx = rng.normal(size=(2, 7, 24)).astype(np.float32)
    add_ids = np.array([1024, 1024, 0, 0, 1024, 1024] * 2, np.float32)
    add_text = rng.normal(size=(2, pooled)).astype(np.float32)

    with torch.no_grad():
        # the reference SDXLUNet.forward conditioning math (sdxl_unet.py:263-279)
        temb = ref_sdxl.Timesteps(model_dim)(torch.from_numpy(t))
        temb = model.time_embedding(temb)
        ids = ref_sdxl.Timesteps(256)(torch.from_numpy(add_ids)).reshape(2, -1)
        add = torch.cat([torch.from_numpy(add_text), ids], dim=-1)
        temb = temb + model.add_time_embedding(add)
        h = model.conv_in(torch.from_numpy(sample))
        stack = [h]
        for block in model.blocks:
            h, temb, _, stack = block(h, temb, torch.from_numpy(ctx), stack)
        h = model.conv_norm_out(h)
        ref = model.conv_out(torch.nn.functional.silu(h)).numpy()

    got = sdxl_unet_apply(params, TINY_PLAN,
                          jnp.asarray(np.moveaxis(sample, 1, -1)),
                          jnp.asarray(t), jnp.asarray(ctx),
                          jnp.asarray(add_ids), jnp.asarray(add_text),
                          groups=4)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref,
                               rtol=3e-4, atol=3e-4)


def test_sdxl_converter_consumes_reference_state_dict():
    import torch

    with torch.device("meta"):
        ref = ref_sdxl.SDXLUNet()
    shapes = {k: tuple(v.shape) for k, v in ref.state_dict().items()}
    sd = {k: np.zeros(s, np.float16) for k, s in shapes.items()}
    params = sdxl_unet_params_from_torch(sd, SDXL_PLAN)
    assert len(params["blocks"]) == len(SDXL_PLAN)
    n_params = sum(int(np.prod(s)) for s in shapes.values())
    assert abs(n_params - 2.567e9) < 5e7, n_params
    consumed = set()

    class Tracker(dict):
        def __getitem__(self, k):
            consumed.add(k)
            return super().__getitem__(k)

    sdxl_unet_params_from_torch(Tracker(sd), SDXL_PLAN)
    missed = set(shapes) - consumed
    assert not missed, sorted(missed)[:10]
    assert params["add_time_w1"].shape == (2816, 1280)


def test_init_and_apply_tiny():
    params = init_sdxl_unet(jax.random.PRNGKey(0), TINY_PLAN, model_dim=8,
                            time_dim=16, add_embed_in=8 + 6 * 256)
    out = sdxl_unet_apply(params, TINY_PLAN, jnp.zeros((1, 16, 16, 4)),
                          jnp.zeros((1,)), jnp.zeros((1, 7, 24)),
                          jnp.zeros((6,)), jnp.zeros((1, 8)), groups=4)
    assert out.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()
