"""Wan DiT parity vs the reference torch implementation on a tiny config (f32, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu import configs
from goal_force_tpu.io.torch_convert import dit_params_from_torch
from goal_force_tpu.models import wan_dit
from goal_force_tpu.ops.rope import apply_rope, assemble_rope, rope_tables_3d

from conftest import reference_available

if reference_available():
    import importlib
    import sys

    import importlib.machinery

    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refmodels", None, is_package=True)
    )
    pkg.__path__ = ["/root/reference/diffsynth/models"]
    sys.modules.setdefault("refmodels", pkg)
    ref_dit = importlib.import_module("refmodels.wan_video_dit")
else:  # pragma: no cover
    ref_dit = None

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")


def _torch_model(cfg):
    import torch

    torch.manual_seed(0)
    model = ref_dit.WanModel(
        dim=cfg.dim, in_dim=cfg.in_dim, ffn_dim=cfg.ffn_dim, out_dim=cfg.out_dim,
        text_dim=cfg.text_dim, freq_dim=cfg.freq_dim, eps=cfg.eps,
        patch_size=cfg.patch_size, num_heads=cfg.num_heads, num_layers=cfg.num_layers,
        has_image_input=False,
    ).eval().float()
    return model


def _to_numpy_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def tiny():
    cfg = configs.tiny_dit(num_layers=2)
    model = _torch_model(cfg)
    params = dit_params_from_torch(_to_numpy_sd(model), cfg)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)
    return cfg, model, params


def test_rope_matches_reference(tiny):
    import torch

    cfg, model, params = tiny
    f, h, w = 3, 4, 6
    s = f * h * w
    x = np.random.default_rng(0).normal(size=(1, s, cfg.dim)).astype(np.float32)

    freqs = torch.cat([
        model.freqs[0][:f].view(f, 1, 1, -1).expand(f, h, w, -1),
        model.freqs[1][:h].view(1, h, 1, -1).expand(f, h, w, -1),
        model.freqs[2][:w].view(1, 1, w, -1).expand(f, h, w, -1),
    ], dim=-1).reshape(s, 1, -1)
    ref = ref_dit.rope_apply(torch.from_numpy(x), freqs, cfg.num_heads).numpy()

    tables = rope_tables_3d(cfg.head_dim, cfg.rope_max_len)
    cos, sin = assemble_rope(tables, f, h, w)
    got = apply_rope(jnp.asarray(x).reshape(1, s, cfg.num_heads, -1), cos, sin)
    np.testing.assert_allclose(
        np.asarray(got).reshape(1, s, -1), ref, rtol=2e-5, atol=2e-5
    )


def test_block_matches_reference(tiny):
    import torch

    cfg, model, params = tiny
    rng = np.random.default_rng(1)
    f, h, w = 3, 4, 6
    s = f * h * w
    x = rng.normal(size=(1, s, cfg.dim)).astype(np.float32)
    ctx = rng.normal(size=(1, 8, cfg.dim)).astype(np.float32)
    t_mod = rng.normal(size=(1, 6, cfg.dim)).astype(np.float32)

    freqs = torch.cat([
        model.freqs[0][:f].view(f, 1, 1, -1).expand(f, h, w, -1),
        model.freqs[1][:h].view(1, h, 1, -1).expand(f, h, w, -1),
        model.freqs[2][:w].view(1, 1, w, -1).expand(f, h, w, -1),
    ], dim=-1).reshape(s, 1, -1)
    with torch.no_grad():
        ref = model.blocks[0](
            torch.from_numpy(x), torch.from_numpy(ctx), torch.from_numpy(t_mod), freqs
        ).numpy()

    tables = rope_tables_3d(cfg.head_dim, cfg.rope_max_len)
    cos, sin = assemble_rope(tables, f, h, w)
    block0 = jax.tree_util.tree_map(lambda a: a[0], params["blocks"])
    got = wan_dit.dit_block(
        block0, jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(t_mod), cos, sin, cfg,
        attn_impl="xla",
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_full_forward_matches_reference(tiny):
    import torch

    cfg, model, params = tiny
    rng = np.random.default_rng(2)
    b, f, hh, ww = 1, 5, 8, 12
    x = rng.normal(size=(b, 16, f, hh, ww)).astype(np.float32)
    y = rng.normal(size=(b, 20, f, hh, ww)).astype(np.float32)
    ctx = rng.normal(size=(b, 8, cfg.text_dim)).astype(np.float32)
    t = np.array([600.0], dtype=np.float32)

    with torch.no_grad():
        xin = torch.cat([torch.from_numpy(x), torch.from_numpy(y)], dim=1)
        ref = model(xin, torch.from_numpy(t), torch.from_numpy(ctx)).numpy()

    got = wan_dit.wan_dit_forward(
        params, cfg,
        jnp.asarray(np.moveaxis(x, 1, -1)),  # channels-last
        jnp.asarray(t), jnp.asarray(ctx),
        y=jnp.asarray(np.moveaxis(y, 1, -1)),
        attn_impl="xla",
    )
    got_cf = np.moveaxis(np.asarray(got), -1, 1)
    np.testing.assert_allclose(got_cf, ref, rtol=5e-4, atol=5e-4)


def test_patchify_roundtrip():
    cfg = configs.tiny_dit()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 4, 6, 8, cfg.in_dim), jnp.float32)
    params = wan_dit.init_wan_dit(key, cfg, jnp.float32)
    tokens, grid = wan_dit.patchify(params["patch_embedding"], x, cfg.patch_size)
    assert tokens.shape == (2, 4 * 3 * 4, cfg.dim)
    assert grid == (4, 3, 4)
    out = wan_dit.unpatchify(
        jnp.zeros((2, 4 * 3 * 4, cfg.out_dim * 4)), grid, cfg.patch_size, cfg.out_dim
    )
    assert out.shape == (2, 4, 6, 8, cfg.out_dim)


def test_image_input_forward_matches_reference():
    """Wan2.1-I2V style: clip_feature tokens through img_emb + separate image K/V."""
    import torch

    cfg = configs.tiny_dit(num_layers=2)
    cfg = configs.WanDiTConfig(**{**cfg.__dict__, "has_image_input": True, "in_dim": 36})
    torch.manual_seed(3)
    model = ref_dit.WanModel(
        dim=cfg.dim, in_dim=cfg.in_dim, ffn_dim=cfg.ffn_dim, out_dim=cfg.out_dim,
        text_dim=cfg.text_dim, freq_dim=cfg.freq_dim, eps=cfg.eps,
        patch_size=cfg.patch_size, num_heads=cfg.num_heads, num_layers=cfg.num_layers,
        has_image_input=True,
    ).eval().float()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32),
                                    dit_params_from_torch(sd, cfg))

    rng = np.random.default_rng(4)
    b, f, hh, ww = 1, 3, 8, 12
    x = rng.normal(size=(b, 16, f, hh, ww)).astype(np.float32)
    y = rng.normal(size=(b, 20, f, hh, ww)).astype(np.float32)
    ctx = rng.normal(size=(b, 8, cfg.text_dim)).astype(np.float32)
    clip = rng.normal(size=(b, 257, 1280)).astype(np.float32)
    t = np.array([400.0], dtype=np.float32)

    with torch.no_grad():
        ref = model(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ctx),
                    clip_feature=torch.from_numpy(clip), y=torch.from_numpy(y)).numpy()

    got = wan_dit.wan_dit_forward(
        params, cfg, jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(t), jnp.asarray(ctx),
        y=jnp.asarray(np.moveaxis(y, 1, -1)), clip_feature=jnp.asarray(clip),
        attn_impl="xla",
    )
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref,
                               rtol=5e-4, atol=5e-4)
