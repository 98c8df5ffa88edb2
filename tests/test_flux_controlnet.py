"""Flux ControlNet: align logic vs the reference + tiny end-to-end wiring."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.flux_controlnet import (
    FluxControlNetConfig,
    align_res_stack,
    flux_controlnet_forward,
    init_flux_controlnet,
)
from goal_force_tpu.models.flux_dit import flux_dit_forward, init_flux_dit
from goal_force_tpu.pipelines.flux import tiny_flux_configs

from conftest import reference_available


def _tiny_cn_cfg():
    dit, _, _ = tiny_flux_configs()
    return FluxControlNetConfig(dit=dit, num_joint_blocks=2,
                                num_single_blocks=3)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_align_matches_reference_interval_logic():
    import importlib
    import importlib.machinery
    import sys

    import torch

    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refmodels", None, is_package=True))
    pkg.__path__ = ["/root/reference/diffsynth/models"]
    sys.modules.setdefault("refmodels", pkg)
    ref = importlib.import_module("refmodels.flux_controlnet")
    # align_res_stack_to_original_blocks is a plain method — call unbound
    for n_res, n_blocks in [(5, 19), (10, 38), (4, 19), (1, 38), (6, 19)]:
        res = [torch.full((1, 2, 3), float(i)) for i in range(n_res)]
        got = ref.FluxControlNet.align_res_stack_to_original_blocks(
            None, res, n_blocks, res[0])
        ref_ids = [int(r[0, 0, 0]) for r in got]
        ours = align_res_stack([jnp.full((1, 2, 3), float(i))
                                for i in range(n_res)], n_blocks)
        our_ids = [int(v) for v in np.asarray(ours)[:, 0, 0, 0]]
        assert our_ids == ref_ids, (n_res, n_blocks)


def test_zero_init_controlnet_is_identity():
    cfg = _tiny_cn_cfg()
    key = jax.random.PRNGKey(0)
    cn = init_flux_controlnet(key, cfg, dtype=jnp.float32)
    dit = init_flux_dit(jax.random.PRNGKey(1), cfg.dit, dtype=jnp.float32)

    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 16))
    cond = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 16))
    t = jnp.asarray([0.4])
    txt = jax.random.normal(jax.random.PRNGKey(4), (1, 5, cfg.dit.text_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(5), (1, cfg.dit.pooled_dim))
    g = jnp.asarray([3.5])

    jres, sres = flux_controlnet_forward(cn, cfg, lat, cond, t, txt, pooled, g)
    assert jres.shape == (cfg.dit.num_joint_blocks, 1, 16, cfg.dit.dim)
    assert sres.shape == (cfg.dit.num_single_blocks, 1, 16, cfg.dit.dim)
    np.testing.assert_allclose(np.asarray(jres), 0.0)  # zero-init projections

    base = flux_dit_forward(dit, cfg.dit, lat, t, txt, pooled, g)
    out = flux_dit_forward(dit, cfg.dit, lat, t, txt, pooled, g,
                           controlnet_res=jres, controlnet_single_res=sres)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


def test_nonzero_residuals_change_output_and_mode_token():
    cfg = dataclasses.replace(_tiny_cn_cfg(), num_mode=3)
    cn = init_flux_controlnet(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    cn["controlnet_blocks"]["w"] = jax.random.normal(
        jax.random.PRNGKey(9), cn["controlnet_blocks"]["w"].shape) * 0.1
    dit = init_flux_dit(jax.random.PRNGKey(1), cfg.dit, dtype=jnp.float32)

    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 16))
    cond = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 16))
    t = jnp.asarray([0.4])
    txt = jax.random.normal(jax.random.PRNGKey(4), (1, 5, cfg.dit.text_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(5), (1, cfg.dit.pooled_dim))
    g = jnp.asarray([3.5])

    jres, sres = flux_controlnet_forward(cn, cfg, lat, cond, t, txt, pooled, g,
                                         mode_id=1)
    base = flux_dit_forward(dit, cfg.dit, lat, t, txt, pooled, g)
    out = flux_dit_forward(dit, cfg.dit, lat, t, txt, pooled, g,
                           controlnet_res=jres, controlnet_single_res=sres)
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-4

    jres0, _ = flux_controlnet_forward(cn, cfg, lat, cond, t, txt, pooled, g,
                                       mode_id=0)
    assert np.abs(np.asarray(jres) - np.asarray(jres0)).max() > 1e-6
