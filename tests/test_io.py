"""Checkpoint IO: save/load roundtrip and reference-format export/import parity."""

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu import configs
from goal_force_tpu.io.safetensors_io import (
    checkpoint_step,
    export_goalforce_controlnet,
    find_latest_checkpoint,
    load_goalforce_controlnet,
    save_safetensors,
)
from goal_force_tpu.models import controlnet as cnm
from goal_force_tpu.models import wan_dit


def test_controlnet_export_import_roundtrip(tmp_path):
    dit_cfg, _, _, cn_cfg = configs.tiny_pipeline_configs(cn_layers=2)
    key = jax.random.PRNGKey(0)
    dit = wan_dit.init_wan_dit(key, dit_cfg, jnp.float32)
    cn = cnm.init_from_dit(key, dit, dit_cfg, cn_cfg, jnp.float32)
    # make weights non-trivial
    cn = jax.tree_util.tree_map(lambda a: a + 0.01, cn)

    sd = export_goalforce_controlnet(jax.tree_util.tree_map(np.asarray, cn), cn_cfg)
    assert all(k.startswith("pipe.controlnet.") for k in sd)
    path = str(tmp_path / "step-500.safetensors")
    save_safetensors(sd, path)

    back = load_goalforce_controlnet(path, cn_cfg)
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(cn), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(back), key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
                                   err_msg=str(ka))


def test_find_latest_checkpoint(tmp_path):
    for step in (500, 1500, 1000):
        save_safetensors({"x": np.zeros(1, np.float32)},
                         str(tmp_path / f"step-{step}.safetensors"))
    latest = find_latest_checkpoint(str(tmp_path))
    assert latest.endswith("step-1500.safetensors")
    assert checkpoint_step(latest) == 1500
