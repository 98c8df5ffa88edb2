"""Pipeline-LEVEL golden parity for OmniGen.

OmniGen composes a flow-match schedule with INVERTED timesteps
(diffsynth/pipelines/omnigen_image.py:126,224) — whose final integration
endpoint is sigma=1, not 0 (schedulers/flow_match.py:78) — with CFG applied
by the transformer's forward_with_separate_cfg (models/omnigen.py:565-576).
Drive the reference's own FlowMatchScheduler and its OmniGenOriginalModel
(Phi-3 backbone, as in the model golden) against
`OmniGenImagePipeline.__call__` with the same weights, ids/mask/positions,
and noise, comparing final latents. Mask construction itself is covered by
the model golden + prompter citations; under test here is the inverse
schedule + CFG composition.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import load_reference_module, reference_available

from test_omnigen import LONG, SHORT, _ref_model  # noqa: F401  (tiny builder)

from goal_force_tpu.models.omnigen import (
    OmniGenConfig,
    omnigen_params_from_torch,
)
from goal_force_tpu.pipelines.omnigen_image import (
    OmniGenImagePipeline,
    omnigen_attention_mask,
)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")

H, W, STEPS, CFG, SEED = 64, 64, 5, 2.5, 13


def test_omnigen_pipeline_matches_reference_loop():
    import torch

    cfg = OmniGenConfig(hidden_size=32, num_layers=2, num_heads=4,
                        num_kv_heads=4, intermediate_size=48, vocab=96,
                        original_max_positions=16, max_positions=64,
                        rope_short_factor=SHORT, rope_long_factor=LONG,
                        pos_embed_max_size=8)
    m = _ref_model(cfg)
    params = jax.tree_util.tree_map(jnp.asarray, omnigen_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg))

    pipe = OmniGenImagePipeline(transformer=params, vae_encoder=None,
                                vae_decoder=None, cfg=cfg, dtype=jnp.float32)
    ours = pipe("a panda", cfg_scale=CFG, height=H, width=W,
                num_inference_steps=STEPS, seed=SEED, return_latents=True)

    # same ids / mask / positions as the pipeline builds (hash-id fallback)
    cond_ids = pipe._ids("a panda")
    uncond_ids = pipe._ids("")
    lh, lw = H // 8, W // 8
    n_img = (lh // 2) * (lw // 2)
    noise = np.asarray(jax.random.normal(
        jax.random.PRNGKey(SEED), (1, lh, lw, 4), jnp.float32))
    lat = torch.tensor(noise.transpose(0, 3, 1, 2))

    def branch(ids):
        mask = torch.tensor(omnigen_attention_mask(len(ids), n_img))
        id_arr = torch.tensor(np.asarray(ids)[None], dtype=torch.int64)
        pos = torch.arange(len(ids) + 1 + n_img)[None]
        return id_arr, mask, pos

    c_ids, c_mask, c_pos = branch(cond_ids)
    u_ids, u_mask, u_pos = branch(uncond_ids)

    ref_fm = load_reference_module("diffsynth/schedulers/flow_match.py",
                                   "ref_flow_match_omni")
    sched = ref_fm.FlowMatchScheduler(num_train_timesteps=1, shift=1,
                                      inverse_timesteps=True, sigma_min=0,
                                      sigma_max=1)
    sched.set_timesteps(STEPS)
    with torch.no_grad():
        for i, t in enumerate(sched.timesteps):
            tt = t.unsqueeze(0).float()
            cond, _ = m(lat, tt, c_ids, None, {}, c_mask, c_pos)
            uncond, _ = m(lat, tt, u_ids, None, {}, u_mask, u_pos)
            pred = uncond + CFG * (cond - uncond)   # omnigen.py:570-572
            lat = sched.step(pred, sched.timesteps[i], lat)
    ref = lat.numpy().transpose(0, 2, 3, 1)

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-2)
