"""NexusGen merger/adapter golden parity vs the reference projector module."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.nexus_gen import (
    NexusGenMergerConfig,
    merger_position_ids,
    nexus_gen_adapter_forward,
    nexus_gen_adapter_params_from_torch,
    nexus_gen_merger_forward,
    nexus_gen_merger_params_from_torch,
)
from goal_force_tpu.models.qwen_vl import QwenVLTextConfig

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
    ref_pj = importlib.import_module("refmodels.nexus_gen_projector")


def test_merger_golden_parity():
    import torch

    torch.manual_seed(0)
    m = ref_pj.NexusGenImageEmbeddingMerger(num_layers=1,
                                            out_channel=64).eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.02

    grid = (1, 18, 18)      # 81 merged tokens at merge size 2
    emb = torch.randn(1, 81, 3584)
    with torch.no_grad():
        ref_out = m(emb, torch.tensor([list(grid)])).numpy()

    cfg = NexusGenMergerConfig(text=QwenVLTextConfig(), num_layers=1,
                               out_channel=64)
    params = nexus_gen_merger_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    ours = nexus_gen_merger_forward(params, cfg, jnp.asarray(emb.numpy()),
                                    grid)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-3, rtol=5e-3)


def test_merger_with_reference_image():
    import torch

    torch.manual_seed(1)
    m = ref_pj.NexusGenImageEmbeddingMerger(num_layers=1,
                                            out_channel=32).eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.02
    grid, ref_grid = (1, 6, 6), (1, 4, 4)
    emb = torch.randn(1, 9, 3584)
    ref_emb = torch.randn(1, 4, 3584)
    with torch.no_grad():
        ref_out = m(emb, torch.tensor([list(grid)]), ref_emb,
                    torch.tensor([list(ref_grid)])).numpy()
    cfg = NexusGenMergerConfig(text=QwenVLTextConfig(), num_layers=1,
                               out_channel=32)
    params = nexus_gen_merger_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    ours = nexus_gen_merger_forward(params, cfg, jnp.asarray(emb.numpy()),
                                    grid, jnp.asarray(ref_emb.numpy()),
                                    ref_grid)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-3, rtol=5e-3)


def test_adapter_golden_parity():
    import torch

    torch.manual_seed(0)
    m = ref_pj.NexusGenAdapter(input_dim=24, output_dim=32).eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.1
    x = torch.randn(2, 5, 24)
    with torch.no_grad():
        ref_out = m(x).numpy()
    params = nexus_gen_adapter_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()})
    ours = nexus_gen_adapter_forward(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-5, rtol=2e-4)


def test_ar_generate_matches_teacher_forced():
    """The KV-cached AR loop must equal running each growing prefix through
    the uncached full forward (teacher-forced prefill-table inputs)."""
    from goal_force_tpu.models.nexus_gen import (
        nexus_ar_image_positions,
        nexus_gen_ar_generate,
    )
    from goal_force_tpu.models.qwen_vl import (
        init_qwen_vl_text,
        qwen_vl_text_forward,
    )

    cfg = QwenVLTextConfig(hidden_size=32, num_layers=2, num_heads=4,
                           num_kv_heads=2, intermediate_size=48, vocab=64,
                           mrope_section=(1, 1, 2))
    params = init_qwen_vl_text(jax.random.PRNGKey(0), cfg)
    grid, merge = (1, 6, 6), 2
    n_img = 9
    p_len = 5
    prompt = jax.random.normal(jax.random.PRNGKey(1), (1, p_len, 32))
    prompt_pos = jnp.tile(jnp.arange(p_len, dtype=jnp.int32)[None, None],
                          (3, 1, 1))
    vh = jax.random.normal(jax.random.PRNGKey(2), (32, 32)) * 0.1
    table = jax.random.normal(jax.random.PRNGKey(3), (n_img, 32)) * 0.5
    heads = {"vision_head": {"w": vh}, "image_prefill": table}

    out = jax.jit(lambda: nexus_gen_ar_generate(
        params, cfg, heads, prompt, prompt_pos, grid, merge))()
    assert out.shape == (1, n_img, 32)
    assert np.isfinite(np.asarray(out)).all()

    # teacher-forced: full uncached forward over prompt + table[:i] prefixes
    img_pos = jnp.asarray(nexus_ar_image_positions(p_len, grid, merge))
    for i in [0, 3, n_img - 1]:
        embeds = jnp.concatenate(
            [prompt, jnp.broadcast_to(table[:i][None], (1, i, 32))], axis=1)
        pos = jnp.concatenate([prompt_pos, img_pos[:, :, :i]], axis=2)
        mask = jnp.ones((1, p_len + i), jnp.int32)
        hidden = qwen_vl_text_forward(params, cfg, embeds, mask, pos)
        want = hidden[:, -1] @ vh
        np.testing.assert_allclose(np.asarray(out[:, i]), np.asarray(want),
                                   atol=2e-5, rtol=2e-4)


def test_target_embeddings_equal_ar_loop():
    """The reference's single teacher-forced forward (nexus_gen.py:117-153)
    must equal the sequential KV-cached decode."""
    from goal_force_tpu.models.nexus_gen import (
        nexus_ar_image_positions,
        nexus_gen_ar_generate,
        nexus_gen_target_embeddings,
    )
    from goal_force_tpu.models.qwen_vl import init_qwen_vl_text

    cfg = QwenVLTextConfig(hidden_size=32, num_layers=2, num_heads=4,
                           num_kv_heads=2, intermediate_size=48, vocab=64,
                           mrope_section=(1, 1, 2))
    params = init_qwen_vl_text(jax.random.PRNGKey(0), cfg)
    p_len, n_img = 5, 9
    prompt = jax.random.normal(jax.random.PRNGKey(1), (1, p_len, 32))
    prompt_pos = jnp.tile(jnp.arange(p_len, dtype=jnp.int32)[None, None],
                          (3, 1, 1))
    heads = {
        "vision_head": {"w": jax.random.normal(jax.random.PRNGKey(2),
                                               (32, 32)) * 0.1},
        "image_prefill": jax.random.normal(jax.random.PRNGKey(3),
                                           (n_img, 32)) * 0.5,
    }
    ar = nexus_gen_ar_generate(params, cfg, heads, prompt, prompt_pos,
                               (1, 6, 6), 2)

    embeds = jnp.concatenate([prompt, heads["image_prefill"][None]], axis=1)
    pos = jnp.concatenate(
        [prompt_pos, jnp.asarray(nexus_ar_image_positions(p_len, (1, 6, 6), 2))],
        axis=2)
    one_shot = nexus_gen_target_embeddings(params, cfg, heads, embeds, pos,
                                           n_img)
    np.testing.assert_allclose(np.asarray(ar), np.asarray(one_shot),
                               atol=2e-5, rtol=2e-4)


def test_nexus_gen_pipeline_smoke():
    from goal_force_tpu.pipelines.nexus_gen import NexusGenPipeline

    pipe = NexusGenPipeline.init_random()
    img = pipe("a lighthouse at dusk", height=32, width=32,
               num_inference_steps=2, seed=0)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()


def test_nexus_gen_edit_pipeline_smoke():
    """Editing path: ref-image slot + target slot AR sequence, merger, Flux
    denoise with spatial editing rope tables."""
    from goal_force_tpu.models.nexus_gen import NexusGenMergerConfig
    from goal_force_tpu.models.qwen_vl import init_qwen_vl_text
    from goal_force_tpu.pipelines.nexus_gen import NexusGenPipeline

    pipe = NexusGenPipeline.init_random()
    h = pipe.ar_cfg.hidden_size
    td = pipe.flux.dit_cfg.text_dim
    mcfg = NexusGenMergerConfig(text=pipe.ar_cfg, num_layers=1, out_channel=td)
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    n = lambda k, *s: jax.random.normal(k, s) * 0.05
    merger = {
        "blocks": init_qwen_vl_text(ks[0],
                                    dataclasses_replace(pipe.ar_cfg, 1)
                                    )["blocks"],
        "proj_norm0": {"w": jnp.ones((h,))},
        "proj_fc0": {"w": n(ks[1], h, 48), "b": jnp.zeros(48)},
        "proj_norm1": {"w": jnp.ones((48,))},
        "proj_fc1": {"w": n(ks[2], 48, td), "b": jnp.zeros(td)},
        "proj_norm2": {"w": jnp.ones((td,))},
    }
    ref = np.random.default_rng(0).normal(size=(1, 4, h)).astype(np.float32)
    img = pipe.edit("make it night", ref, (1, 4, 4), merger, mcfg,
                    height=32, width=32, num_inference_steps=2, seed=0)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()


def dataclasses_replace(cfg, num_layers):
    import dataclasses as _dc

    return _dc.replace(cfg, num_layers=num_layers)
