"""Qwen2.5-VL backbone golden parity vs the installed transformers model
(the reference vendors this exact architecture: nexus_gen_ar_model.py:74-90,
qwenvl.py:4-36)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.qwen_vl import (
    QwenVLTextConfig,
    QwenVLVisionConfig,
    get_rope_index,
    qwen_vl_embed,
    qwen_vl_text_forward,
    qwen_vl_text_params_from_torch,
    qwen_vl_vision_forward,
    qwen_vl_vision_params_from_torch,
)

IMAGE_TOKEN = 150
VISION_START = 149


def _tiny_model():
    import torch
    from transformers import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    cfg = Qwen2_5_VLConfig(
        hidden_size=32, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=160,
        rope_theta=1e6, max_position_embeddings=512,
        rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
        image_token_id=IMAGE_TOKEN, video_token_id=151,
        vision_start_token_id=VISION_START, vision_end_token_id=148,
        bos_token_id=1, eos_token_id=2, pad_token_id=0, use_cache=False,
        vision_config={
            "hidden_size": 16, "depth": 2, "num_heads": 2,
            "intermediate_size": 24, "patch_size": 2, "temporal_patch_size": 2,
            "spatial_merge_size": 2, "out_hidden_size": 32, "window_size": 8,
            "fullatt_block_indexes": [1], "in_chans": 3,
        },
        _attn_implementation="eager")
    torch.manual_seed(0)
    m = Qwen2_5_VLForConditionalGeneration(cfg).eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.05
    return m


TXT_CFG = QwenVLTextConfig(hidden_size=32, num_layers=2, num_heads=4,
                           num_kv_heads=2, intermediate_size=48, vocab=160,
                           mrope_section=(2, 1, 1))
VIS_CFG = QwenVLVisionConfig(hidden_size=16, depth=2, num_heads=2,
                             intermediate_size=24, patch_size=2,
                             temporal_patch_size=2, spatial_merge_size=2,
                             out_hidden_size=32, window_size=8,
                             fullatt_block_indexes=(1,))


def test_vision_tower_golden_parity():
    import torch

    m = _tiny_model()
    grid = [(1, 8, 8)]
    pixels = torch.randn(64, 3 * 2 * 2 * 2)
    with torch.no_grad():
        ref = m.visual(pixels, grid_thw=torch.tensor(grid)).numpy()

    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    vprefix = "model.visual." if any(k.startswith("model.visual.") for k in sd) \
        else "visual."
    params = qwen_vl_vision_params_from_torch(
        {"visual." + k[len(vprefix):]: v for k, v in sd.items()
         if k.startswith(vprefix)}, VIS_CFG)
    ours = qwen_vl_vision_forward(params, VIS_CFG,
                                  jnp.asarray(pixels.numpy()), grid)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4, rtol=3e-3)


def test_full_model_golden_parity():
    import torch

    m = _tiny_model()
    grid = [(1, 8, 8)]
    pixels = torch.randn(64, 3 * 2 * 2 * 2)
    n_merged = 64 // 4
    ids = [5, 9, VISION_START] + [IMAGE_TOKEN] * n_merged + [7, 12, 3]
    input_ids = torch.tensor([ids])
    mask = torch.ones_like(input_ids)
    with torch.no_grad():
        out = m(input_ids=input_ids, attention_mask=mask, pixel_values=pixels,
                image_grid_thw=torch.tensor(grid), output_hidden_states=True)
    ref_hidden = out.hidden_states[-1].numpy()

    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    # installed transformers nests the text model under model.language_model.
    tprefix = "model.language_model." \
        if "model.language_model.embed_tokens.weight" in sd else "model."
    tparams = qwen_vl_text_params_from_torch(
        {k[len(tprefix):]: v for k, v in sd.items() if k.startswith(tprefix)},
        TXT_CFG, prefix="")
    vprefix = "model.visual." if "model.visual.patch_embed.proj.weight" in sd \
        else "visual."
    vparams = qwen_vl_vision_params_from_torch(
        {"visual." + k[len(vprefix):]: v for k, v in sd.items()
         if k.startswith(vprefix)}, VIS_CFG)

    img_feats = qwen_vl_vision_forward(vparams, VIS_CFG,
                                       jnp.asarray(pixels.numpy()), grid)
    ids_j = jnp.asarray(input_ids.numpy())
    emb = qwen_vl_embed(tparams, TXT_CFG, ids_j, img_feats, IMAGE_TOKEN)
    pos = get_rope_index(input_ids.numpy(), grid, IMAGE_TOKEN, VISION_START)
    hidden = qwen_vl_text_forward(tparams, TXT_CFG, emb,
                                  jnp.ones_like(ids_j), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden, atol=5e-4,
                               rtol=5e-3)


def test_rope_index_matches_reference():
    import torch

    m = _tiny_model()
    grid = [(1, 8, 8)]
    ids = [5, 9, VISION_START] + [IMAGE_TOKEN] * 16 + [7, 12, 3]
    input_ids = torch.tensor([ids])
    impl = m if hasattr(m, "get_rope_index") else m.model
    ref_pos, _ = impl.get_rope_index(input_ids, torch.tensor(grid),
                                     attention_mask=torch.ones_like(input_ids))
    ours = get_rope_index(input_ids.numpy(), grid, IMAGE_TOKEN, VISION_START)
    np.testing.assert_array_equal(ours, ref_pos.numpy())
