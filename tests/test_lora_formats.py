"""LoRA format converters + SDXL civitai text-encoder mappings: golden parity
against the reference's converter classes (pure state-dict transforms, CPU-safe)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.lora_formats import (
    SD_SPECIAL_KEYS,
    civitai_lora_deltas,
    flux_lora_from_kohya,
    flux_lora_to_kohya,
    fuse_deltas,
    fuse_flux_lora,
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
    ref_lora = importlib.import_module("refmodels.lora")


def _synthetic_peft_flux_lora(rank=4, dim=8):
    rng = np.random.default_rng(0)
    sd = {}
    for block, middles in (("blocks", ["norm1_a.linear", "attn.a_to_qkv",
                                       "ff_b.2", "attn.b_to_out"]),
                           ("single_blocks", ["norm.linear", "to_qkv_mlp",
                                              "proj_out"])):
        for i in (0, 3):
            for m in middles:
                base = f"{block}.{i}.{m}"
                sd[f"{base}.lora_A.default.weight"] = rng.normal(
                    size=(rank, dim)).astype(np.float32)
                sd[f"{base}.lora_B.default.weight"] = rng.normal(
                    size=(dim, rank)).astype(np.float32)
    return sd


def test_flux_lora_to_kohya_matches_reference():
    import torch

    sd = _synthetic_peft_flux_lora()
    ref = ref_lora.FluxLoRAConverter.align_to_opensource_format(
        {k: torch.tensor(v) for k, v in sd.items()})
    got = flux_lora_to_kohya(sd)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(ref[k]), atol=0)


def test_flux_lora_from_kohya_matches_reference():
    import torch

    kohya = flux_lora_to_kohya(_synthetic_peft_flux_lora())
    ref = ref_lora.FluxLoRAConverter.align_to_diffsynth_format(
        {k: torch.tensor(v) for k, v in kohya.items()})
    got = flux_lora_from_kohya(kohya)
    assert set(got) == set(np.asarray(list(ref.keys())))
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]), atol=0)


def test_ab_deltas_match_reference():
    import torch

    rng = np.random.default_rng(1)
    lora = {}
    for name in ("transformer.blocks.0.attn.to_q", "transformer.proj_out"):
        lora[f"{name}.lora_A.weight"] = rng.normal(size=(4, 8)).astype(np.float32)
        lora[f"{name}.lora_B.weight"] = rng.normal(size=(8, 4)).astype(np.float32)
    loader = ref_lora.LoRAFromCivitai()
    ref = loader.convert_state_dict_AB(
        {k: torch.tensor(v) for k, v in lora.items()}, lora_prefix="transformer.",
        alpha=2.0, device="cpu", torch_dtype=torch.float32)
    got = civitai_lora_deltas(lora, lora_prefix="transformer.", alpha=2.0)
    assert set(got) == {k for k in ref}
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k].numpy(), rtol=1e-6)


def test_up_down_deltas_and_special_keys():
    """kohya up/down naming -> civitai model keys via the SD special-key table
    (reference convert_state_dict_up_down :30-51; it hardcodes cuda, so the
    expectation is computed directly)."""
    rng = np.random.default_rng(2)
    up = rng.normal(size=(8, 4)).astype(np.float32)
    down = rng.normal(size=(4, 6)).astype(np.float32)
    lora = {
        "lora_unet_input_blocks_1_1_proj_in.lora_up.weight": up,
        "lora_unet_input_blocks_1_1_proj_in.lora_down.weight": down,
        "lora_unet_input_blocks_1_1_proj_in.alpha": np.float32(4.0),
    }
    got = civitai_lora_deltas(lora, lora_prefix="lora_unet_", alpha=1.5,
                              special_keys=SD_SPECIAL_KEYS)
    key = "model.diffusion_model.input_blocks.1.1.proj_in.weight"
    assert list(got) == [key]
    np.testing.assert_allclose(got[key], 1.5 * (up @ down), rtol=1e-6, atol=1e-6)


def test_fuse_flux_lora_end_to_end():
    """Synthetic kohya Flux LoRA fused into a tiny diffsynth-format FluxDiT state
    dict changes exactly the mapped weights by alpha*B@A and the converted pytree
    runs."""
    import torch

    from goal_force_tpu.models.flux_dit import (
        flux_dit_forward,
        flux_dit_params_from_torch,
    )
    from goal_force_tpu.pipelines.flux import tiny_flux_configs
    from test_flux import _torch_tiny_flux

    cfg, _, _ = tiny_flux_configs()
    m = _torch_tiny_flux(cfg)
    sd = {k: v.numpy().copy() for k, v in m.state_dict().items()}

    rank, d = 2, cfg.dim
    rng = np.random.default_rng(3)
    a = rng.normal(size=(rank, d)).astype(np.float32)
    b = rng.normal(size=(3 * d, rank)).astype(np.float32)
    kohya = {
        "lora_unet_double_blocks_1_img_attn_qkv.lora_down.weight": a,
        "lora_unet_double_blocks_1_img_attn_qkv.lora_up.weight": b,
    }
    base = sd["blocks.1.attn.a_to_qkv.weight"].copy()
    n = fuse_flux_lora(sd, kohya, alpha=0.5)
    assert n == 1
    np.testing.assert_allclose(sd["blocks.1.attn.a_to_qkv.weight"],
                               base + 0.5 * b @ a, rtol=1e-5)

    params = flux_dit_params_from_torch(sd, cfg)
    out = flux_dit_forward(
        params, cfg, jnp.zeros((1, 4, 4, 16), jnp.float32),
        jnp.asarray([500.0]), jnp.zeros((1, 8, cfg.text_dim), jnp.float32),
        jnp.zeros((1, cfg.pooled_dim), jnp.float32), jnp.asarray([3.5]),
        attn_impl="xla")
    assert np.isfinite(np.asarray(out)).all()


def _synthetic_civitai_sdxl_text1(cfg):
    rng = np.random.default_rng(4)
    pre = "conditioner.embedders.0.transformer.text_model."
    d = cfg.text_dim
    sd = {
        pre + "embeddings.token_embedding.weight":
            rng.normal(size=(cfg.vocab_size, d)).astype(np.float32),
        pre + "embeddings.position_embedding.weight":
            rng.normal(size=(cfg.max_positions, d)).astype(np.float32),
    }
    for i in range(cfg.text_layers + 1):   # civitai ckpts carry layer 11 too
        b = f"{pre}encoder.layers.{i}."
        for nm, shape in (("layer_norm1.weight", (d,)), ("layer_norm1.bias", (d,)),
                          ("layer_norm2.weight", (d,)), ("layer_norm2.bias", (d,)),
                          ("self_attn.q_proj.weight", (d, d)),
                          ("self_attn.q_proj.bias", (d,)),
                          ("self_attn.k_proj.weight", (d, d)),
                          ("self_attn.k_proj.bias", (d,)),
                          ("self_attn.v_proj.weight", (d, d)),
                          ("self_attn.v_proj.bias", (d,)),
                          ("self_attn.out_proj.weight", (d, d)),
                          ("self_attn.out_proj.bias", (d,)),
                          ("mlp.fc1.weight", (4 * d, d)), ("mlp.fc1.bias", (4 * d,)),
                          ("mlp.fc2.weight", (d, 4 * d)), ("mlp.fc2.bias", (d,))):
            sd[b + nm] = rng.normal(size=shape).astype(np.float32)
    sd[pre + "final_layer_norm.weight"] = rng.normal(size=(d,)).astype(np.float32)
    sd[pre + "final_layer_norm.bias"] = rng.normal(size=(d,)).astype(np.float32)
    return sd


def test_sdxl_text1_civitai_matches_reference_table():
    """Algorithmic civitai converter == reference rename table -> diffsynth-format
    converter, tree-for-tree (tiny dims; the tables are pure renames)."""
    import torch

    ref_sdxl_text = importlib.import_module("refmodels.sdxl_text_encoder")
    from goal_force_tpu.models.sd_text_encoder import (
        SDXL_TEXT_CONFIG,
        sdxl_text_params_from_civitai,
        sdxl_text_params_from_torch,
    )

    import dataclasses as dc

    cfg = dc.replace(SDXL_TEXT_CONFIG, text_dim=16, text_heads=2, text_layers=3,
                     vocab_size=64, max_positions=8)
    civitai = _synthetic_civitai_sdxl_text1(cfg)
    ref_sd = ref_sdxl_text.SDXLTextEncoderStateDictConverter().from_civitai(
        {k: torch.tensor(v) for k, v in civitai.items()})
    via_ref = sdxl_text_params_from_torch(
        {k: v.numpy() for k, v in ref_sd.items()}, cfg)
    direct = sdxl_text_params_from_civitai(civitai, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        via_ref, direct)


def test_sdxl_text2_civitai_matches_reference_table():
    import torch

    ref_sdxl_text = importlib.import_module("refmodels.sdxl_text_encoder")
    from goal_force_tpu.models.sd_text_encoder import (
        SDXL_TEXT2_CONFIG,
        sdxl_text2_params_from_civitai,
        sdxl_text_params_from_torch,
    )

    import dataclasses as dc

    cfg = dc.replace(SDXL_TEXT2_CONFIG, text_dim=24, text_heads=2, text_layers=3,
                     vocab_size=64, max_positions=8)
    rng = np.random.default_rng(5)
    pre = "conditioner.embedders.1.model."
    d = cfg.text_dim
    sd = {
        pre + "token_embedding.weight":
            rng.normal(size=(cfg.vocab_size, d)).astype(np.float32),
        pre + "positional_embedding":
            rng.normal(size=(cfg.max_positions, d)).astype(np.float32),
        pre + "ln_final.weight": rng.normal(size=(d,)).astype(np.float32),
        pre + "ln_final.bias": rng.normal(size=(d,)).astype(np.float32),
        pre + "text_projection": rng.normal(size=(d, d)).astype(np.float32),
    }
    for i in range(cfg.text_layers):
        b = f"{pre}transformer.resblocks.{i}."
        sd[b + "attn.in_proj_weight"] = rng.normal(size=(3 * d, d)).astype(np.float32)
        sd[b + "attn.in_proj_bias"] = rng.normal(size=(3 * d,)).astype(np.float32)
        for nm, shape in (("attn.out_proj.weight", (d, d)),
                          ("attn.out_proj.bias", (d,)),
                          ("ln_1.weight", (d,)), ("ln_1.bias", (d,)),
                          ("ln_2.weight", (d,)), ("ln_2.bias", (d,)),
                          ("mlp.c_fc.weight", (5 * d, d)), ("mlp.c_fc.bias", (5 * d,)),
                          ("mlp.c_proj.weight", (d, 5 * d)), ("mlp.c_proj.bias", (d,))):
            sd[b + nm] = rng.normal(size=shape).astype(np.float32)

    ref_sd = ref_sdxl_text.SDXLTextEncoder2StateDictConverter().from_civitai(
        {k: torch.tensor(v) for k, v in sd.items()})
    via_ref = sdxl_text_params_from_torch(
        {k: v.numpy() for k, v in ref_sd.items()}, cfg, with_projection=True)
    direct = sdxl_text2_params_from_civitai(sd, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        via_ref, direct)
