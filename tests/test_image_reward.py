"""ImageReward (BLIP ViT + BERT-MED + head) parity tests.

The reference's own BLIP modules are unimportable in this environment
(BLIP/vit.py needs timm, BLIP/med.py imports `apply_chunking_to_forward` from
a transformers path removed in 4.40+), so parity anchors on transformers'
`ViTModel` and `BertEncoder`, which compute the identical math (timm-style
pre-LN ViT; post-LN BERT layers with cross-attention). Weight layouts are
mapped in-test from the HF state dicts to our converter format.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.extensions.image_reward import (
    BlipViTConfig,
    ImageRewardScore,
    MedConfig,
    bert_med_apply,
    bert_med_params_from_torch,
    blip_vit_apply,
    blip_vit_params_from_torch,
    image_reward_params_from_torch,
    init_image_reward,
)

VIT = BlipViTConfig(image_size=14, patch_size=7, dim=24, num_heads=4,
                    num_layers=2)
MED = MedConfig(vocab_size=50, dim=32, num_heads=4, num_layers=2,
                intermediate=64, encoder_width=32, max_positions=16)


def test_blip_vit_matches_hf_vit():
    import torch
    from transformers import ViTConfig, ViTModel

    torch.manual_seed(0)
    hf = ViTModel(ViTConfig(image_size=14, patch_size=7, hidden_size=24,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=96, layer_norm_eps=1e-6,
                            hidden_act="gelu"), add_pooling_layer=False).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    # map HF ViT naming -> the timm naming our converter expects
    timm_sd = {
        "patch_embed.proj.weight": sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias": sd["embeddings.patch_embeddings.projection.bias"],
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    for i in range(2):
        p = f"encoder.layer.{i}."
        qkv_w = np.concatenate([sd[p + f"attention.attention.{n}.weight"]
                                for n in ("query", "key", "value")])
        qkv_b = np.concatenate([sd[p + f"attention.attention.{n}.bias"]
                                for n in ("query", "key", "value")])
        timm_sd.update({
            f"blocks.{i}.attn.qkv.weight": qkv_w,
            f"blocks.{i}.attn.qkv.bias": qkv_b,
            f"blocks.{i}.attn.proj.weight": sd[p + "attention.output.dense.weight"],
            f"blocks.{i}.attn.proj.bias": sd[p + "attention.output.dense.bias"],
            f"blocks.{i}.norm1.weight": sd[p + "layernorm_before.weight"],
            f"blocks.{i}.norm1.bias": sd[p + "layernorm_before.bias"],
            f"blocks.{i}.norm2.weight": sd[p + "layernorm_after.weight"],
            f"blocks.{i}.norm2.bias": sd[p + "layernorm_after.bias"],
            f"blocks.{i}.mlp.fc1.weight": sd[p + "intermediate.dense.weight"],
            f"blocks.{i}.mlp.fc1.bias": sd[p + "intermediate.dense.bias"],
            f"blocks.{i}.mlp.fc2.weight": sd[p + "output.dense.weight"],
            f"blocks.{i}.mlp.fc2.bias": sd[p + "output.dense.bias"],
        })
    params = jax.tree_util.tree_map(jnp.asarray,
                                    blip_vit_params_from_torch(timm_sd, VIT))
    px = np.random.default_rng(0).normal(size=(2, 3, 14, 14)).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(px)).last_hidden_state.numpy()
    got = blip_vit_apply(params, VIT, jnp.asarray(np.moveaxis(px, 1, -1)))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_bert_med_matches_hf_bert_encoder():
    import torch
    from transformers import BertConfig
    from transformers.models.bert.modeling_bert import BertModel

    torch.manual_seed(1)
    cfg = BertConfig(vocab_size=50, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=16, is_decoder=True,
                     add_cross_attention=True, hidden_act="gelu",
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf = BertModel(cfg, add_pooling_layer=False).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray,
                                    bert_med_params_from_torch(sd, MED))

    rng = np.random.default_rng(2)
    ids = rng.integers(0, 50, (2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.float32)
    mask[1, 6:] = 0.0
    enc = rng.normal(size=(2, 5, 32)).astype(np.float32)

    with torch.no_grad():
        # drive embeddings + encoder directly: BertModel.forward would build a
        # causal self-attn mask (is_decoder); MED text-encoder mode is
        # bidirectional. token_type row 0 contributes a constant — zero it.
        hf.embeddings.token_type_embeddings.weight.zero_()
        emb = hf.embeddings(input_ids=torch.from_numpy(ids))
        ext = torch.from_numpy(((1.0 - mask) * -10000.0)[:, None, None, :])
        ref = hf.encoder(emb, attention_mask=ext,
                         encoder_hidden_states=torch.from_numpy(enc),
                         encoder_attention_mask=torch.zeros(2, 1, 1, 5),
                         ).last_hidden_state.numpy()
    got = bert_med_apply(params, MED, jnp.asarray(ids), jnp.asarray(mask),
                         jnp.asarray(enc))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


MED_E2E = MedConfig(vocab_size=50, dim=32, num_heads=4, num_layers=2,
                    intermediate=64, encoder_width=VIT.dim, max_positions=16)


def test_image_reward_score_end_to_end():
    """Random-init scorer: correct output structure, finite, image-dependent,
    full-checkpoint converter round-trips through the torch naming."""
    MED = MED_E2E  # cross-attention keys/values project from the ViT width
    params = init_image_reward(jax.random.PRNGKey(0), VIT, MED)

    def tokenize(prompt):
        ids = np.zeros((1, 12), np.int64)
        ids[0, :5] = [2, 7, 9, 4, 3]
        mask = np.zeros((1, 12), np.float32)
        mask[0, :5] = 1
        return ids, mask

    scorer = ImageRewardScore(params, tokenize, VIT, MED)
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 255, (20, 30, 3)).astype(np.uint8) for _ in range(2)]
    out = scorer.score(imgs, "a photo")
    assert len(out) == 2 and all(np.isfinite(v) for v in out)
    assert out[0] != out[1]  # different images -> different rewards

    # converter round-trip: params -> torch-style flat dict -> converter
    flat = {}
    vit, bert = params["vit"], params["bert"]
    flat["blip.visual_encoder.patch_embed.proj.weight"] = np.transpose(
        np.asarray(vit["patch_w"]), (3, 2, 0, 1))
    flat["blip.visual_encoder.patch_embed.proj.bias"] = np.asarray(vit["patch_b"])
    flat["blip.visual_encoder.cls_token"] = np.asarray(vit["cls"])[None, None]
    flat["blip.visual_encoder.pos_embed"] = np.asarray(vit["pos"])[None]
    flat["blip.visual_encoder.norm.weight"] = np.asarray(vit["ln_final"]["scale"])
    flat["blip.visual_encoder.norm.bias"] = np.asarray(vit["ln_final"]["bias"])
    for i in range(VIT.num_layers):
        b = jax.tree_util.tree_map(lambda a: np.asarray(a[i]), vit["blocks"])
        p = f"blip.visual_encoder.blocks.{i}."
        flat.update({p + "norm1.weight": b["ln1"]["scale"], p + "norm1.bias": b["ln1"]["bias"],
                     p + "attn.qkv.weight": b["qkv_w"].T, p + "attn.qkv.bias": b["qkv_b"],
                     p + "attn.proj.weight": b["proj_w"].T, p + "attn.proj.bias": b["proj_b"],
                     p + "norm2.weight": b["ln2"]["scale"], p + "norm2.bias": b["ln2"]["bias"],
                     p + "mlp.fc1.weight": b["fc1_w"].T, p + "mlp.fc1.bias": b["fc1_b"],
                     p + "mlp.fc2.weight": b["fc2_w"].T, p + "mlp.fc2.bias": b["fc2_b"]})
    flat["blip.text_encoder.embeddings.word_embeddings.weight"] = np.asarray(bert["word_emb"])
    flat["blip.text_encoder.embeddings.position_embeddings.weight"] = np.asarray(bert["pos_emb"])
    flat["blip.text_encoder.embeddings.LayerNorm.weight"] = np.asarray(bert["emb_ln"]["scale"])
    flat["blip.text_encoder.embeddings.LayerNorm.bias"] = np.asarray(bert["emb_ln"]["bias"])
    for i in range(MED.num_layers):
        b = jax.tree_util.tree_map(lambda a: np.asarray(a[i]), bert["blocks"])
        p = f"blip.text_encoder.encoder.layer.{i}."
        flat.update({
            p + "attention.self.query.weight": b["q_w"].T, p + "attention.self.query.bias": b["q_b"],
            p + "attention.self.key.weight": b["k_w"].T, p + "attention.self.key.bias": b["k_b"],
            p + "attention.self.value.weight": b["v_w"].T, p + "attention.self.value.bias": b["v_b"],
            p + "attention.output.dense.weight": b["self_out_w"].T,
            p + "attention.output.dense.bias": b["self_out_b"],
            p + "attention.output.LayerNorm.weight": b["self_ln"]["scale"],
            p + "attention.output.LayerNorm.bias": b["self_ln"]["bias"],
            p + "crossattention.self.query.weight": b["xq_w"].T,
            p + "crossattention.self.query.bias": b["xq_b"],
            p + "crossattention.self.key.weight": b["xk_w"].T,
            p + "crossattention.self.key.bias": b["xk_b"],
            p + "crossattention.self.value.weight": b["xv_w"].T,
            p + "crossattention.self.value.bias": b["xv_b"],
            p + "crossattention.output.dense.weight": b["x_out_w"].T,
            p + "crossattention.output.dense.bias": b["x_out_b"],
            p + "crossattention.output.LayerNorm.weight": b["x_ln"]["scale"],
            p + "crossattention.output.LayerNorm.bias": b["x_ln"]["bias"],
            p + "intermediate.dense.weight": b["fc1_w"].T, p + "intermediate.dense.bias": b["fc1_b"],
            p + "output.dense.weight": b["fc2_w"].T, p + "output.dense.bias": b["fc2_b"],
            p + "output.LayerNorm.weight": b["out_ln"]["scale"],
            p + "output.LayerNorm.bias": b["out_ln"]["bias"]})
    dims = [np.asarray(l["w"]).shape for l in params["mlp"]]
    for j, i in enumerate((0, 2, 4, 6, 7)):
        flat[f"mlp.layers.{i}.weight"] = np.asarray(params["mlp"][j]["w"]).T
        flat[f"mlp.layers.{i}.bias"] = np.asarray(params["mlp"][j]["b"])
    got = image_reward_params_from_torch(flat, VIT, MED)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-6),
        {"vit": params["vit"], "bert": params["bert"],
         "mlp": list(params["mlp"])},
        {"vit": got["vit"], "bert": got["bert"], "mlp": got["mlp"]})
