"""CLIP backbone + ImageQualityMetric scorer parity (tiny configs, CPU).

Golden parity targets: `transformers.CLIPModel` (constructible from a config
without downloads) and the reference's torch `MLP` preference head. The
open_clip converter is validated by a naming round-trip (the reference vendors
open_clip, whose model factory needs weight/bpe downloads).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.clip import (
    CLIP_H_14,
    CLIPConfig,
    clip_encode_image,
    clip_encode_text,
    clip_params_from_hf,
    clip_params_from_open_clip,
    clip_similarity,
    init_clip,
)
from goal_force_tpu.extensions.quality_metric import (
    AestheticScore,
    CLIPScore,
    PickScore,
    clip_preprocess,
    init_mlp_head,
    load_preference_model,
    mlp_head_apply,
    mlp_head_from_torch,
)

TINY = CLIPConfig(vocab_size=99, text_dim=32, text_heads=4, text_layers=3,
                  max_positions=24, image_size=28, patch_size=7, vision_dim=40,
                  vision_heads=4, vision_layers=2, proj_dim=48,
                  hidden_act="quick_gelu", text_pooling="eos_token",
                  eos_token_id=98)


def _tiny_hf():
    from transformers import CLIPConfig as HFC
    from transformers import CLIPModel, CLIPTextConfig, CLIPVisionConfig

    import torch

    torch.manual_seed(0)
    tc = CLIPTextConfig(vocab_size=99, hidden_size=32, intermediate_size=128,
                        num_hidden_layers=3, num_attention_heads=4,
                        max_position_embeddings=24, eos_token_id=98,
                        bos_token_id=97, hidden_act="quick_gelu",
                        projection_dim=48)
    vc = CLIPVisionConfig(hidden_size=40, intermediate_size=160,
                          num_hidden_layers=2, num_attention_heads=4,
                          image_size=28, patch_size=7, hidden_act="quick_gelu",
                          projection_dim=48)
    return CLIPModel(HFC(text_config=tc.to_dict(), vision_config=vc.to_dict(),
                         projection_dim=48)).eval()


@pytest.fixture(scope="module")
def hf_and_params():
    hf = _tiny_hf()
    params = jax.tree_util.tree_map(jnp.asarray, clip_params_from_hf(
        {k: v.numpy() for k, v in hf.state_dict().items()}, TINY))
    return hf, params


def test_clip_matches_hf(hf_and_params):
    import torch

    hf, params = hf_and_params
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 97, (2, 10)).astype(np.int64)
    ids[:, -1] = 98
    px = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        t_ref = hf.get_text_features(input_ids=torch.from_numpy(ids)).numpy()
        i_ref = hf.get_image_features(pixel_values=torch.from_numpy(px)).numpy()
        s_ref = hf(input_ids=torch.from_numpy(ids),
                   pixel_values=torch.from_numpy(px)).logits_per_text.numpy()
    t = clip_encode_text(params, TINY, jnp.asarray(ids))
    i = clip_encode_image(params, TINY, jnp.asarray(np.moveaxis(px, 1, -1)))
    s = clip_similarity(params, TINY, jnp.asarray(np.moveaxis(px, 1, -1)),
                        jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(t), t_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(i), i_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-4, atol=1e-4)


def test_open_clip_converter_roundtrip():
    """init params -> synthetic open_clip state dict -> converter == identity
    (packed in_proj QKV, matrix projections, resblock naming)."""
    cfg = CLIPConfig(vocab_size=50, text_dim=16, text_heads=2, text_layers=2,
                     max_positions=12, image_size=14, patch_size=7,
                     vision_dim=24, vision_heads=2, vision_layers=2,
                     proj_dim=20, hidden_act="gelu", text_pooling="argmax")
    ref = init_clip(jax.random.PRNGKey(0), cfg)
    sd = {
        "token_embedding.weight": ref["text"]["tok_emb"],
        "positional_embedding": ref["text"]["pos_emb"],
        "ln_final.weight": ref["text"]["ln_final"]["scale"],
        "ln_final.bias": ref["text"]["ln_final"]["bias"],
        "text_projection": ref["text_proj"],
        "visual.conv1.weight": np.transpose(ref["vision"]["patch_w"], (3, 2, 0, 1)),
        "visual.class_embedding": ref["vision"]["cls_emb"],
        "visual.positional_embedding": ref["vision"]["pos_emb"],
        "visual.ln_pre.weight": ref["vision"]["ln_pre"]["scale"],
        "visual.ln_pre.bias": ref["vision"]["ln_pre"]["bias"],
        "visual.ln_post.weight": ref["vision"]["ln_post"]["scale"],
        "visual.ln_post.bias": ref["vision"]["ln_post"]["bias"],
        "visual.proj": ref["vis_proj"],
        "logit_scale": ref["logit_scale"],
    }
    for tower, pre, dim, depth in [("text", "transformer", 16, 2),
                                   ("vision", "visual.transformer", 24, 2)]:
        blocks = ref[tower]["blocks"]
        for i in range(depth):
            g = lambda path: np.asarray(jax.tree_util.tree_map(
                lambda a: a[i], blocks)[path[0]][path[1]] if len(path) == 2
                else jax.tree_util.tree_map(lambda a: a[i], blocks)[path[0]])
            bi = jax.tree_util.tree_map(lambda a: np.asarray(a[i]), blocks)
            sd[f"{pre}.resblocks.{i}.ln_1.weight"] = bi["ln1"]["scale"]
            sd[f"{pre}.resblocks.{i}.ln_1.bias"] = bi["ln1"]["bias"]
            sd[f"{pre}.resblocks.{i}.ln_2.weight"] = bi["ln2"]["scale"]
            sd[f"{pre}.resblocks.{i}.ln_2.bias"] = bi["ln2"]["bias"]
            sd[f"{pre}.resblocks.{i}.attn.in_proj_weight"] = np.concatenate(
                [bi["attn"]["q_w"].T, bi["attn"]["k_w"].T, bi["attn"]["v_w"].T])
            sd[f"{pre}.resblocks.{i}.attn.in_proj_bias"] = np.concatenate(
                [bi["attn"]["q_b"], bi["attn"]["k_b"], bi["attn"]["v_b"]])
            sd[f"{pre}.resblocks.{i}.attn.out_proj.weight"] = bi["attn"]["o_w"].T
            sd[f"{pre}.resblocks.{i}.attn.out_proj.bias"] = bi["attn"]["o_b"]
            sd[f"{pre}.resblocks.{i}.mlp.c_fc.weight"] = bi["fc1_w"].T
            sd[f"{pre}.resblocks.{i}.mlp.c_fc.bias"] = bi["fc1_b"]
            sd[f"{pre}.resblocks.{i}.mlp.c_proj.weight"] = bi["fc2_w"].T
            sd[f"{pre}.resblocks.{i}.mlp.c_proj.bias"] = bi["fc2_b"]
    got = clip_params_from_open_clip({k: np.asarray(v) for k, v in sd.items()}, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-6),
        ref, got)


def test_mlp_head_matches_reference():
    """Reference torch MLP (aesthetic.py) vs our converted affine head."""
    import importlib.machinery
    import importlib.util
    import sys

    import torch

    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refiqm", None, is_package=True))
    pkg.__path__ = ["/root/reference/diffsynth/extensions/ImageQualityMetric"]
    sys.modules.setdefault("refiqm", pkg)
    try:
        aes = importlib.import_module("refiqm.aesthetic")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference aesthetic module unimportable: {e}")

    torch.manual_seed(0)
    ref_mlp = aes.MLP(64).eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, mlp_head_from_torch(
            {k: v.numpy() for k, v in ref_mlp.state_dict().items()}))
    x = np.random.default_rng(1).normal(size=(3, 64)).astype(np.float32)
    with torch.no_grad():
        ref = ref_mlp(torch.from_numpy(x)).numpy()
    got = mlp_head_apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_aesthetic_score_end_to_end(hf_and_params):
    """Full AestheticScore vs the reference formula (normalised HF image
    features -> affine head) on identical pixels."""
    import torch

    hf, params = hf_and_params
    mlp = init_mlp_head(jax.random.PRNGKey(1), input_size=48)
    scorer = AestheticScore(params, mlp, TINY)

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (40, 52, 3)).astype(np.uint8)
    px = clip_preprocess(img, TINY.image_size)
    with torch.no_grad():
        feats = hf.get_image_features(
            pixel_values=torch.from_numpy(np.moveaxis(px, -1, 0)[None]))
        feats = feats / feats.norm(dim=-1, keepdim=True)
    ref = float(mlp_head_apply(mlp, jnp.asarray(feats.numpy()))[0, 0])
    got = scorer.score([img])
    assert len(got) == 1
    np.testing.assert_allclose(got[0], ref, rtol=1e-3, atol=1e-3)


def test_pickscore_matches_hf_cosine(hf_and_params):
    import torch

    hf, params = hf_and_params
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 97, (1, 8))
    ids[:, -1] = 98
    scorer = PickScore(params, TINY, lambda prompt: ids)
    imgs = [rng.integers(0, 255, (36, 36, 3)).astype(np.uint8) for _ in range(3)]
    scores = scorer.score(imgs, "whatever", softmax=False)
    px = np.stack([clip_preprocess(i, TINY.image_size) for i in imgs])
    with torch.no_grad():
        ie = hf.get_image_features(pixel_values=torch.from_numpy(
            np.moveaxis(px, -1, 1)))
        te = hf.get_text_features(input_ids=torch.from_numpy(ids))
        ie = ie / ie.norm(dim=-1, keepdim=True)
        te = te / te.norm(dim=-1, keepdim=True)
        ref = (te @ ie.T)[0].numpy()
    np.testing.assert_allclose(np.asarray(scores), ref, rtol=1e-3, atol=1e-3)
    soft = scorer.score(imgs, "whatever", softmax=True)
    np.testing.assert_allclose(sum(soft), 1.0, atol=1e-5)


def test_clip_preprocess_matches_hf_processor():
    pytest.importorskip("transformers")
    from transformers.image_processing_utils import BaseImageProcessor  # noqa: F401
    from transformers import CLIPImageProcessor
    from PIL import Image

    proc = CLIPImageProcessor(size={"shortest_edge": 28}, crop_size=28,
                              do_resize=True, do_center_crop=True,
                              do_normalize=True, do_rescale=True)
    # smooth image: PIL and jax bicubic agree closely away from hard edges
    yy, xx = np.mgrid[0:40, 0:56].astype(np.float32)
    img = np.stack([xx * 4, yy * 5, (xx + yy) * 2], -1).clip(0, 255).astype(np.uint8)
    ref = proc(Image.fromarray(img), return_tensors="np")["pixel_values"][0]
    got = clip_preprocess(img, 28)
    np.testing.assert_allclose(got, np.moveaxis(ref, 0, -1), atol=0.08)


def test_mps_is_gated_with_explanation():
    with pytest.raises(NotImplementedError, match="cross_modeling"):
        load_preference_model("MPS", {})
