"""CLIP ViT vision tower parity vs reference (tiny config)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models import image_encoder as ie

from conftest import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")

if reference_available():
    import importlib
    import importlib.machinery
    import sys
    import types

    # torchvision isn't in this image; the ViT under test never touches it
    # (only WanImageEncoder's preprocessing transforms do). Stub it ONLY for
    # the duration of the reference import, then remove it: a lingering
    # spec-less sys.modules entry makes importlib.util.find_spec("torchvision")
    # raise, which breaks transformers' availability probing in other tests.
    _stubbed = "torchvision" not in sys.modules
    if _stubbed:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms

    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refmodels", None, is_package=True)
    )
    pkg.__path__ = ["/root/reference/diffsynth/models"]
    sys.modules.setdefault("refmodels", pkg)
    ref_ie = importlib.import_module("refmodels.wan_video_image_encoder")

    if _stubbed:
        del sys.modules["torchvision"], sys.modules["torchvision.transforms"]


def test_vit_matches_reference_31_blocks():
    import torch

    torch.manual_seed(0)
    cfg = ie.ViTConfig(image_size=28, patch_size=14, dim=32, mlp_ratio=2,
                       num_heads=4, num_layers=3, use_blocks=2)
    model = ref_ie.VisionTransformer(
        image_size=cfg.image_size, patch_size=cfg.patch_size, dim=cfg.dim,
        mlp_ratio=cfg.mlp_ratio, out_dim=16, num_heads=cfg.num_heads,
        num_layers=cfg.num_layers, pool_type="token", pre_norm=True,
        activation="gelu", attn_dropout=0.0, proj_dropout=0.0, embedding_dropout=0.0,
    ).float().eval()
    sd = {"visual." + k: v.numpy() for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, ie.vit_params_from_torch(sd, cfg))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x), use_31_block=True).numpy()

    got = ie.vit_encode(params, cfg, jnp.asarray(np.moveaxis(x, 1, -1)))
    assert got.shape == ref.shape  # (2, 5 tokens, 32)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4, atol=3e-4)
