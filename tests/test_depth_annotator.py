"""Golden parity for the learned DPT-Hybrid depth annotator.

The reference's Annotator("depth") wraps controlnet_aux's MidasDetector — the
MiDaS DPT-Hybrid network (diffsynth/controlnets/processors.py:14-16).
controlnet_aux is not installed here, but HF transformers ships the very same
architecture (DPTForDepthEstimation, is_hybrid=True, the `Intel/dpt-hybrid-
midas` distribution of the MiDaS weights), so parity is proven against it at
a tiny config: random torch weights -> converter -> identical outputs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from goal_force_tpu.extensions.depth import (DPTHybridConfig, depth_annotate,
                                             dpt_config_from_state_dict,
                                             dpt_depth, dpt_params_from_torch,
                                             init_dpt, tiny_dpt)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _build_reference():
    from transformers import DPTConfig, DPTForDepthEstimation
    from transformers.models.bit import BitConfig

    cfg = tiny_dpt()
    bit = BitConfig(
        embedding_size=cfg.embedding_size,
        hidden_sizes=list(cfg.hidden_sizes), depths=list(cfg.depths),
        num_groups=cfg.num_groups, layer_type="bottleneck",
        global_padding="SAME", embedding_dynamic_padding=True,
        stage_names=["stem", "stage1", "stage2", "stage3"],
        out_features=["stage1", "stage2", "stage3"])
    hf = DPTConfig(
        is_hybrid=True, backbone_config=bit, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size, image_size=64,
        patch_size=cfg.patch_size,
        fusion_hidden_size=cfg.fusion_hidden_size,
        neck_hidden_sizes=list(cfg.neck_hidden_sizes),
        backbone_out_indices=[0, 1, cfg.vit_out_layers[0] - 1,
                              cfg.vit_out_layers[1] - 1],
        reassemble_factors=[1, 1, 1, 0.5],
        backbone_featmap_shape=[1, cfg.hidden_sizes[-1], 4, 4])
    torch.manual_seed(0)
    model = DPTForDepthEstimation(hf).eval()
    # non-degenerate weights (HF zero-inits cls/pos; keep cls zero like the
    # trained model's near-zero token but randomize the position table)
    with torch.no_grad():
        model.dpt.embeddings.position_embeddings.normal_(0.0, 0.02)
    return cfg, model


def test_dpt_hybrid_golden_parity():
    cfg, model = _build_reference()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    # strict converter: full key coverage enforced internally; an unknown
    # extra key must raise
    params = dpt_params_from_torch(sd, cfg)
    with pytest.raises(ValueError, match="unconsumed"):
        dpt_params_from_torch({**sd, "bogus.extra": sd["head.head.4.bias"]},
                              cfg)

    torch.manual_seed(1)
    # (the HF hybrid embeddings hard-require input == configured image_size;
    # non-square inputs are exercised via the annotator test below)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = model(x).predicted_depth.numpy()
    out = np.asarray(dpt_depth(params, cfg,
                               jnp.asarray(x.permute(0, 2, 3, 1).numpy())))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)


def test_dpt_config_inference_real_geometry():
    # the shape-based config sniffing must reproduce the published
    # dpt-hybrid-midas geometry from its key/shape structure alone
    cfg = DPTHybridConfig()
    tiny = tiny_dpt()
    _, ref = _build_reference()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    inferred = dpt_config_from_state_dict(sd)
    assert inferred.hidden_sizes == tiny.hidden_sizes
    assert inferred.depths == tiny.depths
    assert inferred.hidden_size == tiny.hidden_size
    assert inferred.num_layers == tiny.num_layers
    assert inferred.neck_hidden_sizes == tiny.neck_hidden_sizes
    assert inferred.fusion_hidden_size == tiny.fusion_hidden_size
    assert inferred.vit_out_layers == tiny.vit_out_layers
    assert cfg.vit_out_layers == (9, 12)  # real-geometry default


def test_depth_annotator_end_to_end(tmp_path):
    from safetensors.torch import save_file

    from goal_force_tpu.controlnets import Annotator

    _, model = _build_reference()
    path = tmp_path / "dpt_tiny.safetensors"
    save_file({k: v.contiguous() for k, v in model.state_dict().items()},
              str(path))

    ann = Annotator("depth", weights_path=str(path),
                    num_heads=tiny_dpt().num_heads)
    img = (np.random.default_rng(0).uniform(0, 255, (50, 70, 3))
           .astype(np.uint8))
    out = ann(img)
    assert out.shape == (50, 70, 3)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()
    assert 0.0 <= out.min() and out.max() <= 1.0
    # the map must be normalized to span [0, 1] (MidasDetector min-max)
    assert out.max() - out.min() > 0.9


def test_depth_annotate_normalization():
    import jax

    cfg = tiny_dpt()
    params = init_dpt(jax.random.PRNGKey(0), cfg)
    img = (np.random.default_rng(1).uniform(0, 255, (40, 40, 3))
           .astype(np.uint8))
    d = depth_annotate(params, cfg, img)
    assert d.shape == (40, 40)
    assert np.isfinite(d).all()
