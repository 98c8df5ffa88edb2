"""OmniGen (Phi-3 diffusion backbone) golden parity vs the reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models.omnigen import (
    OmniGenConfig,
    omnigen_forward,
    omnigen_params_from_torch,
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
    ref_og = importlib.import_module("refmodels.omnigen")


SHORT = (1.1, 1.3, 1.6, 2.0)
LONG = (1.5, 2.5, 4.0, 6.0)


def _tiny_cfg():
    return OmniGenConfig(hidden_size=32, num_layers=2, num_heads=4,
                         num_kv_heads=4, intermediate_size=48, vocab=96,
                         original_max_positions=16, max_positions=64,
                         rope_short_factor=SHORT, rope_long_factor=LONG,
                         pos_embed_max_size=8)


def _ref_model(cfg):
    import torch
    from transformers import Phi3Config

    ref_cfg = Phi3Config(
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads, vocab_size=cfg.vocab,
        rms_norm_eps=cfg.eps, rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_positions,
        original_max_position_embeddings=cfg.original_max_positions,
        rope_scaling={"type": "su", "short_factor": list(SHORT),
                      "long_factor": list(LONG)},
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        use_cache=False, _attn_implementation="eager")
    torch.manual_seed(0)
    m = ref_og.OmniGenOriginalModel(ref_cfg, patch_size=cfg.patch_size,
                                    in_channels=cfg.in_channels,
                                    pos_embed_max_size=cfg.pos_embed_max_size)
    m = m.eval().float()
    for name, p in m.named_parameters():
        p.data = torch.randn_like(p.data) * 0.05
    # the vendored Phi3Transformer.forward predates the transformers API that
    # passes position_embeddings into each decoder layer; inject them here
    rot = m.llm.rotary_emb
    for layer in m.llm.layers:
        orig = layer.forward

        def wrapped(hs, *a, __orig=orig, **kw):
            kw["position_embeddings"] = rot(hs, kw.get("position_ids"))
            r = __orig(hs, *a, **kw)
            # newer transformers returns the tensor; the vendored loop indexes [0]
            return r if isinstance(r, tuple) else (r,)

        layer.forward = wrapped
    return m


def test_omnigen_golden_parity():
    import torch

    cfg = _tiny_cfg()
    m = _ref_model(cfg)

    lat = torch.randn(1, 4, 8, 8)
    t = torch.tensor([3.0])
    ids = torch.tensor([[5, 9, 2, 44, 7, 1, 30, 12]])
    img_lat = torch.randn(1, 4, 4, 4)          # 4 tokens spliced at [2, 6)
    sizes = {0: [(2, 6)]}
    s_total = ids.shape[1] + 1 + 16            # text + time token + 4x4 image
    mask = torch.tril(torch.ones(1, s_total, s_total))
    pos = torch.arange(s_total)[None]

    with torch.no_grad():
        ref_out, _ = m(lat, t, ids, [img_lat], sizes, mask, pos)
    ref_out = ref_out.numpy()

    params = omnigen_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    ours = omnigen_forward(
        params, cfg,
        jnp.asarray(lat.numpy().transpose(0, 2, 3, 1)), jnp.asarray([3.0]),
        jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
        input_img_latents=[jnp.asarray(img_lat.numpy().transpose(0, 2, 3, 1))],
        image_slices=[(0, 2, 6)],
        position_ids=jnp.asarray(pos.numpy()))
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref_out, atol=3e-4, rtol=3e-3)


def test_omnigen_no_text_path():
    import torch

    cfg = _tiny_cfg()
    m = _ref_model(cfg)
    lat = torch.randn(1, 4, 8, 8)
    t = torch.tensor([7.0])
    s_total = 1 + 16
    mask = torch.tril(torch.ones(1, s_total, s_total))
    pos = torch.arange(s_total)[None]
    with torch.no_grad():
        ref_out, _ = m(lat, t, None, None, {}, mask, pos)
    params = omnigen_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    ours = omnigen_forward(params, cfg,
                           jnp.asarray(lat.numpy().transpose(0, 2, 3, 1)),
                           jnp.asarray([7.0]), None, jnp.asarray(mask.numpy()),
                           position_ids=jnp.asarray(pos.numpy()))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref_out.numpy(), atol=3e-4, rtol=3e-3)
