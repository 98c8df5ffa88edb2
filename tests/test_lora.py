"""LoRA: identity at init, merge math, PEFT roundtrip."""

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu import configs
from goal_force_tpu.lora import (
    DEFAULT_TARGETS,
    init_lora,
    lora_from_peft,
    lora_to_peft,
    merge_lora,
)
from goal_force_tpu.models import wan_dit


def _setup():
    cfg = configs.tiny_dit(num_layers=2)
    key = jax.random.PRNGKey(0)
    params = wan_dit.init_wan_dit(key, cfg, jnp.float32)
    lora = init_lora(key, params, rank=4)
    return cfg, params, lora


def test_zero_b_is_identity():
    cfg, params, lora = _setup()
    merged = merge_lora(params, lora, alpha=4)
    for t in DEFAULT_TARGETS:
        grp, leaf = ("ffn", "fc0") if t == "ffn.0" else (("ffn", "fc2") if t == "ffn.2" else ("self_attn", t))
        np.testing.assert_array_equal(
            np.asarray(merged["blocks"][grp][leaf]["w"]),
            np.asarray(params["blocks"][grp][leaf]["w"]),
        )


def test_merge_applies_delta():
    cfg, params, lora = _setup()
    lora["q"]["b"] = jnp.ones_like(lora["q"]["b"])
    merged = merge_lora(params, lora, alpha=4, rank=4)
    delta = np.einsum("lir,lro->lio", np.asarray(lora["q"]["a"]), np.asarray(lora["q"]["b"]))
    np.testing.assert_allclose(
        np.asarray(merged["blocks"]["self_attn"]["q"]["w"]),
        np.asarray(params["blocks"]["self_attn"]["q"]["w"]) + delta,
        rtol=1e-5, atol=1e-6,
    )
    # base untouched
    assert not np.array_equal(
        np.asarray(merged["blocks"]["self_attn"]["q"]["w"]),
        np.asarray(params["blocks"]["self_attn"]["q"]["w"]),
    )


def test_peft_roundtrip():
    cfg, params, lora = _setup()
    key = jax.random.PRNGKey(1)
    lora = jax.tree_util.tree_map(
        lambda a: jax.random.normal(key, a.shape, a.dtype) * 0.1, lora
    )
    sd = lora_to_peft(lora)
    assert any("lora_A.default.weight" in k for k in sd)
    back = lora_from_peft(sd, num_layers=cfg.num_layers)
    for t in lora:
        np.testing.assert_allclose(np.asarray(back[t]["a"]), np.asarray(lora[t]["a"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(back[t]["b"]), np.asarray(lora[t]["b"]), rtol=1e-6)


def test_peft_prefix_strip():
    cfg, params, lora = _setup()
    sd = lora_to_peft(lora, prefix="diffusion_model.")
    back = lora_from_peft(sd, num_layers=cfg.num_layers)
    assert set(back) == set(lora)
