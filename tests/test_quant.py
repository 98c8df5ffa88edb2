"""W8A8 linear: accuracy vs f32 reference, tree transform."""

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.ops.quant import int8_linear, quantize_linear_tree, quantize_weight_int8


def test_int8_linear_close():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 64, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32)) * 0.05
    b = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    ref = x @ w + b
    got = int8_linear(quantize_weight_int8(w), x, b)
    err = np.abs(np.asarray(got - ref))
    rel = err.max() / float(jnp.abs(ref).max())
    assert rel < 0.02, rel


def test_quantize_tree_transform():
    params = {"ffn": {"fc0": {"w": jnp.ones((8, 16)), "b": jnp.zeros(16)}},
              "norm": {"w": jnp.ones(8)}}
    q = quantize_linear_tree(params, paths=("ffn",))
    assert "w_i8" in q["ffn"]["fc0"] and q["ffn"]["fc0"]["w_i8"].dtype == jnp.int8
    assert "w" in q["norm"]  # untouched outside target paths
