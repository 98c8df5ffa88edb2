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


def test_fp8_linear_close():
    from goal_force_tpu.ops.quant import fp8_linear, quantize_weight_fp8

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 64, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32)) * 0.05
    b = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    ref = x @ w + b
    got = fp8_linear(quantize_weight_fp8(w), x, b)
    err = np.abs(np.asarray(got - ref))
    rel = err.max() / float(jnp.abs(ref).max())
    assert rel < 0.05, rel          # e4m3 has ~2 mantissa bits


def test_fp8_tree_transform_and_dit_linear():
    from goal_force_tpu.models.wan_dit import linear
    from goal_force_tpu.ops.quant import quantize_linear_tree_fp8

    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))
    params = {"ffn": {"fc0": {"w": w, "b": b}}}
    q = quantize_linear_tree_fp8(params, paths=("ffn",))
    assert q["ffn"]["fc0"]["w_f8"].dtype == jnp.float8_e4m3fn
    x = jnp.asarray(rng.normal(size=(2, 7, 32)).astype(np.float32))
    ref = x @ w + b
    got = linear(q["ffn"]["fc0"], x)
    rel = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())
    assert rel < 0.05, rel
