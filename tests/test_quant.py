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


def test_quantize_linear_tree_stacked_blocks():
    """STACKED per-layer trees (L, in, out): scales keep the layer axis and
    norm* weights — (L, dim), 2-D like a linear but layer-leading — are NEVER
    quantized (regression: they were, collapsing scales over layers)."""
    from goal_force_tpu.configs import WanDiTConfig
    from goal_force_tpu.models import wan_dit as wd

    cfg = WanDiTConfig(dim=32, in_dim=36, ffn_dim=64, out_dim=16, text_dim=24,
                       freq_dim=16, num_heads=4, num_layers=2)
    key = jax.random.PRNGKey(0)
    blocks = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[wd.init_block(k, cfg, jnp.float32) for k in jax.random.split(key, 2)])
    qb = quantize_linear_tree(blocks, paths=("self_attn", "cross_attn", "ffn"))
    assert qb["self_attn"]["q"]["w_i8"].shape == (2, 32, 32)
    assert qb["self_attn"]["q"]["w_scale"].shape == (2, 32)
    assert "w_i8" not in qb["self_attn"]["norm_q"]
    assert "w_i8" not in qb["norm3"]

    from goal_force_tpu.ops.rope import assemble_rope, rope_tables_3d

    cos, sin = assemble_rope(rope_tables_3d(cfg.head_dim, cfg.rope_max_len),
                             2, 2, 2)
    x = jax.random.normal(key, (2, 8, 32), jnp.float32)
    ctxv = jax.random.normal(key, (2, 5, 32), jnp.float32)
    tmod = jax.random.normal(key, (2, 6, 32), jnp.float32) * 0.02
    out_bf, _ = wd.run_blocks(blocks, x, ctxv, tmod, cos, sin, cfg,
                              attn_impl="xla")
    out_q, _ = wd.run_blocks(qb, x, ctxv, tmod, cos, sin, cfg, attn_impl="xla")
    err = float(jnp.abs(out_q - out_bf).max()
                / (jnp.abs(out_bf).max() + 1e-9))
    assert err < 0.05, err
