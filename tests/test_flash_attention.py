"""Pallas flash-attention kernel vs XLA attention (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from goal_force_tpu.ops.attention import _xla_attention
from goal_force_tpu.ops.flash_attention import flash_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


@pytest.mark.parametrize("s,skv", [(256, 256), (300, 300), (300, 40), (128, 512)])
def test_matches_xla(s, skv):
    B, N, H = 1, 2, 128
    q, k, v = _rand((B, s, N, H), 0), _rand((B, skv, N, H), 1), _rand((B, skv, N, H), 2)
    ref = _xla_attention(q, k, v, H**-0.5)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, scale=H**-0.5, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_matches_xla_unbounded_logits():
    """Inputs whose Cauchy-Schwarz logit bound exceeds the max-free threshold must
    take the online-max fallback branch of the lax.cond and still match XLA."""
    B, s, N, H = 1, 300, 2, 128
    q = _rand((B, s, N, H), 0) * 40.0     # bound ~ 0.1275*452*11.3 >> 100
    k, v = _rand((B, s, N, H), 1) * 40.0, _rand((B, s, N, H), 2)
    ref = _xla_attention(q, k, v, H**-0.5)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, scale=H**-0.5, block_q=128, block_k=128)
    # absolute tolerance: at +/-40-sigma logits the softmax is razor-peaked and the
    # fold of scale into q (vs into the logits) legitimately reorders roundings,
    # shifting near-tied tiny probabilities; outputs are O(1) averages of v.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


def test_static_nomax_dispatch_matches_xla():
    """dispatch="nomax" (the qk-normed fast path: no runtime bound, no lax.cond,
    saturating clamp) must be EXACT for realistic logits."""
    B, s, skv, N, H = 1, 300, 260, 2, 128
    q, k, v = _rand((B, s, N, H), 0), _rand((B, skv, N, H), 1), _rand((B, skv, N, H), 2)
    ref = _xla_attention(q, k, v, H**-0.5)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, scale=H**-0.5, block_q=128, block_k=128,
                              dispatch="nomax")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_static_nomax_saturates_instead_of_overflowing():
    """Pathological logits beyond NOMAX_CLAMP must saturate (finite output, a
    v-average over near-max keys), never produce inf/NaN."""
    B, s, N, H = 1, 128, 1, 128
    q = _rand((B, s, N, H), 0) * 40.0
    k, v = _rand((B, s, N, H), 1) * 40.0, _rand((B, s, N, H), 2)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, scale=H**-0.5, block_q=128, block_k=128,
                              dispatch="nomax")
    got = np.asarray(got)
    assert np.isfinite(got).all()
    # saturated rows are convex combinations of v rows
    assert np.abs(got).max() <= np.abs(np.asarray(v)).max() + 1e-3


def test_rejects_non_128_head_dim():
    q = jnp.zeros((1, 128, 2, 64))
    with pytest.raises(ValueError):
        flash_attention(q, q, q, scale=1.0)


def test_backward_matches_xla():
    g = _rand((1, 300, 2, 128), 3)
    q, k, v = _rand((1, 300, 2, 128), 0), _rand((1, 260, 2, 128), 1), _rand((1, 260, 2, 128), 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, 128**-0.5) * g)

    def loss_fa(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale=128**-0.5,
                                       block_q=128, block_k=128) * g)

    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5)


def test_int8_variant_close_to_exact():
    B, S, N, H = 1, 256, 2, 128
    q, k, v = _rand((B, S, N, H), 0), _rand((B, S, N, H), 1), _rand((B, S, N, H), 2)
    ref = _xla_attention(q, k, v, H**-0.5)
    from goal_force_tpu.ops.flash_attention import flash_attention_int8

    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_int8(q, k, v, scale=H**-0.5, block_q=128, block_k=128)
    # int8 QK: near-lossless, not exact
    err = np.abs(np.asarray(got) - np.asarray(ref))
    assert err.max() < 0.05, err.max()
    assert err.mean() < 0.005, err.mean()


def test_auto_dispatch_picks_pallas_on_tpu(monkeypatch):
    """Regression (round-4 advisor, high): the ring branch must not swallow the
    "auto" -> _default_impl resolution. On TPU with qualifying shapes (head dim
    %128, seq >= 256) attention(impl="auto") must route to the Pallas kernel,
    not the XLA einsum."""
    import importlib

    attn_mod = importlib.import_module("goal_force_tpu.ops.attention")
    monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
    calls = {}

    import goal_force_tpu.ops.flash_attention as fa_mod

    real_fa = fa_mod.flash_attention

    def spy(q, k, v, **kw):
        calls["pallas"] = True
        with pltpu.force_tpu_interpret_mode():
            return real_fa(q, k, v, **kw)

    monkeypatch.setattr(fa_mod, "flash_attention", spy)
    q = _rand((1, 256, 2, 128), 0)
    got = attn_mod.attention(q, q, q, impl="auto")
    assert calls.get("pallas"), "auto did not dispatch to the Pallas kernel on TPU"
    ref = _xla_attention(q, q, q, 128**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_auto_dispatch_xla_for_small_or_cpu(monkeypatch):
    import importlib

    attn_mod = importlib.import_module("goal_force_tpu.ops.attention")
    # non-TPU -> xla
    monkeypatch.setattr(attn_mod, "_on_tpu", lambda: False)
    q = _rand((1, 256, 2, 128), 0)
    assert attn_mod._default_impl(q) == "xla"
    # TPU but short sequence -> xla
    monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
    q_short = _rand((1, 64, 2, 128), 0)
    assert attn_mod._default_impl(q_short) == "xla"
    # TPU + qualifying -> pallas
    assert attn_mod._default_impl(q) == "pallas"
