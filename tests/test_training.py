"""Training step: loss semantics, ControlNet-only updates, grad flow (tiny, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu import configs
from goal_force_tpu.models import controlnet as cnm
from goal_force_tpu.models import t5 as t5m
from goal_force_tpu.models import vae as vaem
from goal_force_tpu.models import wan_dit
from goal_force_tpu.training import TrainState, make_optimizer, make_train_step


@pytest.fixture(scope="module")
def setup():
    dit_cfg, t5_cfg, vae_cfg, cn_cfg = configs.tiny_pipeline_configs()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    dit = wan_dit.init_wan_dit(ks[0], dit_cfg, jnp.float32)
    frozen = {
        "dit": dit,
        "t5": t5m.init_t5(ks[1], t5_cfg, jnp.float32),
        "vae": vaem.init_vae(ks[2], vae_cfg, jnp.float32),
    }
    # keep the trainable tree as numpy: the train step donates its device buffers
    cn = jax.tree_util.tree_map(np.asarray, cnm.init_from_dit(ks[3], dit, dit_cfg, cn_cfg, jnp.float32))
    return dit_cfg, t5_cfg, vae_cfg, cn_cfg, frozen, cn


def _batch(t5_cfg, b=1, t=5, h=32, w=32):
    rng = np.random.default_rng(0)
    return {
        "video": jnp.asarray(rng.uniform(-1, 1, (b, t, h, w, 3)).astype(np.float32)),
        "control": jnp.asarray(rng.uniform(-1, 1, (b, t, h, w, 3)).astype(np.float32)),
        "ids": jnp.asarray(rng.integers(2, t5_cfg.vocab, (b, t5_cfg.text_len)), jnp.int32),
        "mask": jnp.ones((b, t5_cfg.text_len), jnp.int32),
    }


def test_train_step_updates_only_controlnet(setup):
    dit_cfg, t5_cfg, vae_cfg, cn_cfg, frozen, cn = setup
    opt = make_optimizer()
    step = make_train_step(dit_cfg, t5_cfg, vae_cfg, cn_cfg, opt, num_frames=5)
    cn_before = cn
    cn_dev = jax.tree_util.tree_map(jnp.asarray, cn)
    state = TrainState(cn_dev, opt.init(cn_dev), jnp.zeros((), jnp.int32))
    batch = _batch(t5_cfg)

    state2, metrics = step(state, frozen, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert int(state2.step) == 1
    # zero convs must have moved (they gate the whole ControlNet contribution path:
    # their grads are nonzero because loss depends on injections)
    delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(jnp.asarray(a) - b).max()), cn_before, state2.params
    )
    flat = jax.tree_util.tree_leaves(delta)
    assert max(flat) > 0


def test_timestep_sampled_in_high_noise_window(setup):
    """Boundary 0.358 of DESCENDING timesteps => sampled sigmas stay in the high range."""
    from goal_force_tpu.schedulers import flow_match as fm

    s = fm.make_schedule(num_steps=1000, shift=5.0, sigma_min=0.0,
                         extra_one_step=True, training=True)
    hi = int(0.358 * 1000)
    assert s.sigmas[0] == pytest.approx(1.0)
    # all ids < hi correspond to sigma >= sigma at the boundary
    assert float(s.sigmas[hi - 1]) > 0.85  # shift-5 schedule keeps the window high-noise


def test_grad_norm_clipping(setup):
    dit_cfg, t5_cfg, vae_cfg, cn_cfg, frozen, cn = setup
    import optax

    opt = make_optimizer(grad_clip=1e-12)
    step = make_train_step(dit_cfg, t5_cfg, vae_cfg, cn_cfg, opt, num_frames=5)
    cn_before = cn
    cn_dev = jax.tree_util.tree_map(jnp.asarray, cn)
    state = TrainState(cn_dev, opt.init(cn_dev), jnp.zeros((), jnp.int32))
    state2, _ = step(state, frozen, _batch(t5_cfg), jax.random.PRNGKey(2))
    # with a tiny clip the update magnitude is bounded by adam's lr regardless of grads
    delta = max(
        float(jnp.abs(jnp.asarray(a) - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(cn_before), jax.tree_util.tree_leaves(state2.params))
    )
    assert delta < 1e-2


def test_grad_accumulation_matches_mean_gradient():
    """grad_accum_steps=k: no update until the k-th micro-step, and the
    synced update equals a single step on the mean gradient (reference
    accelerator.accumulate semantics, src/goal_force/utils.py:742-844)."""
    import optax

    params = {"w": jnp.arange(4.0)}
    g1 = {"w": jnp.array([1.0, -2.0, 0.5, 3.0])}
    g2 = {"w": jnp.array([-1.0, 4.0, 0.5, 1.0])}

    acc = make_optimizer(lr=1e-2, grad_clip=100.0, grad_accum_steps=2)
    st = acc.init(params)
    up1, st = acc.update(g1, st, params)
    mid = optax.apply_updates(params, up1)
    # first micro-step: identity
    assert all(float(jnp.abs(a - b).max()) == 0
               for a, b in zip(jax.tree_util.tree_leaves(mid),
                               jax.tree_util.tree_leaves(params)))
    up2, st = acc.update(g2, st, mid)
    got = optax.apply_updates(mid, up2)

    ref = make_optimizer(lr=1e-2, grad_clip=100.0)
    gmean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)
    upr, _ = ref.update(gmean, ref.init(params), params)
    want = optax.apply_updates(params, upr)
    assert float(jnp.abs(got["w"] - want["w"]).max()) < 1e-7


def test_grad_accumulation_through_generic_step():
    from goal_force_tpu.training.generic import (GenericTrainState,
                                                 make_generic_train_step)

    def loss_fn(p, batch, rng):
        return jnp.sum((p["w"] - batch["t"]) ** 2)

    opt = make_optimizer(lr=1e-2, grad_clip=100.0, grad_accum_steps=2)
    params = {"w": jnp.ones((3,))}
    state = GenericTrainState(params, opt.init(params),
                              jnp.zeros((), jnp.int32))
    step = make_generic_train_step(loss_fn, opt)
    b = {"t": jnp.zeros((3,))}
    state, m1 = step(state, b, jax.random.PRNGKey(0))
    assert float(jnp.abs(state.params["w"] - 1.0).max()) == 0  # accumulating
    state, m2 = step(state, b, jax.random.PRNGKey(1))
    assert float(jnp.abs(state.params["w"] - 1.0).max()) > 0   # synced
