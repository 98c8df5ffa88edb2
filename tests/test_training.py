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
