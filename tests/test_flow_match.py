"""Flow-match schedule parity vs the reference torch implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from goal_force_tpu.schedulers import flow_match as fm

from conftest import load_reference_module, reference_available


def _reference_scheduler(**kwargs):
    mod = load_reference_module("diffsynth/schedulers/flow_match.py", "ref_flow_match")
    return mod.FlowMatchScheduler(**kwargs)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
@pytest.mark.parametrize("num_steps,shift", [(50, 5.0), (30, 3.0), (10, 7.5)])
def test_sigmas_match_reference(num_steps, shift):
    ref = _reference_scheduler(shift=shift, sigma_min=0.0, extra_one_step=True)
    ref.set_timesteps(num_steps, shift=shift)
    ours = fm.make_schedule(num_steps=num_steps, shift=shift, sigma_min=0.0, extra_one_step=True)
    np.testing.assert_allclose(ours.sigmas, ref.sigmas.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(ours.timesteps, ref.timesteps.numpy(), rtol=1e-6, atol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_training_weights_match_reference():
    ref = _reference_scheduler(shift=5.0, sigma_min=0.0, extra_one_step=True)
    ref.set_timesteps(1000, training=True)
    ours = fm.make_schedule(num_steps=1000, shift=5.0, sigma_min=0.0, extra_one_step=True, training=True)
    np.testing.assert_allclose(
        ours.training_weights, ref.linear_timesteps_weights.numpy(), rtol=1e-5, atol=1e-6
    )


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_euler_step_and_add_noise_match_reference():
    import torch

    ref = _reference_scheduler(shift=5.0, sigma_min=0.0, extra_one_step=True)
    ref.set_timesteps(50, shift=5.0)
    ours = fm.make_schedule(num_steps=50, shift=5.0, sigma_min=0.0, extra_one_step=True)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 4, 3, 8, 8)).astype(np.float32)
    v = rng.normal(size=x.shape).astype(np.float32)
    eps = rng.normal(size=x.shape).astype(np.float32)

    for i in [0, 13, 49]:
        t = float(ours.timesteps[i])
        ref_next = ref.step(torch.from_numpy(v), torch.tensor(t), torch.from_numpy(x)).numpy()
        got = np.asarray(fm.euler_step(jnp.asarray(x), jnp.asarray(v), ours.sigmas[i], ours.sigma_next(i)))
        np.testing.assert_allclose(got, ref_next, rtol=1e-5, atol=1e-6)

        ref_noisy = ref.add_noise(torch.from_numpy(x), torch.from_numpy(eps), torch.tensor(t)).numpy()
        got_noisy = np.asarray(fm.add_noise(jnp.asarray(x), jnp.asarray(eps), ours.sigmas[i]))
        np.testing.assert_allclose(got_noisy, ref_noisy, rtol=1e-5, atol=1e-6)


def test_sigma_next_final_is_zero():
    s = fm.make_schedule(num_steps=50)
    assert s.sigma_next(49) == 0.0
    assert s.sigma_next(0) == pytest.approx(float(s.sigmas[1]))


def test_training_target():
    x0 = jnp.ones((2, 2))
    eps = jnp.zeros((2, 2))
    np.testing.assert_allclose(np.asarray(fm.training_target(x0, eps)), -np.ones((2, 2)))
