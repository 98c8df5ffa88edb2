"""Expert host staging: swap flips residency without changing values."""

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.parallel.host_staging import ExpertStager, stage_to_device, stage_to_host


def test_swap_preserves_values():
    a = {"w": jnp.arange(8.0)}
    b = {"w": jnp.arange(8.0) * 2}
    stager = ExpertStager(a, b)
    np.testing.assert_array_equal(np.asarray(stager.active["w"]), np.arange(8.0))
    active = stager.swap()
    np.testing.assert_array_equal(np.asarray(active["w"]), np.arange(8.0) * 2)
    active = stager.swap()
    np.testing.assert_array_equal(np.asarray(active["w"]), np.arange(8.0))


def test_stage_roundtrip():
    t = {"x": jnp.ones((4, 4))}
    host = stage_to_host(t)
    dev = stage_to_device(host)
    np.testing.assert_array_equal(np.asarray(dev["x"]), np.ones((4, 4)))
