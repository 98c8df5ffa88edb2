"""Ring attention over a 4-device sequence axis vs single-device full attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from goal_force_tpu.ops.attention import _xla_attention
from goal_force_tpu.parallel import make_mesh
from goal_force_tpu.parallel.ring_attention import ring_attention

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")


def test_ring_matches_full_attention():
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    mesh = make_mesh(dp=1, sp=4, tp=1)
    rng = np.random.default_rng(0)
    B, S, N, H = 1, 64, 2, 16
    q = jnp.asarray(rng.normal(size=(B, S, N, H)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, N, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, N, H)).astype(np.float32))

    ref = _xla_attention(q, k, v, H**-0.5)

    fn = shard_map(
        lambda q_, k_, v_: ring_attention(q_, k_, v_, H**-0.5, "sp", 4, impl="xla"),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"),
    )
    got = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
