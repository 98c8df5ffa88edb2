"""Sharded execution on the 8-device CPU mesh: inference step + full train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from goal_force_tpu import configs
from goal_force_tpu.models import controlnet as cnm
from goal_force_tpu.models import t5 as t5m
from goal_force_tpu.models import vae as vaem
from goal_force_tpu.models import wan_dit
from goal_force_tpu.parallel import fsdp_specs, inference_param_specs, make_mesh, place, use_mesh
from goal_force_tpu.pipelines.model_fn import denoise_forward


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_sharded_denoise_forward_matches_single():
    dit_cfg, t5_cfg, vae_cfg, cn_cfg = configs.tiny_pipeline_configs()
    key = jax.random.PRNGKey(0)
    dit = wan_dit.init_wan_dit(key, dit_cfg, jnp.float32)
    cn = cnm.init_from_dit(key, dit, dit_cfg, cn_cfg, jnp.float32)
    # make zero convs nonzero so the controlnet path matters
    cn["zero_convs"]["w"] = jnp.ones_like(cn["zero_convs"]["w"]) * 0.01

    b, f, h, w = 2, 3, 8, 12
    x = jax.random.normal(key, (b, f, h, w, vae_cfg.z_dim), jnp.float32)
    y = jax.random.normal(key, (b, f, h, w, vae_cfg.z_dim + 4), jnp.float32)
    cl = jax.random.normal(key, (b, f, h, w, vae_cfg.z_dim), jnp.float32)
    ctx = jax.random.normal(key, (b, 8, dit_cfg.text_dim), jnp.float32)
    t = jnp.array([500.0, 500.0])

    ref = denoise_forward(dit, dit_cfg, x, t, ctx, y=y, controlnet_params=cn,
                          controlnet_cfg=cn_cfg, control_latents=cl, attn_impl="xla")

    mesh = make_mesh(dp=2, sp=2, tp=2)
    specs = inference_param_specs(dit)
    dit_s = place(dit, mesh, specs)
    cn_s = place(cn, mesh, inference_param_specs(cn))
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    with use_mesh(mesh):
        fn = jax.jit(lambda d, c, x_, t_, ctx_, y_, cl_: denoise_forward(
            d, dit_cfg, x_, t_, ctx_, y=y_, controlnet_params=c,
            controlnet_cfg=cn_cfg, control_latents=cl_, attn_impl="xla"))
        got = fn(dit_s, cn_s, xs, t, ctx, y, cl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_sharded_train_step_runs():
    from goal_force_tpu.training import TrainState, make_optimizer, make_train_step

    dit_cfg, t5_cfg, vae_cfg, cn_cfg = configs.tiny_pipeline_configs()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    dit = wan_dit.init_wan_dit(ks[0], dit_cfg, jnp.float32)
    frozen = {
        "dit": dit,
        "t5": t5m.init_t5(ks[1], t5_cfg, jnp.float32),
        "vae": vaem.init_vae(ks[2], vae_cfg, jnp.float32),
    }
    cn = cnm.init_from_dit(ks[3], dit, dit_cfg, cn_cfg, jnp.float32)

    mesh = make_mesh(dp=2, sp=2, tp=2)
    frozen = place(frozen, mesh, fsdp_specs(frozen, mesh, min_size=1024))
    cn = place(cn, mesh, fsdp_specs(cn, mesh, min_size=1024))

    opt = make_optimizer()
    step = make_train_step(dit_cfg, t5_cfg, vae_cfg, cn_cfg, opt, num_frames=5)
    state = TrainState(cn, opt.init(cn), jnp.zeros((), jnp.int32))

    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.uniform(-1, 1, (2, 5, 32, 32, 3)).astype(np.float32)),
        "control": jnp.asarray(rng.uniform(-1, 1, (2, 5, 32, 32, 3)).astype(np.float32)),
        "ids": jnp.asarray(rng.integers(2, t5_cfg.vocab, (2, t5_cfg.text_len)), jnp.int32),
        "mask": jnp.ones((2, t5_cfg.text_len), jnp.int32),
    }
    batch["video"] = jax.device_put(batch["video"], NamedSharding(mesh, P("dp")))
    batch["control"] = jax.device_put(batch["control"], NamedSharding(mesh, P("dp")))

    with use_mesh(mesh):
        state2, metrics = step(state, frozen, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
