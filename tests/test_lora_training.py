"""LoRA training paths (VERDICT round-2 #5/#6).

1. goal-force: train_step with trainable LoRA adapters merged into the frozen
   DiT inside jit — only adapters update, loss decreases, PEFT export/import
   roundtrips (reference: src/goal_force/utils.py:450-470 PEFT injection,
   scripts/train/train.py:17 --lora_base_model).
2. family-generic trainer: the same contract over Flux and SD tiny pipelines
   through training/generic.py (reference: diffsynth/trainers/utils.py:366-628
   general DiffusionTrainingModule).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from goal_force_tpu import configs
from goal_force_tpu.training.generic import (
    DEFAULT_PATTERN,
    GenericTrainState,
    init_generic_lora,
    lora_flat_state_dict,
    lora_state_dict_to_tree,
    make_generic_train_step,
    merge_generic_lora,
    train,
)


def _tree_equal(a, b):
    return all(bool(jnp.all(x == y)) for x, y in
               zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def test_goal_force_lora_training_only_updates_adapters():
    from goal_force_tpu.lora import init_lora, lora_from_peft, lora_to_peft
    from goal_force_tpu.models import t5 as t5m
    from goal_force_tpu.models import vae as vaem
    from goal_force_tpu.models import wan_dit
    from goal_force_tpu.training import TrainState, make_optimizer
    from goal_force_tpu.training.train_step import make_train_step

    dit_cfg, t5_cfg, vae_cfg, _ = configs.tiny_pipeline_configs()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    frozen = {
        "dit": wan_dit.init_wan_dit(ks[0], dit_cfg, jnp.float32),
        "t5": t5m.init_t5(ks[1], t5_cfg, jnp.float32),
        "vae": vaem.init_vae(ks[2], vae_cfg, jnp.float32),
    }
    lora0 = init_lora(ks[3], frozen["dit"], rank=4)
    lora0_np = jax.tree_util.tree_map(np.asarray, lora0)  # survives donation
    opt = make_optimizer(lr=2e-3)
    step = make_train_step(dit_cfg, t5_cfg, vae_cfg, None, opt, num_frames=5,
                           train_lora=True)
    state = TrainState({"lora": lora0}, opt.init({"lora": lora0}),
                       jnp.zeros((), jnp.int32))

    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.uniform(-1, 1, (1, 5, 32, 32, 3)), jnp.float32),
        "control": jnp.asarray(rng.uniform(-1, 1, (1, 5, 32, 32, 3)), jnp.float32),
        "ids": jnp.asarray(rng.integers(2, t5_cfg.vocab, (1, t5_cfg.text_len)),
                           jnp.int32),
        "mask": jnp.ones((1, t5_cfg.text_len), jnp.int32),
    }
    losses = []
    for i in range(6):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(7))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    # only LoRA leaves updated; B factors moved off zero
    assert not _tree_equal(state.params["lora"], lora0_np)
    assert any(float(jnp.abs(ab["b"]).max()) > 0
               for ab in state.params["lora"].values())

    # PEFT export -> reload roundtrip
    sd = lora_to_peft(state.params["lora"])
    back = lora_from_peft(sd, num_layers=dit_cfg.num_layers)
    for name in state.params["lora"]:
        np.testing.assert_allclose(np.asarray(back[name]["a"]),
                                   np.asarray(state.params["lora"][name]["a"]),
                                   rtol=1e-6)


def _flow_lora_case(forward, params0, lora_key, batch_shape, pattern):
    lora0 = init_generic_lora(lora_key, params0, pattern=pattern, rank=4)
    opt = optax.adam(2e-3)

    def loss_fn(lora, batch, rng):
        merged = merge_generic_lora(params0, lora)
        pred = forward(merged, batch)
        return jnp.mean((pred.astype(jnp.float32)
                         - batch["target"].astype(jnp.float32)) ** 2)

    step = make_generic_train_step(loss_fn, opt)
    state = GenericTrainState(lora0, opt.init(lora0), jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(rng.normal(size=s).astype(np.float32))
             for k, s in batch_shape.items()}
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch, jax.random.PRNGKey(3))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0], losses
    return state, lora0, batch, loss_fn


def test_generic_trainer_flux_lora():
    from goal_force_tpu.models.flux_dit import flux_dit_forward, init_flux_dit
    from goal_force_tpu.pipelines.flux import tiny_flux_configs

    cfg, _, _ = tiny_flux_configs()
    params = init_flux_dit(jax.random.PRNGKey(0), cfg, jnp.float32)

    def forward(p, batch):
        return flux_dit_forward(
            p, cfg, batch["latents"], jnp.full((1,), 500.0),
            batch["prompt"], batch["pooled"], jnp.full((1,), 3.5),
            attn_impl="xla")

    state, lora0, batch, loss_fn = _flow_lora_case(
        forward, params,
        jax.random.PRNGKey(1),
        {"latents": (1, 8, 12, 16), "prompt": (1, 9, cfg.text_dim),
         "pooled": (1, cfg.pooled_dim), "target": (1, 8, 12, 16)},
        DEFAULT_PATTERN)
    # adapters cover both streams of the MMDiT
    paths = set(state.params)
    assert any("single_blocks" in p for p in paths)
    assert any(".attn." in p for p in paths)

    # flat export -> reload roundtrip preserves values
    sd = lora_flat_state_dict(state.params)
    back = lora_state_dict_to_tree(sd)
    assert set(back) == set(state.params)
    for p in paths:
        np.testing.assert_allclose(np.asarray(back[p]["a"]),
                                   np.asarray(state.params[p]["a"]), rtol=1e-6)


def test_generic_trainer_sd_lora():
    from goal_force_tpu.models.sd_unet import (
        init_sd_unet,
        sd_unet_apply,
        tiny_sd_plan,
    )

    plan = tiny_sd_plan()
    params = init_sd_unet(jax.random.PRNGKey(0), plan, model_dim=8,
                          time_dim=16, groups=4, dtype=jnp.float32)

    def forward(p, batch):
        return sd_unet_apply(p, plan, batch["latents"],
                             jnp.full((1,), 500.0, jnp.float32),
                             batch["ctx"], groups=4)

    state, lora0, batch, loss_fn = _flow_lora_case(
        forward, params,
        jax.random.PRNGKey(2),
        {"latents": (1, 16, 16, 4), "ctx": (1, 7, 24),
         "target": (1, 16, 16, 4)},
        DEFAULT_PATTERN)
    assert any("attn2" in p for p in state.params)   # cross-attn adapted


def test_generic_train_loop_saves_checkpoints(tmp_path):
    from goal_force_tpu.io.safetensors_io import load_safetensors
    from goal_force_tpu.models.sd_unet import (
        init_sd_unet,
        sd_unet_apply,
        tiny_sd_plan,
    )

    plan = tiny_sd_plan()
    params = init_sd_unet(jax.random.PRNGKey(0), plan, model_dim=8,
                          time_dim=16, groups=4, dtype=jnp.float32)
    lora0 = init_generic_lora(jax.random.PRNGKey(1), params, rank=2)
    opt = optax.adam(1e-3)

    def loss_fn(lora, batch, rng):
        merged = merge_generic_lora(params, lora)
        out = sd_unet_apply(merged, plan, batch["latents"],
                            jnp.full((1,), 100.0, jnp.float32), batch["ctx"],
                            groups=4)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    step = make_generic_train_step(loss_fn, opt)
    state = GenericTrainState(lora0, opt.init(lora0), jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(0)
    batch = {"latents": jnp.asarray(rng.normal(size=(1, 16, 16, 4)), jnp.float32),
             "ctx": jnp.asarray(rng.normal(size=(1, 7, 24)), jnp.float32)}
    logs = []
    state = train(step, state, [batch, batch], jax.random.PRNGKey(5),
                  num_epochs=2, save_every=2, save_dir=str(tmp_path),
                  log_every=1, on_log=lambda s, m: logs.append((s, m)))
    assert int(state.step) == 4 and len(logs) == 4
    ck = load_safetensors(str(tmp_path / "step-4.safetensors"))
    assert any(k.endswith(".lora_A.weight") for k in ck)
