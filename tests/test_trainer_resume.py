"""Trainer resume roundtrip (VERDICT round-2 weak #8).

The reference resumes by reloading the latest step-K.safetensors and
fast-forwarding the step counter parsed from the filename
(/root/reference/src/goal_force/utils.py:786-790,
scripts/train/resume_training_goal_force.sh). Verified here end-to-end:
train 2 steps -> checkpoint -> resume -> the continued run starts at K,
trains on the reloaded weights, and saves K+1."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu import configs
from goal_force_tpu.io.safetensors_io import (
    checkpoint_step,
    find_latest_checkpoint,
    load_goalforce_controlnet,
)
from goal_force_tpu.models import controlnet as cnm
from goal_force_tpu.models import t5 as t5m
from goal_force_tpu.models import vae as vaem
from goal_force_tpu.models import wan_dit
from goal_force_tpu.models.tokenizer import HashTokenizer
from goal_force_tpu.training.trainer import TrainerConfig, train


@pytest.fixture(scope="module")
def setup():
    dit_cfg, t5_cfg, vae_cfg, cn_cfg = configs.tiny_pipeline_configs()
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    dit = wan_dit.init_wan_dit(ks[0], dit_cfg, jnp.float32)
    frozen = {
        "dit": dit,
        "t5": t5m.init_t5(ks[1], t5_cfg, jnp.float32),
        "vae": vaem.init_vae(ks[2], vae_cfg, jnp.float32),
    }
    cn0 = cnm.init_from_dit(ks[3], dit, dit_cfg, cn_cfg, jnp.float32)
    rng = np.random.default_rng(0)
    dataset = [
        {"video": rng.uniform(0, 1, (5, 32, 32, 3)).astype(np.float32),
         "control_video": rng.uniform(0, 1, (5, 32, 32, 3)).astype(np.float32),
         "prompt": "a ball rolls"}
        for _ in range(3)
    ]
    return dit_cfg, t5_cfg, vae_cfg, cn_cfg, frozen, cn0, dataset


def test_train_save_resume_continues_from_checkpoint(setup, tmp_path):
    dit_cfg, t5_cfg, vae_cfg, cn_cfg, frozen, cn0, dataset = setup
    tok = HashTokenizer(t5_cfg.vocab, t5_cfg.text_len)
    cfg = TrainerConfig(output_dir=str(tmp_path), num_epochs=10, save_steps=2,
                        log_every=1, num_frames=5, height=32, width=32,
                        lr=1e-3)

    state = train(cfg, dit_cfg, t5_cfg, vae_cfg, cn_cfg, frozen, cn0, dataset,
                  tok, max_steps=2)
    assert int(state.step) == 2
    first = find_latest_checkpoint(str(tmp_path))
    assert first is not None and checkpoint_step(first) == 2
    trained = jax.tree_util.tree_map(np.asarray, state.params)

    # resume: fresh cn0 is REPLACED by the checkpoint, step fast-forwards to 2
    state2 = train(cfg, dit_cfg, t5_cfg, vae_cfg, cn_cfg, frozen, cn0, dataset,
                   tok, resume=True, max_steps=1)
    assert int(state2.step) == 3
    ckpts = sorted(glob.glob(os.path.join(str(tmp_path), "step-*.safetensors")))
    assert any(checkpoint_step(p) == 3 for p in ckpts)

    # the resumed run really started from the trained weights: reload the
    # step-2 export and compare to the state we saved (roundtrip through the
    # reference-format converter)
    back = load_goalforce_controlnet(first, cn_cfg)
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(trained)):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-6)


def test_full_state_resume_bit_identical(setup, tmp_path):
    """Kill-and-resume == uninterrupted, bit for bit (VERDICT round-3 #8).

    The full state-K.safetensors carries params + Adam moments + counters and
    the trainer replays the data order/rng of the trained steps, so resuming
    after an interruption produces EXACTLY the state an uninterrupted run
    reaches — something the reference cannot do (it drops optimizer state,
    /root/reference/src/goal_force/utils.py:786-790)."""
    dit_cfg, t5_cfg, vae_cfg, cn_cfg, frozen, cn0, dataset = setup
    tok = HashTokenizer(t5_cfg.vocab, t5_cfg.text_len)

    def run(out_dir, **kw):
        cfg = TrainerConfig(output_dir=str(out_dir), num_epochs=10,
                            save_steps=2, log_every=1, num_frames=5,
                            height=32, width=32, lr=1e-3)
        return train(cfg, dit_cfg, t5_cfg, vae_cfg, cn_cfg, frozen, cn0,
                     dataset, tok, **kw)

    state_a = run(tmp_path / "uninterrupted", max_steps=4)

    run(tmp_path / "resumed", max_steps=2)          # "killed" after 2 steps
    assert os.path.exists(os.path.join(str(tmp_path / "resumed"),
                                       "state-2.safetensors"))
    state_b = run(tmp_path / "resumed", resume=True, max_steps=2)

    assert int(state_a.step) == int(state_b.step) == 4
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state_a.opt_state),
                    jax.tree_util.tree_leaves(state_b.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_state_roundtrip_and_mismatch_guard(setup, tmp_path):
    from goal_force_tpu.io.safetensors_io import (
        load_train_state,
        save_train_state,
    )
    from goal_force_tpu.training.train_step import TrainState, make_optimizer

    _, _, _, _, _, cn0, _ = setup
    opt = make_optimizer(1e-3)
    trainable = jax.tree_util.tree_map(jnp.asarray, cn0)
    state = TrainState(trainable, opt.init(trainable),
                       jnp.asarray(7, jnp.int32))
    path = str(tmp_path / "state-7.safetensors")
    save_train_state(state, path)

    template = TrainState(trainable, opt.init(trainable),
                          jnp.asarray(0, jnp.int32))
    back = load_train_state(path, template)
    assert int(back.step) == 7
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a different optimizer shape must fail loudly, not silently load
    opt2 = make_optimizer(1e-3, grad_accum_steps=2)
    bad = TrainState(trainable, opt2.init(trainable),
                     jnp.asarray(0, jnp.int32))
    with pytest.raises((KeyError, ValueError)):
        load_train_state(path, bad)


def test_trainer_lora_mode_saves_peft_and_resumes(setup, tmp_path):
    from goal_force_tpu.io.safetensors_io import load_safetensors

    dit_cfg, t5_cfg, vae_cfg, cn_cfg, frozen, cn0, dataset = setup
    tok = HashTokenizer(t5_cfg.vocab, t5_cfg.text_len)
    cfg = TrainerConfig(output_dir=str(tmp_path), num_epochs=10, save_steps=2,
                        log_every=1, num_frames=5, height=32, width=32,
                        lr=1e-3, train_lora=True, lora_rank=2)

    state = train(cfg, dit_cfg, t5_cfg, vae_cfg, None, frozen, None, dataset,
                  tok, max_steps=2)
    assert int(state.step) == 2
    ck = find_latest_checkpoint(str(tmp_path))
    sd = load_safetensors(ck)
    assert all(".lora_" in k for k in sd)       # PEFT-format export
    # adapters actually trained (B factors off zero)
    assert any(np.abs(v).max() > 0 for k, v in sd.items() if ".lora_B." in k)

    state2 = train(cfg, dit_cfg, t5_cfg, vae_cfg, None, frozen, None, dataset,
                   tok, resume=True, max_steps=1)
    assert int(state2.step) == 3


def test_state_checkpoint_retention_prunes_old_files(setup, tmp_path):
    """ADVICE r4 item 3: full state-K files (3x trainable size) are pruned to
    keep_last_states after each save; reference-format step-K files keep."""
    dit_cfg, t5_cfg, vae_cfg, cn_cfg, frozen, cn0, dataset = setup
    tok = HashTokenizer(t5_cfg.vocab, t5_cfg.text_len)
    cfg = TrainerConfig(output_dir=str(tmp_path), num_epochs=10, save_steps=1,
                        log_every=1, num_frames=5, height=32, width=32,
                        lr=1e-3, keep_last_states=2)
    train(cfg, dit_cfg, t5_cfg, vae_cfg, cn_cfg, frozen, cn0, dataset, tok,
          max_steps=4)
    states = sorted(glob.glob(os.path.join(str(tmp_path), "state-*.safetensors")))
    steps = sorted(glob.glob(os.path.join(str(tmp_path), "step-*.safetensors")))
    assert len(states) == 2, states          # only the 2 newest full states
    assert os.path.basename(states[-1]) == "state-4.safetensors"
    assert len(steps) == 4, steps            # every reference-format ckpt kept
