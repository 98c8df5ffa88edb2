"""Training harness: epoch/step loop, metrics logging, checkpointing, resume.

Parity with launch_training_task + ModelLogger
(/root/reference/src/goal_force/utils.py:428-826): AdamW + constant LR, bad-sample skip,
metrics every `log_every` steps, trainable-only safetensors checkpoints every `save_steps`
named step-K.safetensors, resume by reloading the latest checkpoint and fast-forwarding the
step counter. wandb is optional (not in this image); metrics always go to a JSONL file.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.io.safetensors_io import (
    checkpoint_step,
    export_goalforce_controlnet,
    find_latest_checkpoint,
    load_goalforce_controlnet,
    load_train_state,
    save_safetensors,
    save_train_state,
    train_state_path,
)
from goal_force_tpu.training.train_step import TrainState, make_optimizer, make_train_step


class MetricsLogger:
    """JSONL metrics (wandb-compatible record shape); logs every `log_every` steps
    (reference logs loss/lr/grad_norm every 10 — utils.py:600-614)."""

    def __init__(self, output_dir: str, log_every: int = 10, use_wandb: bool = False,
                 project: Optional[str] = None, run_name: Optional[str] = None,
                 config: Optional[dict] = None):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self.log_every = log_every
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb.init(project=project, name=run_name, config=config)
            except ImportError:
                print("wandb not installed; logging to JSONL only")

    def log(self, step: int, metrics: Dict):
        if step % self.log_every != 0:
            return
        rec = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.wandb is not None:
            self.wandb.log(rec, step=step)


@dataclasses.dataclass
class TrainerConfig:
    output_dir: str = "runs/goal_force"
    lr: float = 1e-5                    # train_goal_force.sh
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    # micro-batches averaged per optimizer step (reference
    # --gradient_accumulation_steps, utils.py:742-844)
    grad_accum_steps: int = 1
    num_epochs: int = 2
    save_steps: int = 500
    log_every: int = 10
    max_timestep_boundary: float = 0.358
    min_timestep_boundary: float = 0.0
    num_frames: int = 81
    height: int = 480
    width: int = 832
    seed: int = 0
    # LoRA training (reference --lora_base_model / rank, utils.py:450-470):
    # adapters on the frozen high-noise DiT, trained alongside (or instead
    # of) the ControlNet; checkpoints export in PEFT key format
    train_lora: bool = False
    lora_rank: int = 32
    # pipeline-parallel microbatches (mesh must have a "pp" axis > 1)
    pp_microbatches: Optional[int] = None
    # full state-K.safetensors files (params + Adam moments, ~3x trainable
    # size) kept on disk; older ones are pruned after each successful save.
    # The reference-format step-K.safetensors files are never pruned. <= 0
    # keeps everything.
    keep_last_states: int = 2
    use_wandb: bool = False
    wandb_project: Optional[str] = None
    run_name: Optional[str] = None


def train(
    cfg: TrainerConfig,
    dit_cfg,
    t5_cfg,
    vae_cfg,
    cn_cfg,
    frozen: Dict,                  # {dit, t5, vae} param trees
    cn_params: Dict,               # trainable ControlNet init
    dataset,                       # yields dicts with video/control_video/prompt
    tokenizer,
    resume: bool = False,
    max_steps: Optional[int] = None,
    mesh=None,
) -> TrainState:
    """Run the training loop; returns the final state."""
    from goal_force_tpu.data.datasets import should_skip
    from goal_force_tpu.parallel import use_mesh

    optimizer = make_optimizer(cfg.lr, cfg.weight_decay, cfg.grad_clip,
                               grad_accum_steps=cfg.grad_accum_steps)
    step_fn = make_train_step(
        dit_cfg, t5_cfg, vae_cfg, cn_cfg, optimizer,
        num_frames=cfg.num_frames,
        max_timestep_boundary=cfg.max_timestep_boundary,
        min_timestep_boundary=cfg.min_timestep_boundary,
        train_lora=cfg.train_lora,
        pp_microbatches=cfg.pp_microbatches,
    )

    start_step = 0
    resume_lora = None
    full_state_file = None
    if resume:
        latest = find_latest_checkpoint(cfg.output_dir)
        if latest is not None:
            print(f"resuming from {latest}")
            start_step = checkpoint_step(latest)
            # prefer the FULL state-K file (params + Adam moments + step) —
            # resume is then bit-identical to an uninterrupted run; the
            # reference-format step-K file alone loses optimizer state, as
            # the reference itself does (utils.py:786-790)
            cand = train_state_path(cfg.output_dir, start_step)
            if os.path.exists(cand):
                full_state_file = cand
            elif cfg.train_lora:
                from goal_force_tpu.io.safetensors_io import load_safetensors
                from goal_force_tpu.lora import lora_from_peft

                resume_lora = lora_from_peft(load_safetensors(latest),
                                             dit_cfg.num_layers)
            else:
                cn_params = load_goalforce_controlnet(latest, cn_cfg)
                cn_params = jax.tree_util.tree_map(jnp.asarray, cn_params)

    if cfg.train_lora:
        from goal_force_tpu.lora import init_lora

        lora0 = resume_lora if resume_lora is not None else init_lora(
            jax.random.PRNGKey(cfg.seed + 1), frozen["dit"],
            rank=cfg.lora_rank)
        trainable = {"lora": lora0}
        if cn_cfg is not None and cn_params is not None:
            trainable["controlnet"] = cn_params
    else:
        trainable = cn_params
    # COPY, don't alias: the train step donates its TrainState, and a donated
    # alias of the caller's init params would delete the caller's buffers
    trainable = jax.tree_util.tree_map(lambda a: jnp.asarray(a).copy(),
                                       trainable)
    state = TrainState(
        trainable,
        optimizer.init(trainable),
        jnp.asarray(start_step, jnp.int32),
    )
    if full_state_file is not None:
        state = load_train_state(full_state_file, state)
    logger = MetricsLogger(cfg.output_dir, cfg.log_every, cfg.use_wandb,
                           cfg.wandb_project, cfg.run_name, dataclasses.asdict(cfg))

    rng = jax.random.PRNGKey(cfg.seed)
    # Replay the data order + rng splits of the already-trained steps so a
    # resumed run continues EXACTLY where the interrupted one left off (the
    # reference restarts its dataloader from scratch on resume). Replay is
    # host-only: no tokenization, no device work.
    replay = start_step if full_state_file is not None else 0
    step = 0 if full_state_file is not None else start_step
    ctx = use_mesh(mesh) if mesh is not None else _nullcontext()
    with ctx:
        for epoch in range(cfg.num_epochs):
            order = np.random.default_rng(cfg.seed + epoch).permutation(len(dataset))
            for i in order:
                sample = dataset[int(i)]
                if should_skip(sample, cfg.num_frames, cfg.height, cfg.width):
                    continue
                rng, sub = jax.random.split(rng)
                step += 1
                if step <= replay:
                    continue
                ids, mask = tokenizer([sample["prompt"]])
                batch = {
                    "video": jnp.asarray(sample["video"] * 2.0 - 1.0)[None],
                    "control": jnp.asarray(sample["control_video"] * 2.0 - 1.0)[None],
                    "ids": jnp.asarray(ids),
                    "mask": jnp.asarray(mask),
                }
                t0 = time.time()
                state, metrics = step_fn(state, frozen, batch, sub)
                metrics = {**metrics, "lr": cfg.lr, "step_time": time.time() - t0}
                logger.log(step, metrics)
                saved = False
                if step % cfg.save_steps == 0:
                    save_checkpoint(state, cn_cfg, cfg.output_dir, step,
                                    dit_cfg.patch_size, lora=cfg.train_lora,
                                    keep_states=cfg.keep_last_states)
                    saved = True
                if max_steps is not None and step - start_step >= max_steps:
                    if not saved:
                        save_checkpoint(state, cn_cfg, cfg.output_dir, step,
                                        dit_cfg.patch_size, lora=cfg.train_lora,
                                        keep_states=cfg.keep_last_states)
                    return state
    save_checkpoint(state, cn_cfg, cfg.output_dir, step, dit_cfg.patch_size,
                    lora=cfg.train_lora, keep_states=cfg.keep_last_states)
    return state


def save_checkpoint(state: TrainState, cn_cfg, output_dir: str, step: int,
                    patch=(1, 2, 2), lora: bool = False, keep_states: int = 2):
    """Trainable-only, reference-compatible step-K.safetensors
    (utils.py:600-617) PLUS a full state-K.safetensors carrying the optimizer
    state so resume is bit-identical (the reference drops Adam moments,
    utils.py:786-790); LoRA states export in PEFT key format
    (lora_A.default.weight naming, utils.py:465-470). After a successful
    save, state-K files older than the newest `keep_states` are pruned (they
    are ~3x trainable size and exist only for resume); step-K files keep."""
    save_train_state(state, train_state_path(output_dir, step))
    if keep_states and keep_states > 0:
        import re

        pat = re.compile(r"state-(\d+)\.safetensors$")
        steps = sorted(
            int(m.group(1)) for f in os.listdir(output_dir)
            if (m := pat.match(f)))
        for old in steps[:-keep_states]:
            try:
                os.remove(train_state_path(output_dir, old))
            except OSError:
                pass
    host = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), state.params)
    if lora:
        from goal_force_tpu.lora import lora_to_peft

        sd = lora_to_peft(host["lora"])
        if "controlnet" in host:
            sd.update(export_goalforce_controlnet(host["controlnet"], cn_cfg,
                                                  dit_patch=patch))
    else:
        sd = export_goalforce_controlnet(host, cn_cfg, dit_patch=patch)
    path = os.path.join(output_dir, f"step-{step}.safetensors")
    save_safetensors(sd, path)
    print(f"saved {path}")


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
