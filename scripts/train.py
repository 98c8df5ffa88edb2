#!/usr/bin/env python
"""Goal-force ControlNet training CLI.

Contract parity with /root/reference/scripts/train/train.py + train_goal_force.sh:
Balls+Dominos+Plants concat, 10-layer ControlNet, boundary 0.358, mask probs 0.5,
AdamW lr 1e-5, clip 1.0, checkpoints every 500 steps, resume. DeepSpeed/accelerate
become a mesh: params+optimizer FSDP-sharded, batch over the data axis.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    # model weights
    p.add_argument("--high_noise_model", type=str, required=True)
    p.add_argument("--t5_path", type=str, required=True)
    p.add_argument("--vae_path", type=str, required=True)
    p.add_argument("--tokenizer_path", type=str, default=None)
    # datasets (any subset)
    p.add_argument("--balls_base_path", type=str, default=None)
    p.add_argument("--balls_metadata_path", type=str, default=None)
    p.add_argument("--dominos_base_path", type=str, default=None)
    p.add_argument("--dominos_metadata_path", type=str, default=None)
    p.add_argument("--plants_base_path", type=str, default=None)
    p.add_argument("--plants_metadata_path", type=str, default=None)
    # control-signal masking (train_goal_force.sh:17-19)
    p.add_argument("--p_mask_out_masses", type=float, default=0.5)
    p.add_argument("--p_mask_out_direct_force", type=float, default=0.5)
    p.add_argument("--p_mask_out_indirect_force", type=float, default=0.5)
    # schedule / optimizer (train_goal_force.sh)
    p.add_argument("--controlnet_num_layers", type=int, default=10)
    p.add_argument("--controlnet_stride", type=int, default=None)
    p.add_argument("--max_timestep_boundary", type=float, default=0.358)
    p.add_argument("--min_timestep_boundary", type=float, default=0.0)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--num_epochs", type=int, default=2)
    p.add_argument("--save_steps", type=int, default=500)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--output_path", type=str, default="runs/goal_force")
    p.add_argument("--resume", action="store_true")
    # LoRA training (reference scripts/train/train.py --lora_base_model)
    p.add_argument("--train_lora", action="store_true")
    p.add_argument("--lora_rank", type=int, default=32)
    # shapes
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    # mesh
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages over the DiT trunk "
                        "(GPipe; lets A14B training fit 16 GB v5e chips)")
    p.add_argument("--pp_microbatches", type=int, default=2)
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--wandb_project", type=str, default="goal_force_tpu")
    p.add_argument("--run_name", type=str, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from goal_force_tpu import configs
    from goal_force_tpu.data.datasets import BallsDataset, ConcatDataset, DominosDataset, PlantsDataset
    from goal_force_tpu.io import torch_convert as tc
    from goal_force_tpu.io.safetensors_io import load_safetensors, load_torch_pth
    from goal_force_tpu.models import controlnet as cnm
    from goal_force_tpu.models.tokenizer import load_tokenizer
    from goal_force_tpu.parallel import fsdp_specs, make_mesh, place
    from goal_force_tpu.training.trainer import TrainerConfig, train

    dit_cfg = configs.WAN22_A14B
    t5_cfg = configs.UMT5_XXL
    vae_cfg = configs.WAN21_VAE
    cn_cfg = configs.ControlNetConfig(num_layers=args.controlnet_num_layers,
                                      stride=args.controlnet_stride)

    def _load(path):
        return load_torch_pth(path) if path.endswith((".pth", ".pt")) else load_safetensors(path)

    dtype = jnp.bfloat16
    to_dev = lambda t: jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), t)
    frozen = {
        "dit": to_dev(tc.dit_params_from_torch(_load(args.high_noise_model), dit_cfg)),
        "t5": to_dev(tc.t5_params_from_torch(_load(args.t5_path), t5_cfg)),
        "vae": to_dev(tc.vae_params_from_torch(_load(args.vae_path), vae_cfg)),
    }
    cn = cnm.init_from_dit(jax.random.PRNGKey(0), frozen["dit"], dit_cfg, cn_cfg, dtype)

    mesh = None
    if args.dp * args.sp * args.tp * args.pp > 1:
        mesh = make_mesh(dp=args.dp, sp=args.sp, tp=args.tp, pp=args.pp)
        frozen = place(frozen, mesh, fsdp_specs(frozen, mesh))
        # CN side-stack is not pipelined: keep its layer axis whole
        cn = place(cn, mesh, fsdp_specs(cn, mesh, pin_pp_layers=False))

    masks = dict(
        p_mask_out_direct_force=args.p_mask_out_direct_force,
        p_mask_out_indirect_force=args.p_mask_out_indirect_force,
        p_mask_out_masses=args.p_mask_out_masses,
    )
    shape = dict(num_frames=args.num_frames, height=args.height, width=args.width)
    parts = []
    if args.balls_metadata_path:
        parts.append(BallsDataset(args.balls_base_path, args.balls_metadata_path, **masks, **shape))
    if args.dominos_metadata_path:
        parts.append(DominosDataset(args.dominos_base_path, args.dominos_metadata_path, **masks, **shape))
    if args.plants_metadata_path:
        parts.append(PlantsDataset(args.plants_base_path, args.plants_metadata_path, **shape))
    assert parts, "no datasets configured"
    dataset = ConcatDataset(parts)

    tok = load_tokenizer(args.tokenizer_path, t5_cfg.vocab, t5_cfg.text_len)
    tcfg = TrainerConfig(
        output_dir=args.output_path, lr=args.learning_rate, weight_decay=args.weight_decay,
        grad_clip=args.max_grad_norm, num_epochs=args.num_epochs, save_steps=args.save_steps,
        grad_accum_steps=args.gradient_accumulation_steps,
        max_timestep_boundary=args.max_timestep_boundary,
        train_lora=args.train_lora, lora_rank=args.lora_rank,
        min_timestep_boundary=args.min_timestep_boundary,
        num_frames=args.num_frames, height=args.height, width=args.width,
        use_wandb=args.use_wandb, wandb_project=args.wandb_project, run_name=args.run_name,
        pp_microbatches=args.pp_microbatches if args.pp > 1 else None,
    )
    train(tcfg, dit_cfg, t5_cfg, vae_cfg, cn_cfg, frozen, cn, dataset, tok,
          resume=args.resume, max_steps=args.max_steps, mesh=mesh)


if __name__ == "__main__":
    main()
