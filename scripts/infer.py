#!/usr/bin/env python
"""Goal-force inference CLI.

Contract parity with /root/reference/scripts/inference/inference_goal_force.py: each CSV
row (image, coords, forces, masses, caption) renders an 81-frame 832x480 mp4, plus the
control-signal video, the conditioning frame, the prompt JSON, and a force-annotated copy.
Multi-process CSV sharding (--world_size/--device_id, reference utils.py:26-62) is kept for
fleet runs; on a multi-chip host prefer a single process with a data-axis mesh.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_canny_edge(pipe, args, out_dir, step):
    """Canny-edge control inference (reference scripts/inference/
    inference_canny_edge_control.py:125-183): CSV rows (image, control_video,
    caption) with precomputed canny videos under canny-videos/ and first
    frames under images/."""
    import pandas as pd
    from PIL import Image

    from goal_force_tpu.data.video_io import load_video, save_video

    csvs = split_contiguous(args.example_paths, args.world_size, args.device_id)
    for csv in csvs:
        df = pd.read_csv(csv)
        base_path = os.path.dirname(csv)
        for _, row in df.iterrows():
            image = np.asarray(
                Image.open(os.path.join(base_path, "images", row["image"]))
                .convert("RGB").resize((args.width, args.height)),
                np.float32) / 255.0
            cv_name = row["control_video"]
            frames = load_video(os.path.join(base_path, "canny-videos", cv_name),
                                args.num_frames)
            import cv2

            cv = np.stack([cv2.resize(f, (args.width, args.height),
                                      interpolation=cv2.INTER_AREA) for f in frames])
            root = cv_name.split("_canny.mp4")[0].split(".mp4")[0]
            out = os.path.join(out_dir, f"{root}-canny-output.mp4")
            save_video(cv, os.path.join(out_dir, f"{root}-canny-control-signal.mp4"),
                       fps=15, quality=5)
            Image.fromarray((image * 255).astype(np.uint8)).save(
                os.path.join(out_dir, f"{root}-image-condition.png"))
            video = pipe(row["caption"], image, control_signal_video=cv,
                         seed=args.seed, num_frames=args.num_frames, progress=True)
            save_video(video, out, fps=15, quality=5)
            print("wrote", out)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--control_signal_type", type=str, default="goal_force",
                   choices=["goal_force", "canny_edge"],
                   help="canny_edge: CSVs with (image, control_video, caption) rows "
                        "and precomputed canny videos (reference "
                        "inference_canny_edge_control.py; default num_frames 49 there)")
    p.add_argument("--model_ckpt_path", type=str, default=None,
                   help="trained ControlNet step-K.safetensors (omit => base Wan2.2)")
    p.add_argument("--high_noise_model", type=str, required=True)
    p.add_argument("--low_noise_model", type=str, default=None)
    p.add_argument("--t5_path", type=str, required=True)
    p.add_argument("--vae_path", type=str, required=True)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--example_paths", type=str, nargs="+", required=True, help="CSV files")
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--cfg_scale", type=float, default=5.0)
    p.add_argument("--controlnet_num_layers", type=int, default=10)
    p.add_argument("--device_id", type=int, default=0)
    p.add_argument("--world_size", type=int, default=1)
    p.add_argument("--config_preset", type=str, default="a14b", choices=["a14b", "tiny"],
                   help="'tiny' = test geometry for smoke runs on small weight fixtures")
    return p.parse_args()


def split_contiguous(items, world_size, rank):
    """Contiguous CSV sharding (reference scripts/inference/utils.py:26-62)."""
    n = len(items)
    per = (n + world_size - 1) // world_size
    return items[rank * per:(rank + 1) * per]


def main():
    args = parse_args()
    from goal_force_tpu.configs import PipelineConfig
    from goal_force_tpu.data.datasets import BallsDataset
    from goal_force_tpu.data.video_io import save_video
    from goal_force_tpu.data.viz import add_force_prompt_to_video
    from goal_force_tpu.pipelines import GoalForcePipeline

    pc = PipelineConfig(height=args.height, width=args.width, num_frames=args.num_frames,
                        num_inference_steps=args.num_inference_steps, cfg_scale=args.cfg_scale)
    preset = {}
    if args.config_preset == "tiny":
        from goal_force_tpu import configs as _cfgs

        dit_cfg, t5_cfg, vae_cfg, _ = _cfgs.tiny_pipeline_configs()
        import jax.numpy as jnp

        preset = dict(dit_cfg=dit_cfg, t5_cfg=t5_cfg, vae_cfg=vae_cfg, dtype=jnp.float32)
    pipe = GoalForcePipeline.from_pretrained(
        args.high_noise_model, low_noise_model=args.low_noise_model,
        t5_path=args.t5_path, vae_path=args.vae_path,
        controlnet_checkpoint=args.model_ckpt_path,
        controlnet_num_layers=args.controlnet_num_layers,
        tokenizer_path=args.tokenizer_path, pipe_cfg=pc, **preset,
    )

    step = "base"
    if args.model_ckpt_path:
        step = os.path.basename(args.model_ckpt_path).split(".safetensors")[0].split("-")[-1]
    out_dir = args.output_dir or os.path.join(
        os.path.dirname(args.model_ckpt_path or "."), f"step-{step}-videos")
    os.makedirs(out_dir, exist_ok=True)

    if args.control_signal_type == "canny_edge":
        run_canny_edge(pipe, args, out_dir, step)
        return

    csvs = split_contiguous(args.example_paths, args.world_size, args.device_id)
    for csv in csvs:
        print("processing", csv)
        ds = BallsDataset(os.path.dirname(csv), csv, is_validation_dataset=True,
                          num_frames=args.num_frames, height=args.height, width=args.width)
        # training-set calibration (reference inference_goal_force.py:136-144)
        ds.set_calibration(pc.min_force, pc.max_force, pc.min_mass, pc.max_mass)
        for i in range(len(ds)):
            sample = ds[i]
            if sample is None:
                continue
            spec = sample["spec"]
            fname = (f"step-{step}_{sample['file_id']}"
                     f"__prj_force_{spec.force:.1f}__prj_angle_{spec.angle_deg:.1f}"
                     f"__tgt_force_{spec.target_force:.1f}__seed_{args.seed}")
            base = os.path.join(out_dir, fname)

            save_video(sample["control_video"], base + "-control-signal.mp4", fps=15, quality=5)
            from PIL import Image

            Image.fromarray((sample["video"][0] * 255).astype(np.uint8)).save(
                base + "-image_condition.png")
            with open(base + "-text.json", "w") as f:
                json.dump({"text_prompt": sample["prompt"]}, f, indent=4)

            video = pipe(
                sample["prompt"], sample["video"][0],
                control_signal_video=sample["control_video"],
                seed=args.seed, controlnet=args.model_ckpt_path is not None or True,
                progress=True,
            )
            save_video(video, base + ".mp4", fps=15, quality=5)

            annotated = video
            if spec.force > -1:
                norm = (spec.force - pc.min_force) / (pc.max_force - pc.min_force)
                annotated = add_force_prompt_to_video(
                    annotated, norm, spec.angle_deg, spec.x_pos, 1 - spec.y_pos,
                    num_frames_with_signal=16, color=(255, 0, 0))
            if spec.target_force > -1:
                norm = (spec.target_force - pc.min_force) / (pc.max_force - pc.min_force)
                annotated = add_force_prompt_to_video(
                    annotated, norm, spec.target_angle_deg, spec.target_x_pos,
                    1 - spec.target_y_pos, num_frames_with_signal=16, color=(0, 255, 0))
            save_video(annotated, base + "-with-prompt.mp4", fps=15, quality=5)
            print("wrote", base + ".mp4")


if __name__ == "__main__":
    main()
