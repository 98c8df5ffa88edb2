#!/usr/bin/env python
"""Base-model smoke test: 'if this outputs a video, your setup works'.

Contract parity with
/root/reference/scripts/inference/inference-Wan2.2-I2V-A14B-base-model-demo.py:
generate a short clip from a prompt + first frame with NO ControlNet (the base Wan2.2
path). With --tiny_random it runs on random weights (environment check only).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prompt", default="a cat walks on the grass, realistic")
    p.add_argument("--image", default=None, help="first-frame image (random if omitted)")
    p.add_argument("--output", default="demo.mp4")
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--seed", type=int, default=0)
    # real weights
    p.add_argument("--high_noise_model", default=None)
    p.add_argument("--low_noise_model", default=None)
    p.add_argument("--t5_path", default=None)
    p.add_argument("--vae_path", default=None)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--tiny_random", action="store_true",
                   help="random tiny weights: environment smoke test only")
    args = p.parse_args()

    from goal_force_tpu import configs
    from goal_force_tpu.configs import PipelineConfig
    from goal_force_tpu.data.video_io import load_image, save_video
    from goal_force_tpu.pipelines import GoalForcePipeline

    pc = PipelineConfig(height=args.height, width=args.width, num_frames=args.num_frames,
                        num_inference_steps=args.num_inference_steps)
    if args.tiny_random:
        import jax

        dit_cfg, t5_cfg, vae_cfg, cn_cfg = configs.tiny_pipeline_configs()
        pipe = GoalForcePipeline.init_random(
            jax.random.PRNGKey(0), dit_cfg=dit_cfg, t5_cfg=t5_cfg, vae_cfg=vae_cfg,
            cn_cfg=None, pipe_cfg=pc,
        )
    else:
        assert args.high_noise_model, "--high_noise_model required (or --tiny_random)"
        pipe = GoalForcePipeline.from_pretrained(
            args.high_noise_model, low_noise_model=args.low_noise_model,
            t5_path=args.t5_path, vae_path=args.vae_path,
            controlnet_num_layers=0, tokenizer_path=args.tokenizer_path, pipe_cfg=pc,
        )

    if args.image:
        image = load_image(args.image, size=(args.width, args.height))
    else:
        image = np.random.default_rng(args.seed).uniform(
            size=(args.height, args.width, 3)).astype(np.float32)

    video = pipe(args.prompt, image, controlnet=False, seed=args.seed, progress=True)
    save_video(video, args.output, fps=pc.fps, quality=5)
    print(f"wrote {args.output} — if this plays, your setup works")


if __name__ == "__main__":
    main()
