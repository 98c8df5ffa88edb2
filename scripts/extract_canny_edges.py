"""Extract a Canny-edge control video from an input video.

Parity: /root/reference/scripts/utils/extract_canny_edges.py:40-120 — load
the clip at the goal-force geometry (default 81 frames, 480x832, frame count
rounded to %4==1 like the dataset time_division contract), run the exact
Canny annotator per frame, and save as an mp4 control video.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from goal_force_tpu.controlnets import Annotator
from goal_force_tpu.data.video_io import load_video, save_video


def extract_canny_edges(input_video_path: str, output_video_path: str,
                        num_frames: int, height: int = 480, width: int = 832,
                        low: int = 100, high: int = 200) -> np.ndarray:
    if not os.path.exists(input_video_path):
        raise FileNotFoundError(f"Input video file not found: {input_video_path}")
    out_dir = os.path.dirname(output_video_path)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    # time_division_factor=4, remainder=1 (reference dataset contract)
    if num_frames % 4 != 1:
        num_frames = max(1, (num_frames // 4) * 4 + 1)

    import cv2

    frames = load_video(input_video_path, num_frames)  # (T, H, W, 3) [0,1]
    frames = np.stack([
        cv2.resize(f, (width, height), interpolation=cv2.INTER_AREA)
        for f in frames
    ])
    annotator = Annotator("canny", low=low, high=high)
    canny = np.stack([annotator((f * 255).astype(np.uint8)) for f in frames])
    save_video((canny * 255).astype(np.uint8), output_video_path,
               fps=15, quality=5)
    print(f"Canny edge video shape: {canny.shape}")
    print(f"Successfully saved Canny edge video to: {output_video_path}")
    return canny


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", "-i", type=str, required=True)
    parser.add_argument("--output", "-o", type=str, required=True)
    parser.add_argument("--num_frames", "-n", type=int, default=81)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--width", type=int, default=832)
    parser.add_argument("--low", type=int, default=100)
    parser.add_argument("--high", type=int, default=200)
    args = parser.parse_args()
    try:
        extract_canny_edges(args.input, args.output, args.num_frames,
                            args.height, args.width, args.low, args.high)
    except Exception as e:
        print(f"Error: {e}")
        sys.exit(1)


if __name__ == "__main__":
    main()
