"""Extract the first frame of a video as the conditioning image.

Parity: /root/reference/scripts/utils/extract_first_frame.py:37-76 — read
frame 0 at 480x832 and save it as an image.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from goal_force_tpu.data.video_io import load_video


def extract_first_frame(input_video_path: str, output_image_path: str,
                        height: int = 480, width: int = 832) -> np.ndarray:
    if not os.path.exists(input_video_path):
        raise FileNotFoundError(f"Input video file not found: {input_video_path}")
    out_dir = os.path.dirname(output_image_path)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    import cv2

    frame = load_video(input_video_path, 1)[0]  # (H, W, 3) [0,1]
    frame = cv2.resize(frame, (width, height), interpolation=cv2.INTER_AREA)
    rgb = (frame * 255).astype(np.uint8)
    cv2.imwrite(output_image_path, cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
    print(f"Successfully saved first frame to: {output_image_path}")
    return rgb


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", "-i", type=str, required=True)
    parser.add_argument("--output", "-o", type=str, required=True)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--width", type=int, default=832)
    args = parser.parse_args()
    try:
        extract_first_frame(args.input, args.output, args.height, args.width)
    except Exception as e:
        print(f"Error: {e}")
        sys.exit(1)


if __name__ == "__main__":
    main()
