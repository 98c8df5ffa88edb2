#!/usr/bin/env python
"""Per-frame fidelity comparison of two videos (ours vs the reference's CUDA render).

The BASELINE target is PSNR parity on the example CSVs; this is the checking tool:
  python scripts/compare_videos.py ours.mp4 reference.mp4 [--json out.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ours")
    p.add_argument("reference")
    p.add_argument("--json", default=None)
    args = p.parse_args()

    from goal_force_tpu.data.video_io import load_video
    from goal_force_tpu.utils.metrics import compare_videos

    a = load_video(args.ours)
    b = load_video(args.reference)
    n = min(a.shape[0], b.shape[0])
    report = compare_videos(a[:n], b[:n])
    print(f"frames compared: {n}")
    print(f"PSNR  mean {report['psnr_mean']:.2f} dB   min {report['psnr_min']:.2f} dB")
    print(f"SSIM  mean {report['ssim_mean']:.4f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
