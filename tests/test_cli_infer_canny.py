"""Canny-edge inference CLI plumbing (reference scripts/inference/
inference_canny_edge_control.py): CSV (image, control_video, caption) rows ->
load image + precomputed canny video -> pipe(...) -> reference-named artifacts.
"""

import argparse
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture()
def fixture_dir(tmp_path):
    pytest.importorskip("cv2")
    from PIL import Image

    from goal_force_tpu.data.video_io import save_video

    base = tmp_path / "examples"
    (base / "images").mkdir(parents=True)
    (base / "canny-videos").mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray((rng.uniform(size=(24, 32, 3)) * 255).astype(np.uint8)).save(
        base / "images" / "img0.png")
    frames = (rng.uniform(size=(5, 24, 32, 3)) > 0.5).astype(np.float32)
    save_video(frames, str(base / "canny-videos" / "clip0_canny.mp4"), fps=5)
    (base / "rows.csv").write_text(
        "image,control_video,caption\nimg0.png,clip0_canny.mp4,a drawn scene\n")
    return base


class _StubPipe:
    def __init__(self):
        self.calls = []

    def __call__(self, prompt, image, control_signal_video=None, **kw):
        self.calls.append((prompt, image.shape, control_signal_video.shape))
        f = kw.get("num_frames", control_signal_video.shape[0])
        return np.zeros((f,) + image.shape[:2] + (3,), np.float32)


def test_run_canny_edge_plumbing(fixture_dir, tmp_path):
    from scripts.infer import run_canny_edge

    args = argparse.Namespace(
        example_paths=[str(fixture_dir / "rows.csv")], world_size=1, device_id=0,
        width=32, height=24, num_frames=5, seed=0)
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    pipe = _StubPipe()
    run_canny_edge(pipe, args, str(out_dir), "0")

    assert pipe.calls == [("a drawn scene", (24, 32, 3), (5, 24, 32, 3))]
    names = sorted(os.listdir(out_dir))
    assert names == ["clip0-canny-control-signal.mp4", "clip0-canny-output.mp4",
                     "clip0-image-condition.png"]
