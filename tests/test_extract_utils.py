"""The video utility CLIs (reference scripts/utils/extract_*.py)."""

import importlib.util
import os
import sys

import numpy as np
import pytest


def _load(name):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(root, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def sample_video(tmp_path_factory):
    from goal_force_tpu.data.video_io import save_video

    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 255, (9, 48, 64, 3)).astype(np.uint8)
    # put a hard edge in the scene so canny has something to find
    frames[:, 10:30, 20:40] = 255
    frames[:, 12:28, 22:38] = 0
    path = tmp_path_factory.mktemp("vid") / "clip.mp4"
    save_video(frames, str(path), fps=15)
    return str(path)


def test_extract_canny_edges(sample_video, tmp_path):
    mod = _load("extract_canny_edges")
    out = tmp_path / "canny.mp4"
    canny = mod.extract_canny_edges(sample_video, str(out), num_frames=8,
                                    height=48, width=64)
    # 8 % 4 != 1 -> rounded to 9 frames (time-division contract %4==1)
    assert canny.shape == (9, 48, 64, 3)
    assert os.path.exists(out)
    assert canny.max() > 0.5  # the synthetic edge was detected
    assert set(np.unique((canny > 0.5).astype(np.uint8))) <= {0, 1}


def test_extract_first_frame(sample_video, tmp_path):
    mod = _load("extract_first_frame")
    out = tmp_path / "first.png"
    rgb = mod.extract_first_frame(sample_video, str(out),
                                  height=48, width=64)
    assert rgb.shape == (48, 64, 3)
    assert os.path.exists(out)

    import cv2

    reread = cv2.cvtColor(cv2.imread(str(out)), cv2.COLOR_BGR2RGB)
    np.testing.assert_array_equal(reread, rgb)


def test_missing_input_raises(tmp_path):
    mod = _load("extract_first_frame")
    with pytest.raises(FileNotFoundError):
        mod.extract_first_frame(str(tmp_path / "nope.mp4"),
                                str(tmp_path / "x.png"))
