"""Host-side video IO, mirroring /root/reference/diffsynth/data/video.py.

save_video matches the reference's mp4 writer contract (:140-214: fps + quality knobs);
loaders return float32 numpy frames in [0, 1], channels-last — the pipeline's native
layout. Backend: imageio-ffmpeg when present, else OpenCV (this image ships cv2 with mp4
support but no ffmpeg plugin for imageio).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
from PIL import Image


def _imageio_ffmpeg_available() -> bool:
    try:
        import imageio_ffmpeg  # noqa: F401

        return True
    except ImportError:
        return False


def save_video(frames, path: str, fps: int = 15, quality: int = 5) -> None:
    """frames: (F, H, W, 3) float [0,1] | uint8, or list of PIL Images / arrays."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def to_uint8(frame):
        arr = np.asarray(frame)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
        return arr

    if _imageio_ffmpeg_available():
        import imageio

        writer = imageio.get_writer(path, fps=fps, quality=quality)
        try:
            for frame in frames:
                writer.append_data(to_uint8(frame))
        finally:
            writer.close()
        return

    import cv2

    first = to_uint8(frames[0])
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        raise RuntimeError(f"cv2 VideoWriter failed to open {path}")
    try:
        for frame in frames:
            writer.write(cv2.cvtColor(to_uint8(frame), cv2.COLOR_RGB2BGR))
    finally:
        writer.release()


def load_video(path: str, num_frames: Optional[int] = None) -> np.ndarray:
    """-> (F, H, W, 3) float32 in [0, 1]."""
    frames = []
    for i, frame in enumerate(_iter_frames(path)):
        if num_frames is not None and i >= num_frames:
            break
        frames.append(np.asarray(frame, np.float32) / 255.0)
    return np.stack(frames)


def load_video_pil(path: str) -> List[Image.Image]:
    """Full decode to PIL frames (reference load_video_to_pil)."""
    return [Image.fromarray(f) for f in _iter_frames(path)]


def _iter_frames(path: str):
    if _imageio_ffmpeg_available():
        import imageio

        reader = imageio.get_reader(path)
        try:
            for frame in reader:
                yield np.asarray(frame)
        finally:
            reader.close()
        return
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise RuntimeError(f"cv2 failed to open {path}")
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    finally:
        cap.release()


def load_image(path: str, size=None) -> np.ndarray:
    """-> (H, W, 3) float32 in [0, 1]; optional (width, height) LANCZOS resize
    (reference unified_dataset.py:958-962)."""
    img = Image.open(path).convert("RGB")
    if size is not None and img.size != tuple(size):
        img = img.resize(tuple(size), resample=Image.Resampling.LANCZOS)
    return np.asarray(img, np.float32) / 255.0
