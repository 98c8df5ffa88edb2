"""Video post-processor chain.

Re-implements the reference's processor layer
(/root/reference/diffsynth/processors/{base,PILEditor,sequencial_processor}.py):
ContrastEditor / SharpnessEditor (PIL ImageEnhance semantics, computed in numpy
over the whole clip at once), plus RIFE / FastBlend smoothers from
extensions, dispatched by name and chainable with SequentialProcessor.

Frames are (F, H, W, 3) float32 in [0, 1] — the framework's native clip format —
rather than PIL image lists; converters at the boundary are two lines of numpy.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import numpy as np


class VideoProcessor:
    """Callable (F, H, W, 3) float32 [0,1] -> same. (base.py:1-7)"""

    def __call__(self, frames: np.ndarray, **kwargs) -> np.ndarray:
        raise NotImplementedError


def _to_u8(frames: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(frames, np.float32) * 255.0 + 0.5, 0, 255).astype(np.uint8)


def _to_f32(frames_u8: np.ndarray) -> np.ndarray:
    return frames_u8.astype(np.float32) / 255.0


class ContrastEditor(VideoProcessor):
    """PIL ImageEnhance.Contrast over every frame (PILEditor.py:5-16).

    degenerate = solid gray at round(mean(L)) with L = ITU-R 601-2 luma;
    out = degenerate + rate * (img - degenerate), clipped to u8 range.
    """

    def __init__(self, rate: float = 1.5):
        self.rate = float(rate)

    def __call__(self, frames: np.ndarray, **kwargs) -> np.ndarray:
        u8 = _to_u8(frames)
        # PIL: ImageStat.Stat(image.convert("L")).mean with modern Pillow's
        # fixed-point rounded luma L = (19595R + 38470G + 7471B + 2^15) >> 16.
        u32 = u8.astype(np.uint32)
        l = (u32[..., 0] * 19595 + u32[..., 1] * 38470 + u32[..., 2] * 7471
             + 0x8000) >> 16
        mean = np.floor(l.reshape(l.shape[0], -1).mean(axis=1) + 0.5)  # per frame
        u8 = u8.astype(np.float32)
        deg = mean[:, None, None, None]
        out = deg + self.rate * (u8 - deg)
        return _to_f32(np.clip(np.round(out), 0, 255).astype(np.uint8))


# PIL ImageFilter.SMOOTH kernel (used by ImageEnhance.Sharpness)
_SMOOTH = np.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], np.float32) / 13.0


class SharpnessEditor(VideoProcessor):
    """PIL ImageEnhance.Sharpness over every frame (PILEditor.py:18-29).

    degenerate = SMOOTH-filtered image; PIL leaves the 1-pixel border equal to
    the original. out = degenerate + rate * (img - degenerate).
    """

    def __init__(self, rate: float = 1.5):
        self.rate = float(rate)

    def __call__(self, frames: np.ndarray, **kwargs) -> np.ndarray:
        u8 = _to_u8(frames).astype(np.float32)
        f, h, w, c = u8.shape
        deg = u8.copy()
        if h >= 3 and w >= 3:
            acc = np.zeros((f, h - 2, w - 2, c), np.float32)
            for dy in range(3):
                for dx in range(3):
                    acc += _SMOOTH[dy, dx] * u8[:, dy:h - 2 + dy, dx:w - 2 + dx]
            # PIL rounds each filtered pixel to u8; border stays original
            deg[:, 1:-1, 1:-1] = np.clip(np.round(acc), 0, 255)
        out = deg + self.rate * (u8 - deg)
        return _to_f32(np.clip(np.round(out), 0, 255).astype(np.uint8))


class SequentialProcessor(VideoProcessor):
    """Chain of processors applied in order (sequencial_processor.py:26-41)."""

    def __init__(self, processors: Sequence[VideoProcessor] = ()):
        self.processors = list(processors)

    def __call__(self, frames: np.ndarray, **kwargs) -> np.ndarray:
        for p in self.processors:
            frames = p(frames, **kwargs)
        return frames


def _rife(**kwargs) -> VideoProcessor:
    from goal_force_tpu.extensions.rife import RIFESmoother

    return RIFESmoother(**kwargs)


def _fastblend(**kwargs) -> VideoProcessor:
    from goal_force_tpu.extensions.fastblend import FastBlendSmoother

    return FastBlendSmoother(**kwargs)


_REGISTRY: Dict[str, Callable[..., VideoProcessor]] = {
    "Contrast": ContrastEditor,
    "Sharpness": SharpnessEditor,
    "RIFE": _rife,
    "FastBlend": _fastblend,
}


def auto_processor(processor_type: str, **kwargs) -> VideoProcessor:
    """Name-dispatched construction (sequencial_processor.py::AutoVideoProcessor)."""
    if processor_type not in _REGISTRY:
        raise ValueError(f"invalid processor_type: {processor_type!r} "
                         f"(known: {sorted(_REGISTRY)})")
    return _REGISTRY[processor_type](**kwargs)


def sequential_from_configs(configs: List[dict]) -> SequentialProcessor:
    """[{"processor_type": ..., "config": {...}}, ...] -> chain
    (sequencial_processor.py::SequencialProcessor.from_model_manager)."""
    return SequentialProcessor(
        [auto_processor(c["processor_type"], **c.get("config", {})) for c in configs]
    )
