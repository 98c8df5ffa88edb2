"""Control-signal datasets: CSV row -> (frames, prompt, control video).

Behavior parity with /root/reference/src/goal_force/unified_dataset.py:
  BallsDataset   — ControlSignalDataset_Balls (:621-1096): direct + goal forces + masses
                   (up to 8 distractors in training videos), video frames [::2][-N:].
  DominosDataset — ControlSignalDataset_Dominos (:1099-1556): same control channels.
  PlantsDataset  — ControlSignalDataset_Plants (:1557-1894): direct force only (channels
                   1-2 zeroed), random crop-zoom augment for carnation clips.
  CannyEdgeDataset — ControlSignalDataset_CannyEdge (:406-568): canny-edge control maps.

No torch dependency: items are numpy dicts; `safe_collate`/`should_skip` reproduce the
corrupt-sample filtering (/root/reference/src/goal_force/utils.py:647-715) host-side.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional

import numpy as np

from goal_force_tpu.data.control_signal import ControlSpec, render_control_video
from goal_force_tpu.data.video_io import load_image, load_video_pil

MAX_NUM_DISTRACTORS = 8  # unified_dataset.py:1009


def _read_csv(path: str):
    import pandas

    return pandas.read_csv(path)


class _CSVDataset:
    """Shared CSV plumbing: row filtering by existing media + calibration stats."""

    media_type: str

    def __init__(self, base_path, metadata_path, *, is_validation_dataset=False,
                 num_frames=81, height=480, width=832, repeat=1):
        self.base_path = base_path
        self.metadata_path = metadata_path
        self.is_validation_dataset = is_validation_dataset
        self.num_frames = num_frames
        self.height = height
        self.width = width
        self.repeat = repeat
        self.media_type = "image" if is_validation_dataset else "video"
        self.df = _read_csv(metadata_path)
        media_dir = os.path.join(base_path, "images") if is_validation_dataset else base_path
        if os.path.isdir(media_dir):
            names = set(os.listdir(media_dir))
            keep = self.df[self.media_type].map(lambda x: x in names)
            self.df = self.df[keep]
        self._calibrate()

    def _calibrate(self):
        pass

    def __len__(self):
        return len(self.df) * self.repeat

    def _media_path(self, file_name: str) -> str:
        sub = "images" if self.is_validation_dataset else ""
        return os.path.join(self.base_path, sub, file_name)

    def _load_media(self, file_name: str):
        """-> frames (T, H, W, 3) float32 [0,1]; validation: single image frame."""
        path = self._media_path(file_name)
        if self.is_validation_dataset:
            return load_image(path, size=(self.width, self.height))[None]
        frames = load_video_pil(path)
        frames = self._subsample(frames)
        return np.stack([np.asarray(f, np.float32) / 255.0 for f in frames])

    def _subsample(self, frames: List):
        return frames[:self.num_frames]


class BallsDataset(_CSVDataset):
    """Force/goal/mass control signals (the goal-force flagship dataset)."""

    def __init__(self, *args, p_mask_out_direct_force=0.0, p_mask_out_indirect_force=0.0,
                 p_mask_out_masses=0.0, rng: Optional[np.random.Generator] = None, **kwargs):
        assert p_mask_out_direct_force + p_mask_out_indirect_force <= 1
        assert 0.0 <= p_mask_out_masses <= 1.0
        self.p_direct = p_mask_out_direct_force
        self.p_indirect = p_mask_out_indirect_force
        self.p_masses = p_mask_out_masses
        self.rng = rng or np.random.default_rng()
        super().__init__(*args, **kwargs)

    def _calibrate(self):
        """min/max force+mass from the data in training; validation pins them later
        (the reference hardcodes 30-400 / 1-4 at inference_goal_force.py:136-144)."""
        if self.is_validation_dataset:
            self.min_force, self.max_force = 0.0, 1.0
            self.min_mass, self.max_mass = 0.0, 1.0
            self.min_indirect_force, self.max_indirect_force = 0.0, 1.0
            return
        df = self.df
        self.min_force = float(df["projectile_force_magnitude"].min())
        self.max_force = float(df["projectile_force_magnitude"].max())
        ind = df[df["target_indirect_force_magnitude"] > -1]
        self.min_indirect_force = float(ind["target_indirect_force_magnitude"].min())
        self.max_indirect_force = float(ind["target_indirect_force_magnitude"].max())
        self.min_mass = float(df["projectile_mass"].min())
        self.max_mass = float(df["projectile_mass"].max())

    def set_calibration(self, min_force, max_force, min_mass, max_mass):
        """Pin inference calibration (inference_goal_force.py:136-144)."""
        self.min_force, self.max_force = min_force, max_force
        self.min_mass, self.max_mass = min_mass, max_mass
        self.min_indirect_force, self.max_indirect_force = min_force, max_force

    def _subsample(self, frames):
        return frames[::2][-self.num_frames:]  # unified_dataset.py:987

    def _spec_from_row(self, item) -> ControlSpec:
        distract_m, distract_xy = [], []
        if not self.is_validation_dataset and f"distractor_0_mass" in item:
            assert f"distractor_{MAX_NUM_DISTRACTORS-1}_mass" in item
            for i in range(MAX_NUM_DISTRACTORS):
                m = float(item[f"distractor_{i}_mass"])
                if m == -1:
                    continue
                distract_m.append(m)
                distract_xy.append((int(item[f"distractor_{i}_coordx"]),
                                    int(item[f"distractor_{i}_coordy"])))
        return ControlSpec(
            force=float(item["projectile_force_magnitude"]),
            angle_deg=float(item["projectile_force_angle"]),
            x_pos=float(item["projectile_coordx"]) / float(item["width"]),
            y_pos=float(item["projectile_coordy"]) / float(item["height"]),
            target_force=float(item["target_indirect_force_magnitude"]),
            target_angle_deg=float(item["target_indirect_force_angle"]),
            target_x_pos=float(item["target_coordx"]) / float(item["width"]),
            target_y_pos=float(item["target_coordy"]) / float(item["height"]),
            projectile_mass=float(item["projectile_mass"]),
            projectile_xy_px=(int(item["projectile_coordx"]), int(item["projectile_coordy"])),
            target_mass=float(item["target_mass"]),
            target_xy_px=(int(item["target_coordx"]), int(item["target_coordy"])),
            distractor_masses=distract_m,
            distractor_xy_px=distract_xy,
        )

    def __getitem__(self, idx) -> Optional[Dict]:
        item = self.df.iloc[idx % len(self.df)]
        try:
            frames = self._load_media(item[self.media_type])
        except Exception:
            return None  # corrupt sample -> filtered by safe_collate (utils.py:700-715)
        spec = self._spec_from_row(item)
        control = render_control_video(
            spec, self.num_frames, self.height, self.width,
            min_force=self.min_force, max_force=self.max_force,
            min_mass=self.min_mass, max_mass=self.max_mass,
            min_indirect_force=self.min_indirect_force,
            max_indirect_force=self.max_indirect_force,
            p_mask_out_direct=self.p_direct, p_mask_out_indirect=self.p_indirect,
            p_mask_out_masses=self.p_masses, rng=self.rng,
        )
        name = item[self.media_type]
        return {
            "video": frames,
            "prompt": item["caption"],
            "control_video": control,
            "file_id": os.path.splitext(name)[0],
            "spec": spec,
        }


class DominosDataset(BallsDataset):
    """Same control channels as Balls; dominos clips are not frame-strided."""

    def _subsample(self, frames):
        return frames[:self.num_frames]


class PlantsDataset(_CSVDataset):
    """Direct force only; channels 1-2 zeroed (unified_dataset.py:1695-1696);
    random crop-zoom augment for carnation clips (:1774-1833)."""

    def __init__(self, *args, rng: Optional[np.random.Generator] = None, **kwargs):
        self.rng = rng or np.random.default_rng()
        super().__init__(*args, **kwargs)

    def _calibrate(self):
        if self.is_validation_dataset:
            self.min_force, self.max_force = 0.0, 1.0
        else:
            self.min_force = float(self.df["force"].min())
            self.max_force = float(self.df["force"].max())

    def __getitem__(self, idx) -> Optional[Dict]:
        item = self.df.iloc[idx % len(self.df)]
        try:
            frames = self._load_media(item[self.media_type])
        except Exception:
            return None
        file_id = os.path.splitext(item[self.media_type])[0]
        x_pos = float(item["coordx"]) / float(item["width"])
        y_pos = float(item["coordy"]) / float(item["height"])
        if not self.is_validation_dataset and file_id.startswith("carnation"):
            frames, x_pos, y_pos = self._carnation_crop(frames, float(item["coordx"]),
                                                        float(item["coordy"]))
        spec = ControlSpec(
            force=float(item["force"]), angle_deg=float(item["angle"]),
            x_pos=x_pos, y_pos=y_pos,
            target_force=-1.0, target_angle_deg=0.0, target_x_pos=0.0, target_y_pos=0.0,
        )
        control = render_control_video(
            spec, self.num_frames, self.height, self.width,
            min_force=self.min_force, max_force=self.max_force,
            p_mask_out_masses=1.0, rng=self.rng,  # mass channel always zero
        )
        control[..., 1:3] = 0.0  # :1695-1696
        return {
            "video": frames, "prompt": item["caption"], "control_video": control,
            "file_id": file_id, "spec": spec,
        }

    def _carnation_crop(self, frames, coordx, coordy):
        """Random zoom crop keeping the force point ~50 px inside (:1774-1833)."""
        t, oh, ow, _ = frames.shape
        coordy_tl = oh - coordy
        zoom = self.rng.uniform(1.0, 1.3)
        nw, nh = int(ow / zoom), int(oh / zoom)
        min_x = max(0, int(coordx - nw + 50))
        max_x = min(ow - nw, int(coordx - 50))
        min_y = max(0, int(coordy_tl - nh + 50))
        max_y = min(oh - nh, int(coordy_tl - 50))
        if min_x >= max_x or min_y >= max_y:
            ox = self.rng.integers(0, ow - nw + 1)
            oy = self.rng.integers(0, oh - nh + 1)
        else:
            ox = self.rng.integers(min_x, max_x + 1)
            oy = self.rng.integers(min_y, max_y + 1)
        crop = frames[:, oy:oy + nh, ox:ox + nw]
        import cv2

        out = np.stack([
            cv2.resize(f, (self.width, self.height), interpolation=cv2.INTER_AREA)
            for f in crop
        ])
        fx = ((coordx - ox) / nw) * self.width
        fy = ((coordy_tl - oy) / nh) * self.height
        return out, fx / self.width, 1.0 - fy / self.height


class CannyEdgeDataset:
    """Canny-edge control videos (proof-of-concept mode; :406-568)."""

    def __init__(self, video_paths: List[str], prompts: List[str],
                 num_frames=81, height=480, width=832,
                 low_threshold=100, high_threshold=200):
        assert len(video_paths) == len(prompts)
        self.video_paths = video_paths
        self.prompts = prompts
        self.num_frames = num_frames
        self.height = height
        self.width = width
        self.low = low_threshold
        self.high = high_threshold

    def __len__(self):
        return len(self.video_paths)

    def canny_control(self, frames: np.ndarray) -> np.ndarray:
        """(T, H, W, 3) [0,1] -> canny maps (T, H, W, 3) [0,1]."""
        import cv2

        out = []
        for f in (frames * 255).astype(np.uint8):
            edges = cv2.Canny(f, self.low, self.high)
            out.append(np.repeat(edges[..., None], 3, axis=-1).astype(np.float32) / 255.0)
        return np.stack(out)

    def __getitem__(self, idx) -> Optional[Dict]:
        try:
            from goal_force_tpu.data.video_io import load_video

            frames = load_video(self.video_paths[idx], self.num_frames)
        except Exception:
            return None
        import cv2

        frames = np.stack([
            cv2.resize(f, (self.width, self.height), interpolation=cv2.INTER_AREA)
            for f in frames
        ])
        return {
            "video": frames,
            "prompt": self.prompts[idx],
            "control_video": self.canny_control(frames),
            "file_id": os.path.splitext(os.path.basename(self.video_paths[idx]))[0],
        }


class ConcatDataset:
    """Like torch ConcatDataset (the trainer concatenates Balls+Dominos+Plants —
    scripts/train/train.py:126-198)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self.lengths = [len(d) for d in self.datasets]

    def __len__(self):
        return sum(self.lengths)

    def __getitem__(self, idx):
        for d, n in zip(self.datasets, self.lengths):
            if idx < n:
                return d[idx]
            idx -= n
        raise IndexError(idx)


def should_skip(sample: Optional[Dict], num_frames: int, height: int, width: int) -> bool:
    """Runtime shape asserts (reference utils.py:647-698): corrupt/mis-shaped samples are
    skipped; cross-rank consensus becomes a host-side decision (every host sees the same
    sample under the data sharding, so no collective is needed)."""
    if sample is None:
        return True
    cv = sample.get("control_video")
    if cv is None or cv.shape != (num_frames, height, width, 3):
        return True
    return False


def safe_collate(samples: List[Optional[Dict]]) -> Optional[Dict]:
    """Return the first valid sample (reference safe_collate returns batch[0],
    utils.py:700-715 — dataloader batch size is 1)."""
    for s in samples:
        if s is not None:
            return s
    return None


def batch_iterator(dataset, batch_size=1, shuffle=True, seed=0, drop_remainder=True):
    """Minimal host-side loader: yields lists of valid samples."""
    rng = np.random.default_rng(seed)
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    buf = []
    for i in order:
        s = dataset[int(i)]
        if s is None:
            continue
        buf.append(s)
        if len(buf) == batch_size:
            yield buf
            buf = []
    if buf and not drop_remainder:
        yield buf


class TextImageDataset:
    """metadata.csv + image folder for generic (LoRA) fine-tuning.

    Reference: diffsynth/data/simple_text_image.py::TextImageDataset — a
    `train/metadata.csv` with `file_name,text` columns next to the images;
    each item is resized-to-cover, center- (or seeded-random-) cropped,
    optionally h-flipped, and normalized to [-1, 1]. Items here are numpy
    dicts {"text": str, "image": (H, W, 3) float32 in [-1, 1]} (channels-last,
    the framework's native layout). Sampling mirrors the reference: each
    __getitem__ draws a fresh random id and offsets it by the index
    ((randint + index) % n_files, simple_text_image.py:27-28) — independent
    draws, duplicates within a batch possible, deterministic under `seed`.
    """

    def __init__(self, dataset_path, steps_per_epoch=10000, height=1024,
                 width=1024, center_crop=True, random_flip=False, seed=0):
        import csv
        import os

        self.steps_per_epoch = steps_per_epoch
        self.height, self.width = height, width
        self.center_crop, self.random_flip = center_crop, random_flip
        self._rng = np.random.default_rng(seed)
        self.paths, self.texts = [], []
        with open(os.path.join(dataset_path, "train", "metadata.csv")) as fh:
            for row in csv.DictReader(fh):
                self.paths.append(os.path.join(dataset_path, "train",
                                               row["file_name"]))
                self.texts.append(row["text"])

    def __len__(self):
        return self.steps_per_epoch

    def _load(self, path):
        from PIL import Image

        img = Image.open(path).convert("RGB")
        w, h = img.size
        scale = max(self.width / w, self.height / h)
        shape = (round(w * scale), round(h * scale))
        img = img.resize(shape, Image.BILINEAR)
        return np.asarray(img, np.float32) / 255.0

    def __getitem__(self, index):
        idx = (int(self._rng.integers(0, len(self.paths))) + index) % len(self.paths)
        arr = self._load(self.paths[idx])
        h, w = arr.shape[:2]
        if self.center_crop:
            y0 = (h - self.height) // 2
            x0 = (w - self.width) // 2
        else:
            y0 = int(self._rng.integers(0, h - self.height + 1))
            x0 = int(self._rng.integers(0, w - self.width + 1))
        arr = arr[y0:y0 + self.height, x0:x0 + self.width]
        if self.random_flip and self._rng.random() < 0.5:
            arr = arr[:, ::-1]
        return {"text": self.texts[idx], "image": arr * 2.0 - 1.0}
