"""Config-driven video pipeline runner.

Behavioral parity with /root/reference/diffsynth/pipelines/pipeline_runner.py
SDVideoPipelineRunner.run (:82-105): a JSON-style config with "models" and
"data" sections drives load -> synthesize -> save, writing the output video,
the config echo, and per-frame PNGs into the output folder.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import numpy as np


class VideoPipelineRunner:
    """Drives any of this package's video pipelines from a config dict.

    config = {
        "models": {"build": callable -> pipeline}   (or pass pipeline=)
        "data": {"output_folder": ..., "fps": ...},
        "pipeline": {"seed": ..., "pipeline_inputs": {...}},
    }
    """

    def __init__(self, pipeline=None, build: Optional[Callable] = None):
        self._pipeline = pipeline
        self._build = build

    # family string -> from_pretrained constructor (JSON-friendly configs)
    FAMILIES = {
        "goal_force": ("goal_force_tpu.pipelines.goal_force", "GoalForcePipeline"),
        "flux": ("goal_force_tpu.pipelines.flux", "FluxPipeline"),
        "sd": ("goal_force_tpu.pipelines.sd", "SDPipeline"),
        "sdxl": ("goal_force_tpu.pipelines.sdxl", "SDXLPipeline"),
        "sd3": ("goal_force_tpu.pipelines.sd3", "SD3Pipeline"),
        "sd_video": ("goal_force_tpu.pipelines.sd_video", "SDVideoPipeline"),
        "sdxl_video": ("goal_force_tpu.pipelines.sdxl_video", "SDXLVideoPipeline"),
        "svd": ("goal_force_tpu.pipelines.svd_video", "SVDVideoPipeline"),
        "cog": ("goal_force_tpu.pipelines.cog_video", "CogVideoPipeline"),
        "hunyuan_video": ("goal_force_tpu.pipelines.hunyuan_video",
                          "HunyuanVideoPipeline"),
        "hunyuan_dit": ("goal_force_tpu.pipelines.hunyuan_image",
                        "HunyuanImagePipeline"),
        "step_video": ("goal_force_tpu.pipelines.step_video", "StepVideoPipeline"),
        "qwen_image": ("goal_force_tpu.pipelines.qwen_image", "QwenImagePipeline"),
        "omnigen": ("goal_force_tpu.pipelines.omnigen_image",
                    "OmniGenImagePipeline"),
        "kolors": ("goal_force_tpu.pipelines.kolors", "KolorsPipeline"),
        "nexus_gen": ("goal_force_tpu.pipelines.nexus_gen", "NexusGenPipeline"),
    }

    def load_pipeline(self, config: Dict):
        if self._pipeline is not None:
            return self._pipeline
        models = dict(config.get("models", {}))
        build = self._build or models.pop("build", None)
        family = models.pop("family", None)
        if build is None and family is not None:
            # {"family": "flux", ...from_pretrained kwargs} — JSON-friendly
            import importlib

            mod_name, cls_name = self.FAMILIES[family]
            build = getattr(importlib.import_module(mod_name),
                            cls_name).from_pretrained
        if build is None:
            raise ValueError("config['models'] needs 'build' or 'family' "
                             "(or pass pipeline=)")
        self._pipeline = build(**models)
        return self._pipeline

    def synthesize_video(self, pipe, seed: int, **pipeline_inputs):
        return pipe(seed=seed, **pipeline_inputs)

    def save_output(self, video: np.ndarray, output_folder: str, fps: int,
                    config: Dict) -> str:
        from goal_force_tpu.data.video_io import save_video

        os.makedirs(output_folder, exist_ok=True)
        frame_dir = os.path.join(output_folder, "frames")
        os.makedirs(frame_dir, exist_ok=True)
        out_path = os.path.join(output_folder, "video.mp4")
        save_video(video, out_path, fps=fps)
        try:
            from PIL import Image

            for i, frame in enumerate(video):
                arr = np.clip(np.asarray(frame) * 255.0, 0, 255).astype(np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(frame_dir, f"{i}.png"))
        except Exception:
            pass
        with open(os.path.join(output_folder, "config.json"), "w") as f:
            json.dump({k: v for k, v in config.items() if k != "models"},
                      f, indent=2, default=str)
        return out_path

    def run(self, config: Dict) -> str:
        pipe = self.load_pipeline(config)
        pcfg = dict(config.get("pipeline", {}))
        seed = pcfg.pop("seed", 0)
        inputs = pcfg.pop("pipeline_inputs", pcfg)
        video = self.synthesize_video(pipe, seed, **inputs)
        data = config.get("data", {})
        return self.save_output(video, data.get("output_folder", "./output"),
                                data.get("fps", 15), config)
