"""Pipelines: the flagship goal-force video pipeline plus the full model zoo.

Zoo pipelines import lazily — `from goal_force_tpu.pipelines import sd` etc. —
so the flagship path stays light; the names below are the public surface.
"""

from goal_force_tpu.pipelines.goal_force import GoalForcePipeline  # noqa: F401

__all__ = [
    "GoalForcePipeline",
    # lazy zoo modules (import the submodule, then the class):
    # sd.SDPipeline, sdxl.SDXLPipeline, sd3.SD3Pipeline, flux.FluxPipeline,
    # kolors.KolorsPipeline, hunyuan_image.HunyuanImagePipeline,
    # hunyuan_video.HunyuanVideoPipeline, cog_video.CogVideoPipeline,
    # step_video.StepVideoPipeline, svd_video.SVDVideoPipeline,
    # qwen_image.QwenImagePipeline, omnigen_image.OmniGenImagePipeline,
    # sd_video.SDVideoPipeline, sdxl_video.SDXLVideoPipeline,
    # nexus_gen.NexusGenPipeline, runner.VideoPipelineRunner,
]


def __getattr__(name):
    """Lazy attribute access for zoo pipeline classes."""
    lazy = {
        "SDPipeline": ("goal_force_tpu.pipelines.sd", "SDPipeline"),
        "SDXLPipeline": ("goal_force_tpu.pipelines.sdxl", "SDXLPipeline"),
        "SD3Pipeline": ("goal_force_tpu.pipelines.sd3", "SD3Pipeline"),
        "FluxPipeline": ("goal_force_tpu.pipelines.flux", "FluxPipeline"),
        "KolorsPipeline": ("goal_force_tpu.pipelines.kolors", "KolorsPipeline"),
        "HunyuanImagePipeline": ("goal_force_tpu.pipelines.hunyuan_image",
                                 "HunyuanImagePipeline"),
        "HunyuanVideoPipeline": ("goal_force_tpu.pipelines.hunyuan_video",
                                 "HunyuanVideoPipeline"),
        "CogVideoPipeline": ("goal_force_tpu.pipelines.cog_video",
                             "CogVideoPipeline"),
        "StepVideoPipeline": ("goal_force_tpu.pipelines.step_video",
                              "StepVideoPipeline"),
        "SVDVideoPipeline": ("goal_force_tpu.pipelines.svd_video",
                             "SVDVideoPipeline"),
        "QwenImagePipeline": ("goal_force_tpu.pipelines.qwen_image",
                              "QwenImagePipeline"),
        "OmniGenImagePipeline": ("goal_force_tpu.pipelines.omnigen_image",
                                 "OmniGenImagePipeline"),
        "SDVideoPipeline": ("goal_force_tpu.pipelines.sd_video",
                            "SDVideoPipeline"),
        "SDXLVideoPipeline": ("goal_force_tpu.pipelines.sdxl_video",
                              "SDXLVideoPipeline"),
        "NexusGenPipeline": ("goal_force_tpu.pipelines.nexus_gen",
                             "NexusGenPipeline"),
        "S2VPipeline": ("goal_force_tpu.pipelines.s2v", "S2VPipeline"),
        "VideoPipelineRunner": ("goal_force_tpu.pipelines.runner",
                                "VideoPipelineRunner"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
