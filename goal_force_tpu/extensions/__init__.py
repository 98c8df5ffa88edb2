"""Optional post-processing extensions (reference: diffsynth/extensions/).

ESRGAN (4x super-resolution), RIFE (frame interpolation), FastBlend
(model-free deflickering), ImageQualityMetric (learned preference scorers:
Aesthetic / PickScore / CLIPScore / HPSv2 / ImageReward). All are host/JAX
post-processes decoupled from the diffusion pipeline; import lazily.
"""

from goal_force_tpu.extensions.esrgan import ESRGAN
from goal_force_tpu.extensions.fastblend import FastBlendSmoother
from goal_force_tpu.extensions.image_reward import ImageRewardScore
from goal_force_tpu.extensions.quality_metric import (
    AestheticScore,
    CLIPScore,
    HPScore,
    PickScore,
    load_preference_model,
)
from goal_force_tpu.extensions.rife import RIFEInterpolater

__all__ = ["ESRGAN", "FastBlendSmoother", "RIFEInterpolater",
           "AestheticScore", "CLIPScore", "HPScore", "PickScore",
           "ImageRewardScore", "load_preference_model"]
