"""Typed model/pipeline configs.

Replaces the reference's MD5-hash-of-state-dict-keys registry
(/root/reference/diffsynth/configs/model_config.py:141-178 and the hash-keyed kwargs in
/root/reference/diffsynth/models/wan_video_dit.py:499-757) with explicit dataclasses.
All constants cite where the reference pins them.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class WanDiTConfig:
    """Wan video DiT (flow-matching transformer).

    A14B preset mirrors hash 5b013604280dd715f8457c6ed6d6a626
    (/root/reference/diffsynth/models/wan_video_dit.py:703-718).
    """

    dim: int = 5120
    in_dim: int = 36            # 16 latent + 20 y (4 mask + 16 first-frame latents)
    ffn_dim: int = 13824
    out_dim: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    eps: float = 1e-6
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    num_heads: int = 40
    num_layers: int = 40
    has_image_input: bool = False      # A14B: no CLIP branch (require_clip_embedding=False)
    rope_max_len: int = 1024
    # qk-RMS-norm keeps every softmax logit small (typical log2-domain max ~16),
    # so the flash kernel statically takes its max-free path, trading the runtime
    # overflow dispatch (~20 ms/block) for a saturating clamp that is exact for
    # all logits <= flash_attention.NOMAX_CLAMP. Set False to force the runtime
    # Cauchy-Schwarz dispatch.
    qk_bounded: bool = True

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


@dataclasses.dataclass(frozen=True)
class ControlNetConfig:
    """Force/mass ControlNet: patch-embed + N DiT-block copies + zero convs.

    Mirrors /root/reference/src/goal_force/wan_video_new.py:49-117
    (10 layers at /root/reference/scripts/inference/inference_goal_force.py:27).
    """

    num_layers: int = 10
    stride: Optional[int] = None       # strided injection (block_id % stride)
    in_channels: int = 16              # VAE latent channels of the control video


@dataclasses.dataclass(frozen=True)
class T5Config:
    """umt5-xxl encoder-only.

    Mirrors /root/reference/diffsynth/models/wan_video_text_encoder.py:211-220.
    """

    vocab: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    rel_max_dist: int = 128
    shared_pos: bool = False           # umt5: per-layer relative position embeddings
    text_len: int = 512                # /root/reference/diffsynth/prompters/wan_prompter.py:86


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """Wan2.1 3D causal video VAE (spatial 8x, temporal 4x).

    Mirrors /root/reference/diffsynth/models/wan_video_vae.py:951-976 defaults and the
    per-channel latent scaling at :1063-1073.
    """

    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    upsampling_factor: int = 8

    @property
    def temporal_upsample(self) -> Tuple[bool, ...]:
        return tuple(reversed(self.temporal_downsample))


# Per-channel latent mean/std (/root/reference/diffsynth/models/wan_video_vae.py:1063-1070).
VAE_LATENT_MEAN = (
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
)
VAE_LATENT_STD = (
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Goal-force inference defaults.

    Mirrors /root/reference/src/goal_force/wan_video_new.py:634-650 and
    /root/reference/scripts/inference/inference_goal_force.py:27-33.
    """

    height: int = 480
    width: int = 832
    num_frames: int = 81
    num_inference_steps: int = 50
    cfg_scale: float = 5.0
    sigma_shift: float = 5.0
    switch_dit_boundary: float = 0.875   # timestep < 0.875*1000 -> low-noise expert
    fps: int = 15
    # Spatial VAE tiling (reference tiled=True defaults, wan_video_new.py:
    # 649-650 — latent units). Inputs that fit one tile take the untiled
    # jitted path; the real 60x104 latent grid tiles (the full-frame coder
    # graph exceeds one v5e chip's compile memory).
    tiled: bool = True
    tile_size: tuple = (30, 52)
    tile_stride: tuple = (15, 26)
    # Force/mass calibration pinned at inference
    # (/root/reference/scripts/inference/inference_goal_force.py:136-144).
    min_force: float = 30.0
    max_force: float = 400.0
    min_mass: float = 1.0
    max_mass: float = 4.0
    # Fixed negative prompt (/root/reference/scripts/inference/inference_goal_force.py:208).
    negative_prompt: str = (
        "色调艳丽，过曝，静态，细节模糊不清，字幕，风格，作品，画作，画面，静止，整体发灰，最差质量，"
        "低质量，JPEG压缩残留，丑陋的，残缺的，多余的手指，画得不好的手部，画得不好的脸部，畸形的，"
        "毁容的，形态畸形的肢体，手指融合，静止不动的画面，杂乱的背景，三条腿，背景人很多，倒着走"
    )

    @property
    def latent_frames(self) -> int:
        return (self.num_frames - 1) // 4 + 1

    @property
    def latent_height(self) -> int:
        return self.height // 8

    @property
    def latent_width(self) -> int:
        return self.width // 8

    @property
    def tokens(self) -> int:
        return self.latent_frames * (self.latent_height // 2) * (self.latent_width // 2)


@dataclasses.dataclass(frozen=True)
class FluxDiTConfig:
    """Flux.1 MMDiT: double-stream (joint) blocks then single-stream blocks.

    Mirrors /root/reference/diffsynth/models/flux_dit.py:278-292 (dim 3072, 24 heads,
    19 joint + 38 single blocks, RoPE theta 10000 over axes_dim (16, 56, 56), T5
    context 4096, CLIP pooled 768, sinusoidal freq 256, guidance embedder present
    for Flux-dev).
    """

    dim: int = 3072
    num_heads: int = 24
    num_joint_blocks: int = 19
    num_single_blocks: int = 38
    in_dim: int = 64                  # 2x2-patchified 16-channel latents
    out_dim: int = 64
    text_dim: int = 4096              # T5-XXL hidden
    pooled_dim: int = 768             # CLIP-L pooled
    freq_dim: int = 256
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 10000.0
    guidance_embed: bool = True       # Flux-dev; schnell disables it (:279)
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


# ---------------------------------------------------------------------------
# Presets
# ---------------------------------------------------------------------------

WAN22_A14B = WanDiTConfig()

# Wan2.1-T2V-1.3B geometry (hash 9269f8db... at wan_video_dit.py:501-514) — useful as a
# smaller real model and for medium-scale tests.
WAN21_1_3B = WanDiTConfig(dim=1536, in_dim=16, ffn_dim=8960, num_heads=12, num_layers=30)

UMT5_XXL = T5Config()
WAN21_VAE = VAEConfig()

FLUX_DEV = FluxDiTConfig()
FLUX_SCHNELL = FluxDiTConfig(guidance_embed=False)

# google/t5-v1_1-xxl used by Flux/SD3: same geometry as umt5-xxl but with a 32128-token
# sentencepiece vocab and the relative position bias SHARED from layer 0
# (/root/reference/diffsynth/models/sd3_text_encoder.py:40-60 T5Config d_ff=10240 ...).
T5_V1_1_XXL = T5Config(vocab=32128, shared_pos=True)


def tiny_dit(num_layers: int = 2) -> WanDiTConfig:
    """Small config for unit tests (structure identical to A14B)."""
    # head_dim must keep head_dim//3 even for the 3D RoPE split (true for A14B's 128;
    # 96/4 = 24 here).
    return WanDiTConfig(
        dim=96, in_dim=36, ffn_dim=128, out_dim=16, text_dim=32, freq_dim=32,
        num_heads=4, num_layers=num_layers, rope_max_len=64,
    )


def tiny_t5(num_layers: int = 2) -> T5Config:
    return T5Config(
        vocab=128, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
        num_layers=num_layers, text_len=16,
    )


def tiny_vae() -> VAEConfig:
    return VAEConfig(dim=8, z_dim=4, dim_mult=(1, 2, 4, 4), num_res_blocks=1)


def tiny_pipeline_configs(num_layers: int = 2, cn_layers: int = 1):
    """Mutually consistent tiny configs for end-to-end pipeline tests.

    VAE z=4 -> DiT in_dim = z + 4 (mask) + z = 12, out_dim = z.
    """
    vae_cfg = tiny_vae()
    z = vae_cfg.z_dim
    t5_cfg = tiny_t5()
    dit_cfg = WanDiTConfig(
        dim=96, in_dim=2 * z + 4, ffn_dim=128, out_dim=z, text_dim=t5_cfg.dim,
        freq_dim=32, num_heads=4, num_layers=num_layers, rope_max_len=64,
    )
    cn_cfg = ControlNetConfig(num_layers=cn_layers, in_channels=z)
    return dit_cfg, t5_cfg, vae_cfg, cn_cfg
