"""ControlNet training: loss, optimizer, and the jitted train step.

Mirrors the reference harness semantics:
  - timestep sampled uniformly in [min_b, max_b) of the 1000-entry *descending* training
    schedule (high-noise window; /root/reference/src/goal_force/wan_video_new.py:180-193,
    boundary 0.358 from scripts/train/train_goal_force.sh:40)
  - x_t = (1-sigma) x0 + sigma eps; target v = eps - x0; Gaussian-bell step weight
  - AdamW lr 1e-5 wd 0.01, constant LR, global grad-clip 1.0
    (/root/reference/src/goal_force/utils.py:755-756,812-813)
  - only the ControlNet trains (freeze_except(["controlnet"]),
    /root/reference/scripts/train/train.py via utils.py:550-590)

TPU-native differences: the whole step — three VAE encodes, text encode, denoiser with
per-block remat, loss, grads, optimizer — is ONE jitted, donated computation; DDP/ZeRO
collectives become GSPMD (batch over "dp", FSDP specs for state; parallel/sharding.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from goal_force_tpu.configs import ControlNetConfig, T5Config, VAEConfig, WanDiTConfig
from goal_force_tpu.models import t5 as t5m
from goal_force_tpu.models import vae as vaem
from goal_force_tpu.pipelines.goal_force import build_i2v_mask
from goal_force_tpu.pipelines.model_fn import denoise_forward
from goal_force_tpu.schedulers import flow_match as fm


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Dict           # trainable (controlnet)
    opt_state: object
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-5, weight_decay: float = 0.01, grad_clip: float = 1.0,
                   grad_accum_steps: int = 1):
    """AdamW with global-norm clipping; grad_accum_steps > 1 averages
    gradients over that many micro-steps and applies the clipped AdamW
    update only on the sync step (the reference's accelerator.accumulate +
    clip-on-sync_gradients loop, src/goal_force/utils.py:742-844)."""
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=weight_decay),
    )
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx


def training_loss(
    dit_params,
    cn_params,
    dit_cfg: WanDiTConfig,
    cn_cfg: Optional[ControlNetConfig],
    x0: jnp.ndarray,              # (B, L, h, w, z) clean latents
    noise: jnp.ndarray,
    sigma: jnp.ndarray,           # scalar
    timestep: jnp.ndarray,        # (B,)
    weight: jnp.ndarray,          # scalar step weight
    context: jnp.ndarray,
    y: jnp.ndarray,
    control_latents: Optional[jnp.ndarray],
    attn_impl: str = "auto",
    pp_microbatches: Optional[int] = None,
) -> jnp.ndarray:
    latents = fm.add_noise(x0, noise, sigma)
    target = fm.training_target(x0, noise)
    v = denoise_forward(
        dit_params, dit_cfg, latents, timestep, context, y=y,
        controlnet_params=cn_params, controlnet_cfg=cn_cfg,
        control_latents=control_latents, remat=True, attn_impl=attn_impl,
        pp_microbatches=pp_microbatches,
    )
    loss = jnp.mean((v.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return loss * weight


def make_train_step(
    dit_cfg: WanDiTConfig,
    t5_cfg: T5Config,
    vae_cfg: VAEConfig,
    cn_cfg: Optional[ControlNetConfig],
    optimizer,
    num_frames: int = 81,
    max_timestep_boundary: float = 0.358,
    min_timestep_boundary: float = 0.0,
    attn_impl: str = "auto",
    train_lora: bool = False,
    lora_alpha: Optional[float] = None,
    pp_microbatches: Optional[int] = None,
) -> Callable:
    """Returns jitted step(state, frozen, batch, rng) -> (state, metrics).

    frozen: {dit, t5, vae} (non-trainable). batch (host pixels, channels-last):
      video:   (B, T, H, W, 3) in [-1, 1]
      control: (B, T, H, W, 3) in [-1, 1]
      ids/mask: (B, 512) int32

    Trainable selection (reference: ControlNet-only via freeze_except at
    utils.py:550-590; LoRA via --lora_base_model PEFT injection at
    utils.py:450-470, scripts/train/train.py:17):
      - default: state.params is the ControlNet tree (unchanged contract)
      - train_lora=True: state.params = {"lora": adapters[, "controlnet": cn]}
        — adapters merge into the frozen DiT INSIDE the jitted step (the base
        never updates), optionally training the ControlNet jointly.

    pp_microbatches: with a mesh that has a "pp" axis > 1, pipeline the DiT
    trunk over it in this many microbatches (wan_dit.pp_run_blocks).
    """
    schedule = fm.make_schedule(
        num_steps=1000, shift=5.0, sigma_min=0.0, extra_one_step=True, training=True
    )
    sigmas = jnp.asarray(schedule.sigmas)
    timesteps = jnp.asarray(schedule.timesteps)
    weights = jnp.asarray(schedule.training_weights)
    lo = int(min_timestep_boundary * schedule.num_train_timesteps)
    hi = int(max_timestep_boundary * schedule.num_train_timesteps)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, frozen: Dict, batch: Dict, rng: jax.Array):
        k_t, k_n = jax.random.split(rng)
        video = batch["video"]
        b, t = video.shape[:2]
        # encode pixels in the VAE's own dtype: f32 conv activations at 81x480x832
        # dominate HBM (the AOT memcheck measured 2x from this alone)
        vae_dtype = jax.tree_util.tree_leaves(frozen["vae"])[0].dtype
        video = video.astype(vae_dtype)
        batch = dict(batch, video=video, control=batch["control"].astype(vae_dtype))

        # Spatially shard the pixel-space VAE activations over (sp, tp): GSPMD
        # partitions the convs (automatic halo exchange), dividing the encoder's
        # transient HBM by the mesh's sp*tp (the v5p memcheck measured 92 GB of
        # per-chip temps with replicated H/W)
        from goal_force_tpu.parallel.mesh import constrain, current_mesh

        # On a pipeline mesh the pp axis joins the spatial sharding: the VAE
        # runs before the pipelined trunk, so its transients should use ALL
        # chips (81x480x832 encodes dominate HBM; 16 GB v5e chips need the
        # full mesh behind them).
        m = current_mesh()
        h_axes = ("pp", "sp") if (m is not None and "pp" in m.axis_names) else "sp"
        shard_px = lambda v: constrain(v, "dp", None, h_axes, "tp", None)
        video = shard_px(video)
        control_px = shard_px(batch["control"])

        # Conditioning (inside the step, as the reference does on-GPU — SURVEY §3.2)
        enc = jax.checkpoint(lambda v: vaem.encode_video(frozen["vae"], vae_cfg, v),
                             prevent_cse=False)
        # Latents return to the standard (dp, sp) layout: downstream consumers
        # (ControlNet side-stack, patchify) constrain against it, and leaving
        # the pp-spatial pixel sharding on them trips inexpressible reshards in
        # the remat backward.
        lat_layout = lambda z: constrain(z, "dp", None, "sp", "tp", None)
        x0 = lat_layout(enc(video))
        control_latents = lat_layout(enc(control_px))
        first = jnp.concatenate(
            [video[:, :1], jnp.zeros_like(video[:, 1:])], axis=1
        )
        cond = lat_layout(enc(shard_px(first)))
        lat_f = (t - 1) // 4 + 1
        mask = jnp.asarray(build_i2v_mask(t, lat_f, cond.shape[2], cond.shape[3]))
        y = jnp.concatenate([jnp.broadcast_to(mask[None], (*cond.shape[:-1], 4)), cond], axis=-1)
        context = t5m.t5_encode(frozen["t5"], t5_cfg, batch["ids"], batch["mask"])
        context = context * (batch["mask"][..., None] > 0)

        # One timestep per step (reference samples a single id per rank :183)
        tid = jax.random.randint(k_t, (), lo, hi)
        sigma = sigmas[tid]
        timestep = jnp.full((b,), timesteps[tid], x0.dtype)
        weight = weights[tid]
        noise = jax.random.normal(k_n, x0.shape, x0.dtype)

        def loss_fn(trainable):
            if train_lora:
                from goal_force_tpu.lora import merge_lora

                dit = merge_lora(frozen["dit"], trainable["lora"],
                                 alpha=lora_alpha
                                 or next(iter(trainable["lora"].values()))
                                 ["a"].shape[-1])
                cn_params = trainable.get("controlnet")
            else:
                dit, cn_params = frozen["dit"], trainable
            return training_loss(
                dit, cn_params, dit_cfg, cn_cfg if cn_params is not None else None,
                x0, noise, sigma, timestep, weight, context, y,
                control_latents if cn_params is not None else None,
                attn_impl=attn_impl, pp_microbatches=pp_microbatches,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        gnorm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": gnorm, "timestep": timesteps[tid]}
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


def host_batch(video: np.ndarray, control: np.ndarray, ids: np.ndarray, mask: np.ndarray) -> Dict:
    """Assemble a device batch from host arrays (pixels already in [-1, 1])."""
    return {
        "video": jnp.asarray(video),
        "control": jnp.asarray(control),
        "ids": jnp.asarray(ids),
        "mask": jnp.asarray(mask),
    }
