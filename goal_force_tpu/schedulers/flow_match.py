"""Rectified-flow (flow matching) schedule as pure functions.

Numerics mirror /root/reference/diffsynth/schedulers/flow_match.py:
  - shifted sigmas  sigma' = s*sigma / (1 + (s-1)*sigma)          (:53)
  - Euler step      x_next = x + v * (sigma_next - sigma)         (:81)
  - add_noise       x_t = (1-sigma)*x0 + sigma*eps                (:99)
  - target          v = eps - x0                                  (:104)
  - training weights: Gaussian bell over timestep values          (:62-66)

Unlike the reference (a stateful class whose `step` does a nearest-timestep argmin on every
call), the schedule here is a frozen table computed once on host; the denoise loop indexes it
by step id, which is static under jit.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FlowMatchSchedule:
    sigmas: np.ndarray        # (N,) float32, descending for generation
    timesteps: np.ndarray     # (N,) float32, sigmas * num_train_timesteps
    num_train_timesteps: int
    training: bool = False
    training_weights: np.ndarray | None = None  # (N,) float32 when training
    final_sigma: float = 0.0  # 1.0 for inverse/reversed schedules (ref :78)

    def __len__(self) -> int:
        return int(self.sigmas.shape[0])

    def sigma_next(self, i: int) -> float:
        """sigma after step i (final_sigma at the end — reference
        flow_match.py:77-80: 1 when inverse_timesteps or reverse_sigmas,
        else 0)."""
        return float(self.sigmas[i + 1]) if i + 1 < len(self) \
            else self.final_sigma


def make_schedule(
    num_steps: int = 50,
    shift: float = 5.0,
    sigma_min: float = 0.0,
    sigma_max: float = 1.0,
    extra_one_step: bool = True,
    denoising_strength: float = 1.0,
    num_train_timesteps: int = 1000,
    training: bool = False,
    exponential_shift: bool = False,
    exponential_shift_mu: float | None = None,
    shift_terminal: float | None = None,
    dynamic_shift_len: int | None = None,
    inverse_timesteps: bool = False,
    reverse_sigmas: bool = False,
) -> FlowMatchSchedule:
    """Build the sigma/timestep table.

    Defaults match the goal-force pipeline scheduler: shift=5, sigma_min=0,
    extra_one_step=True (/root/reference/src/goal_force/wan_video_new.py:127).
    """
    sigma_start = sigma_min + (sigma_max - sigma_min) * denoising_strength
    if extra_one_step:
        sigmas = np.linspace(sigma_start, sigma_min, num_steps + 1, dtype=np.float64)[:-1]
    else:
        sigmas = np.linspace(sigma_start, sigma_min, num_steps, dtype=np.float64)
    if inverse_timesteps:
        sigmas = sigmas[::-1].copy()
    if exponential_shift:
        if exponential_shift_mu is not None:
            mu = exponential_shift_mu
        elif dynamic_shift_len is not None:
            mu = calculate_shift(dynamic_shift_len)
        else:
            mu = 0.0
        sigmas = math.exp(mu) / (math.exp(mu) + (1.0 / sigmas - 1.0))
    else:
        sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
    if shift_terminal is not None:
        one_minus = 1.0 - sigmas
        scale = one_minus[-1] / (1.0 - shift_terminal)
        sigmas = 1.0 - one_minus / scale
    if reverse_sigmas:
        sigmas = 1.0 - sigmas
    timesteps = sigmas * num_train_timesteps

    weights = None
    if training:
        # Gaussian bell over timestep *values*, normalized to sum num_steps
        # (reference flow_match.py:62-66; note it reuses num_inference_steps as the scale).
        x = timesteps
        y = np.exp(-2.0 * ((x - num_steps / 2.0) / num_steps) ** 2)
        y_shifted = y - y.min()
        weights = (y_shifted * (num_steps / y_shifted.sum())).astype(np.float32)

    return FlowMatchSchedule(
        sigmas=sigmas.astype(np.float32),
        timesteps=timesteps.astype(np.float32),
        num_train_timesteps=num_train_timesteps,
        training=training,
        training_weights=weights,
        final_sigma=1.0 if (inverse_timesteps or reverse_sigmas) else 0.0,
    )


def calculate_shift(image_seq_len: int, base_seq_len: int = 256,
                    max_seq_len: int = 8192, base_shift: float = 0.5,
                    max_shift: float = 0.9) -> float:
    """Sequence-length-dependent exponential-shift mu (reference
    flow_match.py:114-126)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    return image_seq_len * m + (base_shift - m * base_seq_len)


def euler_step(sample: jnp.ndarray, velocity: jnp.ndarray, sigma, sigma_next) -> jnp.ndarray:
    """x_{t+1} = x_t + v * (sigma_next - sigma)  (reference flow_match.py:81)."""
    return sample + velocity * (jnp.asarray(sigma_next, sample.dtype) - jnp.asarray(sigma, sample.dtype))


def add_noise(x0: jnp.ndarray, noise: jnp.ndarray, sigma) -> jnp.ndarray:
    """x_t = (1-sigma)*x0 + sigma*eps  (reference flow_match.py:99)."""
    sigma = jnp.asarray(sigma, x0.dtype)
    return (1.0 - sigma) * x0 + sigma * noise


def training_target(x0: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """v-target = eps - x0  (reference flow_match.py:104)."""
    return noise - x0


def timestep_to_id(schedule: FlowMatchSchedule, timestep: float) -> int:
    """Nearest-timestep lookup (reference flow_match.py:75). Host-side helper."""
    return int(np.argmin(np.abs(schedule.timesteps - timestep)))
