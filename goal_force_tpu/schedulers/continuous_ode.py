"""Karras-style continuous ODE scheduler.

Numerics mirror /root/reference/diffsynth/schedulers/continuous_ode.py: rho-spaced sigmas,
timesteps = 0.25*log(sigma), EDM-style preconditioned Euler step.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class ContinuousODESchedule:
    sigmas: np.ndarray
    timesteps: np.ndarray

    def __len__(self):
        return int(self.sigmas.shape[0])


def make_continuous_ode_schedule(
    num_inference_steps: int = 100,
    sigma_max: float = 700.0,
    sigma_min: float = 0.002,
    rho: float = 7.0,
    denoising_strength: float = 1.0,
) -> ContinuousODESchedule:
    ramp = np.linspace(1 - denoising_strength, 1, num_inference_steps, dtype=np.float64)
    min_ir, max_ir = sigma_min ** (1 / rho), sigma_max ** (1 / rho)
    sigmas = (max_ir + ramp * (min_ir - max_ir)) ** rho
    return ContinuousODESchedule(sigmas.astype(np.float32),
                                 (0.25 * np.log(sigmas)).astype(np.float32))


def ode_step(schedule: ContinuousODESchedule, model_output, step_id: int, sample,
             to_final=False):
    sigma = float(schedule.sigmas[step_id])
    s2p1 = (sigma * sigma + 1) ** 0.5
    sample = sample * s2p1
    estimated = -sigma / s2p1 * model_output + sample / (sigma * sigma + 1)
    if to_final or step_id + 1 >= len(schedule):
        return estimated
    sigma_n = float(schedule.sigmas[step_id + 1])
    derivative = (sample - estimated) / sigma
    prev = sample + derivative * (sigma_n - sigma)
    return prev / ((sigma_n * sigma_n + 1) ** 0.5)


def ode_add_noise(schedule: ContinuousODESchedule, x0, noise, step_id: int):
    sigma = float(schedule.sigmas[step_id])
    return (x0 + noise * sigma) / ((sigma * sigma + 1) ** 0.5)


def ode_training_target(schedule: ContinuousODESchedule, x0, noise, step_id: int):
    sigma = float(schedule.sigmas[step_id])
    s2p1 = (sigma * sigma + 1) ** 0.5
    return (-s2p1 / sigma + 1 / (s2p1 * sigma)) * x0 + noise / s2p1


def ode_training_weight(schedule: ContinuousODESchedule, step_id: int) -> float:
    sigma = float(schedule.sigmas[step_id])
    return ((1 + sigma * sigma) ** 0.5) / sigma
