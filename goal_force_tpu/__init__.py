"""goal_force_tpu — TPU-native physics-conditioned video generation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of brown-palm/goal-force
(Wan2.2-I2V-A14B two-expert flow-matching video DiT + umt5-xxl + 3D causal VAE +
force/mass ControlNet). See DESIGN.md for the architecture and SURVEY.md for the
reference inventory this implements.
"""

__version__ = "0.1.0"

from goal_force_tpu import configs  # noqa: F401
