"""Host-DRAM staging for the off-duty expert.

The reference shuttles whole models CPU<->GPU per denoise phase (load_models_to_device,
/root/reference/diffsynth/utils/__init__.py:94-114; the expert swap at
src/goal_force/wan_video_new.py:697-704). On TPU the equivalent is memory-kind placement:
keep the active expert in device HBM and stage the other in pinned host memory, swapping
once at the 0.875 boundary — no recompilation (both experts share one pytree structure).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax


def _memory_kind_supported(kind: str) -> bool:
    try:
        dev = jax.devices()[0]
        return kind in [m.kind for m in dev.addressable_memories()]
    except Exception:
        return False


def stage_to_host(params: Dict) -> Dict:
    """Move a param tree to pinned host memory (no-op fallback where unsupported)."""
    if not _memory_kind_supported("pinned_host"):
        return jax.tree_util.tree_map(lambda a: jax.device_get(a), params)
    sharding = jax.sharding.SingleDeviceSharding(
        jax.devices()[0], memory_kind="pinned_host"
    )
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), params)


def stage_to_device(params: Dict, sharding: Optional[jax.sharding.Sharding] = None) -> Dict:
    """Bring a host-staged tree (back) into device memory, optionally sharded."""
    if sharding is None:
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), params)


class ExpertStager:
    """Keeps one expert resident, the other host-staged; swap() flips them.

    Usage in the denoise loop: at the boundary step call swap() once; the jitted step
    function is reused as-is because both experts share the same pytree structure."""

    def __init__(self, active: Dict, standby: Dict,
                 device_sharding: Optional[jax.sharding.Sharding] = None):
        self._sharding = device_sharding
        self.active = stage_to_device(active, device_sharding)
        self.standby = stage_to_host(standby)

    def swap(self) -> Dict:
        new_active = stage_to_device(self.standby, self._sharding)
        self.standby = stage_to_host(self.active)
        self.active = new_active
        return self.active
