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
    """Move a param tree to pinned host memory, PRESERVING each leaf's sharding
    layout (mesh-sharded leaves keep their per-chip partitioning, so the later
    swap back to HBM is a pure host<->device DMA with no resharding collective).
    Falls back to numpy device_get where pinned_host is unsupported."""
    if not _memory_kind_supported("pinned_host"):
        return jax.tree_util.tree_map(lambda a: jax.device_get(a), params)

    def put(a):
        try:
            hs = a.sharding.with_memory_kind("pinned_host")
        except Exception:
            hs = jax.sharding.SingleDeviceSharding(
                jax.devices()[0], memory_kind="pinned_host"
            )
        return jax.device_put(a, hs)

    return jax.tree_util.tree_map(put, params)


def stage_to_device(params: Dict, sharding: Optional[jax.sharding.Sharding] = None) -> Dict:
    """Bring a host-staged tree (back) into device memory. With no explicit
    sharding, each leaf returns to its own layout with memory kind "device"
    (numpy leaves from the fallback path go to the default device)."""
    def put(a):
        if sharding is not None:
            return jax.device_put(a, sharding)
        try:
            return jax.device_put(a, a.sharding.with_memory_kind("device"))
        except Exception:
            return jax.device_put(a, jax.devices()[0])

    return jax.tree_util.tree_map(put, params)


class ExpertStager:
    """Keeps one expert resident, the other host-staged; swap() flips them.

    Usage in the denoise loop: at the boundary step call swap() once; the jitted step
    function is reused as-is because both experts share the same pytree structure.
    `device_place` overrides the single-sharding default with an arbitrary placement
    function (e.g. per-leaf NamedShardings from inference_param_specs)."""

    def __init__(self, active: Dict, standby: Dict,
                 device_sharding: Optional[jax.sharding.Sharding] = None,
                 device_place=None):
        self._place = device_place or (lambda t: stage_to_device(t, device_sharding))
        self.active = self._place(active)
        self.standby = stage_to_host(standby)

    def swap(self) -> Dict:
        new_active = self._place(self.standby)
        self.standby = stage_to_host(self.active)
        self.active = new_active
        return self.active
