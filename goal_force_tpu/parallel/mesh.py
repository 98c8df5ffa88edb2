"""Device mesh + activation-sharding helpers.

Replaces the reference's NCCL/xfuser Ulysses sequence parallel
(/root/reference/diffsynth/distributed/xdit_context_parallel.py:1-131 and the inline SP
branches at /root/reference/src/goal_force/wan_video_new.py:1422-1438,1526-1531,1582-1585)
with ONE jitted computation over a named mesh: tokens are sharded over "sp" between blocks,
heads over ("sp","tp") inside attention, and XLA inserts the all-to-alls/all-gathers that
xfuser performed by hand over NCCL.

Axes:
  dp — data (batches / clips); gradients psum here implicitly.
  sp — sequence (tokens) outside attention, heads inside (Ulysses via GSPMD).
  tp — tensor (attention heads / ffn columns).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("dp", "sp", "tp")
MESH_AXES_PP = ("pp", "dp", "sp", "tp")

_current_mesh: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "gf_mesh", default=None
)


def make_mesh(dp: int = 1, sp: int = 1, tp: int = 1, pp: int = 1, devices=None) -> Mesh:
    """Device mesh over (dp, sp, tp) — plus a "pp" pipeline axis when pp > 1.

    pp is outermost so each stage's (dp, sp, tp) group is ICI-contiguous and
    buffer specs P("pp", "dp", "sp") are axis-aligned prefixes of the device
    order (GSPMD cannot reshard across device-order transposes). pp == 1 keeps
    the 3-axis mesh (exact round-2 layout)."""
    devices = devices if devices is not None else jax.devices()
    n = dp * sp * tp * pp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    if pp == 1:
        grid = np.asarray(devices[:n]).reshape(dp, sp, tp)
        return Mesh(grid, MESH_AXES)
    grid = np.asarray(devices[:n]).reshape(pp, dp, sp, tp)
    return Mesh(grid, MESH_AXES_PP)


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh]):
    """Make `mesh` ambient: constrain() calls inside traced code become GSPMD hints."""
    token = _current_mesh.set(mesh)
    try:
        yield mesh
    finally:
        _current_mesh.reset(token)


def current_mesh() -> Optional[Mesh]:
    return _current_mesh.get()


def constrain(x, *spec):
    """with_sharding_constraint against the ambient mesh; no-op without one.

    Inside a partially-manual shard_map region (pp_run_blocks is manual over
    "pp" only) the constraint must be typed with the ABSTRACT context mesh —
    a concrete-mesh NamedSharding carries all-Auto axis types, which the
    region rejects, and its grad transpose creates zeros typed with the Auto
    mesh ("Context mesh ... should match the mesh of sharding"). Spec entries
    naming manual axes are dropped (the data has no such dimension there)."""
    mesh = current_mesh()
    if mesh is None:
        return x
    try:
        am = jax.sharding.get_abstract_mesh()
        if am is not None and not am.empty and not am.are_all_axes_auto:
            from jax.sharding import AxisType

            manual = {n for n, t in zip(am.axis_names, am.axis_types)
                      if t == AxisType.Manual}
            if manual:
                def scrub(e):
                    if isinstance(e, (tuple, list)):
                        kept = tuple(a for a in e if a not in manual)
                        return kept if kept else None
                    return None if e in manual else e

                spec = tuple(scrub(e) for e in spec)
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(am, P(*spec)))
    except Exception:
        pass
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
