"""Attention dispatch.

The reference picks FlashAttention-3 -> FlashAttention-2 -> SageAttention -> torch SDPA at
import time (/root/reference/diffsynth/models/wan_video_dit.py:9-61). Here the backends are
TPU-native: a Pallas flash-attention kernel for long self-attention, and an XLA einsum path
(f32 softmax) as the always-correct fallback/reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, scale, bias=None, kv_len=None):
    """(B, S, N, H) einsum attention with f32 softmax."""
    logits = jnp.einsum("bsnh,btnh->bnst", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if kv_len is not None:
        kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (q.shape[0],))
        col = jnp.arange(k.shape[1], dtype=jnp.int32)
        logits = jnp.where(col[None, None, None, :] < kv_len[:, None, None, None],
                           logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bnst,btnh->bsnh", probs, v)


def attention(q, k, v, impl: str = "auto", scale: float | None = None,
              bias=None, bounded: bool = False, kv_len=None):
    """q: (B, Sq, N, H); k/v: (B, Skv, N, H) -> (B, Sq, N, H).

    impl: "auto" | "xla" | "pallas". "auto" uses the Pallas flash kernel on TPU when shapes
    qualify, else XLA. Under an ambient mesh the Pallas call is wrapped in shard_map
    (heads over ("sp","tp"), batch over "dp" — the Ulysses layout; Mosaic kernels
    cannot be GSPMD-partitioned automatically).

    bias: optional additive attention bias (B, 1|N, Sq, Skv) — e.g. the EliGen
    entity mask. Forces the XLA path (the flash kernel has no bias operand).

    bounded: the caller's architecture keeps softmax logits small (e.g.
    qk-RMS-normed attention), so the flash kernel statically takes its max-free
    path — skipping the runtime overflow dispatch (~20 ms/block at the Wan A14B
    shape) in favor of a saturating clamp that is exact for all realistic
    logits (flash_attention.NOMAX_CLAMP).

    kv_len: optional per-batch valid-key count (scalar or (B,) int array);
    queries never attend to keys at index >= kv_len (prefix-valid varlen, e.g.
    HunyuanVideo's [img ++ valid-text] joint attention). Inference-only on the
    pallas path.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if bias is not None:
        return _xla_attention(q, k, v, scale, bias, kv_len)
    if impl == "ring":
        from goal_force_tpu.parallel.mesh import current_mesh

        mesh = current_mesh()
        sp = mesh.shape.get("sp", 1) if mesh is not None else 1
        if (sp > 1 and kv_len is None and q.shape[1] % sp == 0
                and k.shape[1] % sp == 0):
            return _ring_sharded(q, k, v, scale, mesh)
        impl = "auto"      # ring of 1 (or indivisible) == plain attention
    if impl == "auto":
        impl = _default_impl(q)
    if impl in ("pallas", "pallas_int8"):
        from goal_force_tpu.parallel.mesh import current_mesh

        mesh = current_mesh()
        if mesh is not None and any(mesh.shape[a] > 1 for a in mesh.axis_names):
            return _pallas_sharded(q, k, v, scale, mesh, impl, bounded, kv_len)
    if impl == "pallas":
        from goal_force_tpu.ops.flash_attention import flash_attention as _pallas

        return _pallas(q, k, v, scale=scale,
                       dispatch="nomax" if bounded else "auto", kv_len=kv_len)
    if impl == "pallas_int8":
        from goal_force_tpu.ops.flash_attention import flash_attention_int8 as _pallas8

        if kv_len is None:
            return _pallas8(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale, kv_len=kv_len)


def _shard_map_nestable(f, mesh, in_specs, out_specs):
    """shard_map that also works INSIDE a partially-manual region.

    pp_run_blocks runs its stage bodies under a shard_map that is manual over
    "pp" only (wan_dit.py) — the kernel dispatch here must then nest as an
    inner shard_map over the remaining (auto) axes. Passing the concrete mesh
    in that context is an error ("context mesh should match"), so detect
    manual axes on the ambient abstract mesh and switch to the axis_names
    form. At top level the classic full-manual form is used unchanged."""
    manual_axes = set()
    try:
        from jax.sharding import AxisType

        am = jax.sharding.get_abstract_mesh()
        if am is not None and am.axis_names:
            manual_axes = {n for n, t in zip(am.axis_names, am.axis_types)
                           if t == AxisType.Manual}
    except Exception:
        manual_axes = set()
    if manual_axes:
        names = set(mesh.axis_names) - manual_axes
        return jax.shard_map(f, in_specs=in_specs, out_specs=out_specs,
                             axis_names=names, check_vma=False)
    from jax.experimental.shard_map import shard_map

    return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_rep=False)


def _ring_sharded(q, k, v, scale, mesh):
    """impl="ring": tokens STAY sequence-sharded over "sp" and KV blocks rotate
    the ring via ppermute (parallel/ring_attention.py) — the alternative the
    reference plumbs but never enables (ring_degree hardcoded to 1 at
    /root/reference/src/goal_force/wan_video_new.py:460-463). Unlike the
    Ulysses layout this never reshards tokens<->heads, so it also serves
    meshes where sp exceeds the head count's divisibility. Heads additionally
    split over "tp" when divisible; batch over "dp". Point-to-point ppermute
    traffic rides neighbor ICI links instead of all-to-alls."""
    from jax.sharding import PartitionSpec as P

    from goal_force_tpu.parallel.ring_attention import ring_attention

    b, _, n, _ = q.shape
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    bspec = "dp" if dp > 1 and b % dp == 0 else None
    hspec = "tp" if tp > 1 and n % tp == 0 else None
    spec = P(bspec, "sp", hspec, None)
    sp = mesh.shape["sp"]

    def local(q, k, v):
        return ring_attention(q, k, v, scale, "sp", sp)

    return _shard_map_nestable(local, mesh, (spec, spec, spec), spec)(q, k, v)


def _pallas_sharded(q, k, v, scale, mesh, impl, bounded=False, kv_len=None):
    """shard_map wrapper: each device runs the flash kernel on its own heads (and its
    own batch rows) — the GSPMD equivalent of xfuser's Ulysses all-to-all attention
    (/root/reference/diffsynth/distributed/xdit_context_parallel.py:121-126); XLA
    inserts the token<->head all-to-alls to satisfy the in/out specs."""
    from jax.sharding import PartitionSpec as P

    b, _, n, _ = q.shape
    dp = mesh.shape.get("dp", 1)
    head_axes = tuple(a for a in ("sp", "tp") if mesh.shape.get(a, 1) > 1)
    n_shards = 1
    for a in head_axes:
        n_shards *= mesh.shape[a]
    if n % n_shards != 0 or b % dp != 0:
        # indivisible: XLA partitions fine
        return _xla_attention(q, k, v, scale, kv_len=kv_len)
    bspec = "dp" if dp > 1 else None
    spec = P(bspec, None, head_axes if head_axes else None, None)

    if kv_len is not None:
        # varlen (inference-only: bypasses the custom-vjp entry)
        kv_arr = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))

        def local_varlen(q, k, v, kv_len):
            from goal_force_tpu.ops.flash_attention import flash_attention as fa

            return fa(q, k, v, scale=scale,
                      dispatch="nomax" if bounded else "auto", kv_len=kv_len)

        fn = _shard_map_nestable(local_varlen, mesh,
                                 (spec, spec, spec, P(bspec)), spec)
        return fn(q, k, v, kv_arr)

    def local(q, k, v):
        if impl == "pallas_int8":
            from goal_force_tpu.ops.flash_attention import flash_attention_int8 as fa8

            return fa8(q, k, v, scale=scale)
        from goal_force_tpu.ops.flash_attention import flash_attention as fa

        return fa(q, k, v, scale=scale,
                  dispatch="nomax" if bounded else "auto")

    fn = _shard_map_nestable(local, mesh, (spec, spec, spec), spec)
    return fn(q, k, v)


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _default_impl(q) -> str:
    if not _on_tpu():
        return "xla"
    # Pallas kernel needs lane-aligned head dim and enough tokens to tile.
    if q.shape[-1] % 128 == 0 and q.shape[1] >= 256:
        return "pallas"
    return "xla"
