"""Param sharding specs.

Replaces DeepSpeed ZeRO-2 (optimizer-state sharding; accelerate YAMLs at
/root/reference/scripts/accelerate/) and the AutoWrapped VRAM offload layer
(/root/reference/diffsynth/vram_management/layers.py) with NamedSharding placement:
tensor-parallel specs for inference, FSDP-style largest-dim sharding for training state.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _dit_leaf_spec(path: str, ndim: int) -> P:
    """Tensor-parallel spec for a DiT/ControlNet leaf (stacked-block leaves have a
    leading layer dim that must stay unsharded for scan)."""
    stacked = path.startswith("blocks") or path.startswith("zero_convs")
    # Column-parallel: qkv + ffn-in project dim -> shard output dim over tp.
    col = any(s in path for s in (".q.w", ".k.w", ".v.w", "fc0.w"))
    row = any(s in path for s in (".o.w", "fc2.w"))
    if ndim >= 2 and col:
        return P(*([None] * (ndim - 1)), "tp")
    if ndim >= 2 and row:
        return P(*([None] * (ndim - 2)), "tp", None)
    if col and ndim == 1:  # biases of column-parallel layers
        return P("tp") if not stacked else P(None, "tp")
    return P()


def _flatten_path(kp) -> str:
    parts = []
    for k in kp:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
    return ".".join(parts)


def _divisible(spec: P, shape, mesh: Mesh) -> P:
    """Drop a spec whose sharded dims don't divide by the mesh axis sizes (tiny test
    configs; odd head counts)."""
    for d, axes in enumerate(spec):
        if axes is None:
            continue
        axes = axes if isinstance(axes, tuple) else (axes,)
        n = 1
        for a in axes:
            n *= mesh.shape[a]
        if d >= len(shape) or shape[d] % n != 0:
            return P()
    return spec


def inference_param_specs(params, mesh: Optional[Mesh] = None) -> dict:
    """Tensor-parallel PartitionSpecs for DiT-shaped param trees. With `mesh`,
    specs that don't divide the leaf shape fall back to replicated. On a
    pipeline mesh, MAIN DiT stacked-block layer axes additionally pin to "pp"
    (pp_run_blocks' stage-major layout); the ControlNet side-stack is not
    pipelined and keeps its layer axis replicated."""
    def spec(kp, leaf):
        path = _flatten_path(kp)
        is_cn = path.startswith(("controlnet.", "controlnet2."))
        # strip leading container names (dit/controlnet/...)
        for prefix in ("dit.", "dit2.", "controlnet.", "controlnet2."):
            if path.startswith(prefix):
                path = path[len(prefix):]
        s = _dit_leaf_spec(path, leaf.ndim)
        if mesh is not None:
            s = _divisible(s, leaf.shape, mesh)
        stacked = path.startswith("blocks") or path.startswith("zero_convs")
        if (mesh is not None and not is_cn and stacked and leaf.ndim > 1
                and "pp" in mesh.axis_names
                and leaf.shape[0] % mesh.shape["pp"] == 0):
            rest = list(s) + [None] * (leaf.ndim - len(s))
            s = P("pp", *rest[1:])
        return s

    return jax.tree_util.tree_map_with_path(spec, params)


def fsdp_specs(params, mesh: Mesh, axes=("dp", "sp"), min_size: int = 2**15,
               pp_stage_fsdp: bool = False, pin_pp_layers: bool = True) -> dict:
    """Shard each leaf's largest divisible non-layer dim over `axes` (FSDP-style;
    replaces ZeRO sharding of params/grads/optimizer state).

    pp_stage_fsdp: on a pipeline mesh, ALSO FSDP-shard stacked block weights
    within each stage group (HBM-tight topologies, e.g. A14B training on 16 GB
    v5e chips). Off by default: the per-layer all-gather inside the manually
    partitioned stage vmap crosses a device-order transpose GSPMD logs as an
    involuntary full rematerialization (correct, just noisy/extra-hop).

    pin_pp_layers: pin stacked layer axes to "pp" on pipeline meshes (the
    pp_run_blocks stage-major layout). Pass False for stacks that are NOT
    pipelined (e.g. the ControlNet side-stack, which runs before the trunk)."""
    axes_full = tuple(axes)                      # non-pipelined leaves FSDP here
    axes = tuple(a for a in axes if a != "pp")   # "pp" is the layer axis, below
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    n_full = 1
    for a in axes_full:
        n_full *= mesh.shape[a]

    def spec(kp, leaf):
        if leaf.size < min_size or leaf.ndim == 0:
            return P()
        if leaf.ndim >= 4:
            # conv kernels stay replicated: sharding them makes GSPMD propagate
            # kernel-dim shardings into the conv activations, forcing involuntary
            # full rematerializations throughout the VAE (measured: 9 per encode
            # on the dp2/sp2/tp2 dryrun mesh; 0 replicated). The VAE is <2% of
            # A14B bytes — the FSDP win lives in the DiT/T5 matrices.
            return P()
        path = _flatten_path(kp)
        if "modulation" in path:
            # AdaLN modulation tables are tiny (6*D per block) and their grads
            # accumulate inside the scanned block backward — sharding them
            # trips involuntary rematerializations there for ~0 memory win
            return P()
        stacked = ".blocks." in f".{path}." or path.startswith("blocks")
        start = 1 if (stacked and leaf.ndim > 1) else 0
        dims = list(range(start, leaf.ndim))
        if not dims:
            return P()
        out = [None] * leaf.ndim
        # On a pipeline mesh, the stacked layer axis IS the weight-sharding
        # axis: stage s's layers live on stage s's devices (matching
        # pp_run_blocks' stage-major layout), and the other dims stay
        # replicated within the stage group — FSDP-sharding them too makes the
        # per-layer dynamic-slice inside the manually-partitioned stage vmap
        # need a device-order-transposed all-gather GSPMD cannot express
        # (involuntary full rematerialization per weight).
        # Only the pipelined DiT trunk ("dit.*" subtrees or a bare "blocks"
        # root) gets the stage-major pin — T5/VAE/ControlNet stacks run
        # unpipelined and must keep their layer axis whole for their scans.
        pipelined = path.startswith(("dit", "blocks"))
        if (pin_pp_layers and stacked and pipelined and leaf.ndim > 1
                and "pp" in mesh.axis_names
                and leaf.shape[0] % mesh.shape["pp"] == 0):
            out[0] = "pp"
            if not pp_stage_fsdp:
                return P(*out)
        best = max(dims, key=lambda d: leaf.shape[d])
        if out[0] != "pp" and "pp" in axes_full:
            # NON-pipelined leaf on a pipeline mesh (ControlNet side-stack,
            # T5/VAE, the DiT embeds/head): FSDP over ALL devices including
            # the pp groups — it runs as a plain scan outside the manual
            # region, so this is the ordinary pp=1 FSDP situation. Leaving
            # "pp" out replicates it per stage group (measured +3.25 GB/chip
            # for the 10-block ControlNet at pp4 x sp2).
            if leaf.shape[best] % n_full == 0:
                out[best] = axes_full
                return P(*out)
        if leaf.shape[best] % n != 0:
            return P(*out) if out[0] else P()
        out[best] = axes
        return P(*out)

    return jax.tree_util.tree_map_with_path(spec, params)


def place(tree, mesh: Optional[Mesh], specs=None):
    """device_put the tree with NamedShardings (replicated where spec is None/empty)."""
    if mesh is None:
        return tree

    def put(leaf, spec):
        s = NamedSharding(mesh, spec if spec is not None else P())
        return jax.device_put(leaf, s)

    if specs is None:
        specs = jax.tree_util.tree_map(lambda _: P(), tree)
    return jax.tree_util.tree_map(put, tree, specs)
