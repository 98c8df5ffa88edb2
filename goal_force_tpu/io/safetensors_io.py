"""Weight file IO: safetensors / torch .pth -> numpy dicts, and reference-format
checkpoint compatibility in both directions.

Replaces ModelManager's hash-detect-and-convert loading
(/root/reference/diffsynth/models/model_manager.py:395-461) with explicit loaders:
the caller says what the file is; converters in io/torch_convert.py map names/layouts.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Dict, List, Optional, Sequence, Union

import numpy as np


def load_safetensors(paths: Union[str, Sequence[str]]) -> Dict[str, np.ndarray]:
    """Load one file, a glob, or a list of shards into one flat numpy dict."""
    from safetensors.numpy import load_file

    if isinstance(paths, str):
        expanded = sorted(glob.glob(paths)) if any(c in paths for c in "*?[") else [paths]
    else:
        expanded = list(paths)
    out: Dict[str, np.ndarray] = {}
    for p in expanded:
        out.update(load_file(p))
    return out


def load_torch_pth(path: str) -> Dict[str, np.ndarray]:
    """Load a torch pickle checkpoint (e.g. Wan2.1_VAE.pth, umt5 enc) to numpy.

    Handles the 'model_state' wrapper the reference unwraps at wan_video_vae.py:1262-1263.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model_state" in sd:
        sd = sd["model_state"]
    return {k: v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
            for k, v in sd.items()}


def save_safetensors(tensors: Dict[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_file(tensors, path)


# ---------------------------------------------------------------------------
# Goal-force ControlNet checkpoint compatibility
# ---------------------------------------------------------------------------

CKPT_PREFIX = "pipe.controlnet."  # reference strip at src/goal_force/wan_video_new.py:178


def load_goalforce_controlnet(path: str, cn_cfg) -> Dict:
    """Load a reference 'step-K.safetensors' ControlNet checkpoint into our pytree."""
    from goal_force_tpu.io.torch_convert import controlnet_params_from_torch

    sd = load_safetensors(path)
    sd = {k[len(CKPT_PREFIX):] if k.startswith(CKPT_PREFIX) else k: v for k, v in sd.items()}
    return controlnet_params_from_torch(sd, cn_cfg)


def export_goalforce_controlnet(params: Dict, cn_cfg, dit_patch=(1, 2, 2)) -> Dict[str, np.ndarray]:
    """Inverse converter: our ControlNet pytree -> reference state-dict naming/layouts,
    so checkpoints trained here load into the reference implementation."""
    out: Dict[str, np.ndarray] = {}
    p = {k: np.asarray(v, np.float32) for k, v in _flatten(params).items()}

    def put(name, arr):
        out[CKPT_PREFIX + name] = np.ascontiguousarray(arr)

    # patch embedding: (C*pf*ph*pw, D) -> (D, C, pf, ph, pw)
    w = p["patch_embedding.w"]
    d = w.shape[1]
    pf, ph, pw = dit_patch
    c = w.shape[0] // (pf * ph * pw)
    put("controlnet_patch_embedding.patch_embedding.weight",
        w.T.reshape(d, c, pf, ph, pw))
    put("controlnet_patch_embedding.patch_embedding.bias", p["patch_embedding.b"])

    n = cn_cfg.num_layers
    for i in range(n):
        base = f"controlnet_dit.blocks.{i}"
        for attn in ("self_attn", "cross_attn"):
            for lin in ("q", "k", "v", "o"):
                put(f"{base}.{attn}.{lin}.weight", p[f"blocks.{attn}.{lin}.w"][i].T)
                put(f"{base}.{attn}.{lin}.bias", p[f"blocks.{attn}.{lin}.b"][i])
            put(f"{base}.{attn}.norm_q.weight", p[f"blocks.{attn}.norm_q.w"][i])
            put(f"{base}.{attn}.norm_k.weight", p[f"blocks.{attn}.norm_k.w"][i])
        put(f"{base}.norm3.weight", p["blocks.norm3.w"][i])
        put(f"{base}.norm3.bias", p["blocks.norm3.b"][i])
        put(f"{base}.ffn.0.weight", p["blocks.ffn.fc0.w"][i].T)
        put(f"{base}.ffn.0.bias", p["blocks.ffn.fc0.b"][i])
        put(f"{base}.ffn.2.weight", p["blocks.ffn.fc2.w"][i].T)
        put(f"{base}.ffn.2.bias", p["blocks.ffn.fc2.b"][i])
        put(f"{base}.modulation", p["blocks.modulation"][i][None])
        put(f"controlnet_zero_convs_after.{i}.weight", p["zero_convs.w"][i].T[:, :, None])
        put(f"controlnet_zero_convs_after.{i}.bias", p["zero_convs.b"][i])
    return out


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


# ---------------------------------------------------------------------------
# Full training-state checkpoints (params + optimizer state + step)
# ---------------------------------------------------------------------------

def train_state_path(ckpt_dir: str, step: int) -> str:
    return os.path.join(ckpt_dir, f"state-{step}.safetensors")


def save_train_state(state, path: str) -> None:
    """Serialize a FULL TrainState — trainable params, optimizer state (Adam
    moments, clip/accum counters), and the step — into one safetensors file
    keyed by jax tree key-paths.

    This EXCEEDS the reference, which checkpoints trainable weights only and
    silently reinitializes Adam moments on resume
    (/root/reference/src/goal_force/utils.py:786-790 — SURVEY.md §5). Leaf
    dtypes are preserved (training state is fp32/int32; bf16 leaves would
    need the torch safetensors backend and fail loudly here)."""
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    tensors = {jax.tree_util.keystr(kp): np.ascontiguousarray(np.asarray(leaf))
               for kp, leaf in flat}
    save_safetensors(tensors, path)


def load_train_state(path: str, template):
    """Inverse of save_train_state: rebuild a TrainState with the TEMPLATE's
    tree structure (params init + optimizer.init + step) and the file's
    leaves. Key-path and shape mismatches fail loudly — a changed optimizer
    or model config cannot silently load a stale state."""
    import jax
    import jax.numpy as jnp

    sd = load_safetensors(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    if len(sd) != len(flat):
        raise ValueError(
            f"{path}: {len(sd)} tensors vs {len(flat)} state leaves — "
            "optimizer/model config changed since this state was saved")
    leaves = []
    for kp, leaf in flat:
        key = jax.tree_util.keystr(kp)
        if key not in sd:
            raise KeyError(f"{path}: missing state leaf {key}")
        arr = sd[key]
        want = tuple(np.shape(leaf))
        if tuple(arr.shape) != want:
            # safetensors stores 0-d scalars back as (1,) — accept shapes
            # that differ only in size-1 dims, reject anything else
            if tuple(s for s in arr.shape if s != 1) == \
                    tuple(s for s in want if s != 1):
                arr = arr.reshape(want)
            else:
                raise ValueError(f"{path}: {key} shape {arr.shape} != {want}")
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def find_latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """step-K.safetensors with the largest K (resume semantics of
    /root/reference/scripts/train/resume_training_goal_force.sh)."""
    cands: List[tuple] = []
    for p in glob.glob(os.path.join(ckpt_dir, "step-*.safetensors")):
        m = re.search(r"step-(\d+)\.safetensors$", p)
        if m:
            cands.append((int(m.group(1)), p))
    return max(cands)[1] if cands else None


def checkpoint_step(path: str) -> int:
    m = re.search(r"step-(\d+)\.safetensors$", path)
    return int(m.group(1)) if m else 0
