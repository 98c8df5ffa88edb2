"""LoRA: inject trainable low-rank adapters, merge them, and load PEFT-format checkpoints.

Parity targets:
  - add_lora_to_model (/root/reference/src/goal_force/utils.py:450-470): rank 32,
    alpha=rank, target modules q,k,v,o,ffn.0,ffn.2 of every DiT block; checkpoint key remap
    lora_A.weight -> lora_A.default.weight.
  - GeneralLoRALoader (/root/reference/diffsynth/lora/__init__.py:5-46): parses
    lora_A/lora_B pairs (stripping a 'diffusion_model.' prefix) and FUSES W += alpha*B@A.

TPU design: adapters live in a parallel pytree keyed like the DiT blocks with stacked
(L, in, r)/(L, r, out) factors; merging is one einsum per target — done inside jit for
training (so the base stays frozen) or once at load for inference.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

# our block-tree paths for the reference's target module names (utils.py:458)
TARGETS = {
    "q": ("self_attn", "q"),
    "k": ("self_attn", "k"),
    "v": ("self_attn", "v"),
    "o": ("self_attn", "o"),
    "cross_q": ("cross_attn", "q"),
    "cross_k": ("cross_attn", "k"),
    "cross_v": ("cross_attn", "v"),
    "cross_o": ("cross_attn", "o"),
    "ffn.0": ("ffn", "fc0"),
    "ffn.2": ("ffn", "fc2"),
}
DEFAULT_TARGETS = ("q", "k", "v", "o", "ffn.0", "ffn.2")


def init_lora(key, dit_params: Dict, rank: int = 32,
              targets: Sequence[str] = DEFAULT_TARGETS, dtype=jnp.float32) -> Dict:
    """A ~ N(0, 1/r) (kaiming-ish), B = 0 — standard PEFT init, so injection starts as
    identity. Returns {target: {"a": (L, in, r), "b": (L, r, out)}}."""
    blocks = dit_params["blocks"]
    out = {}
    keys = jax.random.split(key, len(targets))
    for k_, name in zip(keys, targets):
        path = TARGETS[name]
        w = blocks[path[0]][path[1]]["w"]
        L, din, dout = w.shape
        out[name] = {
            "a": (jax.random.normal(k_, (L, din, rank)) / rank).astype(dtype),
            "b": jnp.zeros((L, rank, dout), dtype),
        }
    return out


def merge_lora(dit_params: Dict, lora: Dict, alpha: float = 1.0,
               rank: Optional[int] = None) -> Dict:
    """Return params with W += (alpha/r)*A@B fused (GeneralLoRALoader semantics).

    jit-safe: use inside the train step to apply trainable adapters to frozen weights.
    """
    params = jax.tree_util.tree_map(lambda x: x, dit_params)  # shallow copy per leaf
    blocks = dict(params["blocks"])
    for name, ab in lora.items():
        grp, leaf = TARGETS[name]
        grp_d = dict(blocks[grp])
        leaf_d = dict(grp_d[leaf])
        r = rank or ab["a"].shape[-1]
        delta = jnp.einsum("lir,lro->lio", ab["a"], ab["b"]) * (alpha / r)
        leaf_d["w"] = leaf_d["w"] + delta.astype(leaf_d["w"].dtype)
        grp_d[leaf] = leaf_d
        blocks[grp] = grp_d
    params = dict(params)
    params["blocks"] = blocks
    return params


# ---------------------------------------------------------------------------
# PEFT checkpoint interop
# ---------------------------------------------------------------------------

_KEY_RE = re.compile(
    r"blocks\.(\d+)\.(self_attn|cross_attn|ffn)\.(q|k|v|o|0|2)\.lora_(A|B)(?:\.default)?\.weight$"
)


def lora_from_peft(sd: Mapping[str, np.ndarray], num_layers: int,
                   dtype=jnp.float32) -> Dict:
    """Parse PEFT lora_A/lora_B keys into our stacked adapter tree.

    Accepts both 'lora_A.weight' and 'lora_A.default.weight' key shapes and strips a
    leading 'diffusion_model.' (reference lora/__init__.py:15-23, utils.py:465-470).
    torch shapes: lora_A (r, in), lora_B (out, r) -> ours a (in, r), b (r, out).
    """
    per_target: Dict[str, Dict[int, Dict[str, np.ndarray]]] = {}
    for key, val in sd.items():
        k = key
        if k.startswith("diffusion_model."):
            k = k[len("diffusion_model."):]
        m = _KEY_RE.search(k)
        if not m:
            continue
        layer, grp, leaf, ab = int(m.group(1)), m.group(2), m.group(3), m.group(4)
        if grp == "ffn":
            name = f"ffn.{leaf}"
        elif grp == "self_attn":
            name = leaf
        else:
            name = f"cross_{leaf}"
        per_target.setdefault(name, {}).setdefault(layer, {})[ab] = np.asarray(val)
    out = {}
    for name, layers in per_target.items():
        a = np.stack([layers[i]["A"].T for i in range(num_layers)])
        b = np.stack([layers[i]["B"].T for i in range(num_layers)])
        out[name] = {"a": jnp.asarray(a, dtype), "b": jnp.asarray(b, dtype)}
    return out


def lora_to_peft(lora: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """Export our adapter tree to PEFT-style keys (lora_A.default.weight naming — the
    remap the reference applies at utils.py:465-470)."""
    out = {}
    inv = {("ffn", "fc0"): ("ffn", "0"), ("ffn", "fc2"): ("ffn", "2")}
    for name, ab in lora.items():
        grp, leaf = TARGETS[name]
        grp_name, leaf_name = inv.get((grp, leaf), (grp, leaf))
        a = np.asarray(ab["a"], np.float32)
        b = np.asarray(ab["b"], np.float32)
        for i in range(a.shape[0]):
            base = f"{prefix}blocks.{i}.{grp_name}.{leaf_name}"
            out[f"{base}.lora_A.default.weight"] = np.ascontiguousarray(a[i].T)
            out[f"{base}.lora_B.default.weight"] = np.ascontiguousarray(b[i].T)
    return out
